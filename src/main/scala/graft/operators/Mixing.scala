package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source-mixing operators for training-data pipelines: deterministic
  * hash-gated downsampling and temperature-weighted mixture rates —
  * how a corpus of crawl/books/code sources is rebalanced before
  * tokenization.
  *
  * Scale posture: [[sampleBySource]] is a pure per-row filter (the
  * keep/drop decision is a hash of the row's own id — no RNG state, no
  * shuffle, reproducible across runs, executors, and retries; the same
  * id/salt pair always decides the same way, which is what makes
  * incremental re-runs and audits possible at 100 TB).
  * [[temperatureRates]]'s only job is a per-source count; driver state
  * is #sources rows.
  */
object Mixing {

  private val Buckets: Long = 1L << 20

  /** Keep each row iff xxhash64(id, salt) lands under its source's
    * keep-rate. Rates clamp to [0,1]; sources absent from `rates` use
    * `defaultRate`. Rate 1.0 keeps everything, 0.0 drops everything —
    * exact, not probabilistic; intermediate rates are exact in
    * expectation over the hash's uniformity. */
  def sampleBySource(df: DataFrame, idCol: String, sourceCol: String,
                     rates: Map[String, Double], defaultRate: Double = 1.0,
                     salt: Long = 0L): DataFrame = {
    val clamped = rates.view.mapValues(r => math.max(0.0, math.min(1.0, r))).toMap
    val rate = coalesce(element_at(typedLit(clamped), col(sourceCol)),
      lit(math.max(0.0, math.min(1.0, defaultRate))))
    val bucket = pmod(xxhash64(col(idCol), lit(salt)), lit(Buckets)).cast("double")
    df.filter(bucket < rate * Buckets.toDouble)
  }

  /** Closed-form CAPPED token-budget rates: source s should carry
    * `budget · w_s / Σw` tokens; its keep-rate is that desired volume
    * over what it HAS, capped at 1 (no upsampling). No redistribution
    * of a saturated source's unused share — which keeps the formula a
    * single closed form any engine re-derives (the declared query's
    * oracle recomputes it in DuckDB); [[waterFillRates]] is the
    * variant that actually hits the budget. Total kept under this
    * form is ≤ budget, short by exactly the saturated sources'
    * shortfall. */
  def cappedTokenRates(avail: Map[String, Long], weights: Map[String, Double],
                       budget: Long): Map[String, Double] = {
    require(budget >= 0, s"negative budget: $budget")
    require(weights.values.forall(_ >= 0), s"negative weight in $weights")
    // keysIterator, NOT keys.map: mapping over the key SET would
    // deduplicate equal weights before the sum
    val sumW = avail.keysIterator.map(s => weights.getOrElse(s, 0.0)).sum
    avail.map { case (s, a) =>
      val w = weights.getOrElse(s, 0.0)
      s -> (if (a <= 0 || w <= 0 || sumW == 0) 0.0
            else math.min(1.0, budget.toDouble * w / sumW / a))
    }
  }

  /** WATER-FILLING token-budget rates: like [[cappedTokenRates]], but
    * a saturated source's unused allocation redistributes over the
    * still-unsaturated sources at their relative weights, iterating
    * until no new source saturates (≤ #sources rounds of pure driver
    * math). The result actually delivers `min(budget, Σ avail)`
    * tokens in expectation — the property a "give me a 50B-token mix
    * at these weights" request means. Deterministic: same inputs,
    * same rates. */
  def waterFillRates(avail: Map[String, Long], weights: Map[String, Double],
                     budget: Long): Map[String, Double] = {
    require(budget >= 0, s"negative budget: $budget")
    require(weights.values.forall(_ >= 0), s"negative weight in $weights")
    val rates = scala.collection.mutable.Map.empty[String, Double]
    var active = avail.filter { case (s, a) => a > 0 && weights.getOrElse(s, 0.0) > 0 }
    avail.keys.foreach(s => rates(s) = 0.0)
    var remaining = budget.toDouble
    var done = false
    while (!done && active.nonEmpty && remaining > 0) {
      val sumW = active.keysIterator.map(weights(_)).sum // see cappedTokenRates
      val saturated = active.filter { case (s, a) =>
        remaining * weights(s) / sumW >= a.toDouble
      }
      if (saturated.isEmpty) {
        active.foreach { case (s, a) =>
          rates(s) = remaining * weights(s) / sumW / a }
        done = true
      } else {
        saturated.keys.foreach(rates(_) = 1.0)
        remaining -= saturated.values.sum.toDouble
        active = active -- saturated.keys
      }
    }
    rates.toMap
  }

  /** Token-budget sampling plan: the computed per-source rates plus
    * the hash-gated sample. The gate is [[Sampling.idHash]] (not the
    * xxhash64 gate of [[sampleBySource]]) precisely so a DuckDB
    * oracle can re-derive every kept row via
    * [[Sampling.idHashSql]]. Driver state: one (source, tokens) row
    * per source. Sources without a weight drop entirely — absent from
    * the mixture spec means no budget share. */
  final case class TokenBudgetPlan(budget: Long, avail: Map[String, Long],
                                   rates: Map[String, Double], sampled: DataFrame)

  def tokenBudgetSample(df: DataFrame, idCol: String, sourceCol: String,
                        tokenCountCol: String, weights: Map[String, Double],
                        budget: Long, seed: Long = 0L,
                        redistribute: Boolean = true,
                        precomputedAvail: Option[Map[String, Long]] = None)
      : TokenBudgetPlan = {
    // null source / null token rows carry no budget: they are excluded
    // from the availability sum (so they can't NPE the collect or put a
    // null key into the rates map literal) AND dropped at the gate —
    // a null-source row via rate 0 (element_at on a null key is null →
    // coalesce 0), a null-TOKEN row via the explicit isNotNull below.
    // Without that second filter a null-token row of a budgeted source
    // would sample at its source's full rate while carrying unmetered
    // tokens, silently overshooting the budget.
    val avail = precomputedAvail.getOrElse(
      df.filter(col(sourceCol).isNotNull && col(tokenCountCol).isNotNull)
        .groupBy(col(sourceCol))
        .agg(sum(col(tokenCountCol)).cast("long").as("avail"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    val rates =
      if (redistribute) waterFillRates(avail, weights, budget)
      else cappedTokenRates(avail, weights, budget)
    val rateCol = coalesce(element_at(typedLit(rates), col(sourceCol)), lit(0.0))
    val sampled = df.filter(col(tokenCountCol).isNotNull &&
      Sampling.idHash(col(idCol), seed).cast("double") < rateCol * lit(4294967296.0))
    TokenBudgetPlan(budget, avail, rates, sampled)
  }

  /** Temperature-flattened mixture keep-rates from observed source
    * counts: the post-sampling share of source i is ∝ n_i^alpha
    * (alpha = 1 natural distribution, alpha = 0 uniform), expressed as
    * per-source DOWNsampling rates scaled so the most-downsampled
    * source anchors at 1.0 — no source is ever upsampled, the
    * flattening comes entirely from thinning the big ones.
    * keep_i ∝ n_i^(alpha-1). */
  def temperatureRates(df: DataFrame, sourceCol: String,
                       alpha: Double): Map[String, Double] = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    require(counts.nonEmpty, "temperatureRates on an empty frame")
    val raw = counts.view.mapValues(n => math.pow(n, alpha - 1.0)).toMap
    val mx = raw.values.max
    raw.view.mapValues(_ / mx).toMap
  }
}
