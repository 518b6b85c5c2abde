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
