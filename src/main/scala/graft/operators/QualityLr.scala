package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Trainable LINEAR quality classifier — the fastText/NBSVM-shaped
  * filter behind the GPT-3/PaLM "looks like the target corpus" gates
  * (Brown et al. 2020 appendix A; Wang & Manning 2012's NB log-count
  * ratio as the linear weights): a supervised keep/drop decision from
  * labeled positives vs the rest, complementing [[Dsir]] — DSIR ranks
  * by a target-vs-raw likelihood ratio and selects a budget, this
  * trains pos-vs-neg weights WITH a class-prior intercept and gates
  * each doc independently (the shape you deploy when labels exist and
  * the keep decision must be local, not a global top-n).
  *
  * TRAINING IS CLOSED FORM — one counting pass per class, no gradient
  * loop. Full-batch logistic GD was BUILT AND REJECTED here, measured:
  * with the whole loop unrolled into a SQL-oracle-checkable number of
  * stages (≤ 8), every (lr, iters) setting either left the gate at the
  * class prior or overshot into an all-kept/all-dropped flip-flop
  * between consecutive iterations — full-batch GD on this objective
  * needs hundreds of rounds, and an oracle that re-derives hundreds of
  * chained stages is not a gate. The NB log-count-ratio is the
  * classical closed form for exactly this feature family, and its
  * whole training run IS one oracle-checkable expression.
  *
  * Model: w_f = ln((c⁺_f+1)/(N⁺+B)) − ln((c⁻_f+1)/(N⁻+B)) over a
  * top-K positive-class vocabulary + OOV bucket (B = actual bucket
  * count; the [[Dsir]] boundedness convention — K+2 weights with the
  * intercept, broadcast-class, reproducible by any engine), intercept
  * w_bias = ln(n⁺/n⁻). Decision: margin(d) = Σ_f count_{d,f}·w_f +
  * w_bias > 0 — the multinomial-NB MAP rule, all arithmetic snapped
  * to the integer micro grid so margins are exact integer sums and
  * the DuckDB oracle re-derives training AND gating end to end.
  *
  * Execution shape at 100 TB: [[fit]] is one explode +
  * partial-aggregated groupBy per corpus scan collecting ≤ 2(K+1)
  * class-count rows (bounded driver state, the [[Dsir.Model]] class);
  * [[score]] is one explode + ONE broadcast join + keyed sum
  * ([[Dsir.score]]'s plan); [[gate]] is a broadcast-friendly pure
  * filter on that. */
object QualityLr {

  /** The intercept bucket's key — the \\u0001 prefix cannot appear in
    * whitespace-normalized text (the [[Dsir.Oov]] convention; SQL
    * side: chr(1) || 'bias'). */
  val Bias = "\u0001bias"

  /** Trained model: (token, w_micro) for the K vocab tokens, the
    * [[Dsir.Oov]] bucket, and the [[Bias]] intercept. Bounded driver
    * state. */
  final case class Model(weights: Seq[(String, Long)]) {
    private[QualityLr] def oovW: Long =
      weights.find(_._1 == Dsir.Oov).map(_._2).getOrElse(0L)
    private[QualityLr] def biasW: Long =
      weights.find(_._1 == Bias).map(_._2).getOrElse(0L)
    private[QualityLr] def tokenDf(spark: org.apache.spark.sql.SparkSession) =
      spark.createDataFrame(weights.filter(_._1 != Bias))
        .toDF("tok", "w_micro")
  }

  private def toks(text: Column): Column =
    split(T.normalizeForDedup(text), " ")

  /** HALF_UP micro snap — matches Spark's round() expression and
    * DuckDB's round() (away-from-zero halves; `math.round` floors
    * negative halves and would diverge). */
  private def micro(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Closed-form fit: per-class bucket counts in ONE corpus pass
    * (bounded output: ≤ 2(K+1) rows), add-one-smoothed log-count
    * ratios over the ACTUAL bucket count, prior-log-odds intercept.
    * A NULL label (e.g. `lang IS NULL` under `lang === "en"`) is the
    * negative class. */
  def fit(docs: DataFrame, idCol: String, textCol: String, label: Column,
          k: Int): Model = {
    val y = coalesce(label.cast("int"), lit(0))
    val v = Dsir.vocab(docs.filter(y === 1), textCol, k)
    val counted = docs
      .select(y.as("_y"), explode(toks(col(textCol))).as("tok0"))
      .join(broadcast(v), col("tok0") === col("tok"), "left")
      .select(col("_y"), coalesce(col("tok"), lit(Dsir.Oov)).as("tok"))
      .groupBy("_y", "tok").agg(count(lit(1)).as("c"))
      .collect()
    val cPos = counted.filter(_.getInt(0) == 1)
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val cNeg = counted.filter(_.getInt(0) == 0)
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val classes = docs.agg(
      sum(y).cast("long").as("p"), count(lit(1)).as("n")).head()
    val (nPos, n) = (classes.getLong(0), classes.getLong(1))
    require(nPos > 0 && nPos < n,
      s"fit needs both classes: $nPos positives of $n docs")
    val buckets: Seq[String] =
      v.collect().map(_.getString(0)).toSeq :+ Dsir.Oov
    val b = buckets.length
    val tPos = cPos.values.sum.toDouble
    val tNeg = cNeg.values.sum.toDouble
    val ws = buckets.map { f =>
      f -> micro(math.log(cPos.getOrElse(f, 0L) + 1.0) - math.log(tPos + b)
        - math.log(cNeg.getOrElse(f, 0L) + 1.0) + math.log(tNeg + b))
    } :+ (Bias -> micro(math.log(nPos.toDouble / (n - nPos))))
    Model(ws.sortBy(_._1))
  }

  /** Per-document margin: (idCol, margin_micro) = Σ occurrences
    * w(bucket) + w_bias — an exact integer sum; p > 0.5 ⇔
    * margin_micro > 0, no σ at inference. One explode + ONE broadcast
    * join + keyed sum. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val m = model.tokenDf(docs.sparkSession)
    docs.select(col(idCol), explode(toks(col(textCol))).as("tok0"))
      .join(broadcast(m), col("tok0") === col("tok"), "left")
      .groupBy(col(idCol))
      .agg((sum(coalesce(col("w_micro"), lit(model.oovW)))
        + lit(model.biasW)).as("margin_micro"))
  }

  /** The keep/drop gate: docs whose margin is positive (p > 0.5). */
  def gate(docs: DataFrame, idCol: String, textCol: String,
           model: Model): DataFrame =
    docs.join(
      score(docs, idCol, textCol, model).filter(col("margin_micro") > 0)
        .select(col(idCol)),
      Seq(idCol), "left_semi")

  /** CALIBRATED gate threshold — the production pattern: instead of
    * gating at margin 0 (p = 0.5), derive the threshold from a
    * HELD-OUT precision target: the LOWEST margin t such that, among
    * held-out docs with margin ≥ t, the positive fraction reaches the
    * target — i.e. maximum recall subject to precision ≥ target.
    * Deterministic and exact: margins are integer micros, the
    * precision test is pure integer arithmetic (cp·10⁶ ≥ target·cn),
    * and the threshold is itself a kept margin — so a DuckDB oracle
    * re-derives calibration end to end on the micro grid (qc6).
    * Returns a DRIVER-SIDE SCALAR, the Model-rider shape.
    *
    * Shape: one [[score]] pass over the held-out set, then a
    * cumulative window over its DISTINCT margins — unpartitioned, and
    * deliberately so: the held-out set is a labeled evaluation sample,
    * bounded by premise (the [[Dsir.fit]] target-sample convention),
    * never the corpus. Fails loudly when no threshold reaches the
    * target (even the single best-margin doc is a false positive) —
    * a silent fallback would ship an uncalibrated gate. */
  def calibrateThreshold(held: DataFrame, idCol: String, textCol: String,
                         label: Column, model: Model,
                         precisionTargetMicro: Long): Long = {
    require(precisionTargetMicro > 0 && precisionTargetMicro <= 1000000L,
      s"precisionTargetMicro=$precisionTargetMicro outside (0, 1e6]")
    val y = coalesce(label.cast("int"), lit(0))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("margin_micro").desc)
    val best = score(held, idCol, textCol, model)
      .join(held.select(col(idCol), y.as("_y")), Seq(idCol))
      .groupBy(col("margin_micro"))
      .agg(count(lit(1)).as("_n"), sum(col("_y")).cast("long").as("_p"))
      .select(col("margin_micro"),
        sum(col("_n")).over(w).as("_cn"), sum(col("_p")).over(w).as("_cp"))
      .filter(col("_cp") * lit(1000000L) >=
        lit(precisionTargetMicro) * col("_cn"))
      .agg(min(col("margin_micro"))).head()
    require(!best.isNullAt(0),
      s"no margin threshold reaches precision " +
        s"${precisionTargetMicro / 1e6} on the held-out set")
    best.getLong(0)
  }

  /** [[gate]] at a calibrated threshold: keep docs with margin ≥ t
    * (inclusive — the calibrated bound is itself a kept margin by
    * construction). */
  def gateAt(docs: DataFrame, idCol: String, textCol: String,
             model: Model, thresholdMicro: Long): DataFrame =
    docs.join(
      score(docs, idCol, textCol, model)
        .filter(col("margin_micro") >= thresholdMicro).select(col(idCol)),
      Seq(idCol), "left_semi")
}
