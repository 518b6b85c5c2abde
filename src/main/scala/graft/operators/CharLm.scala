package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-trigram language-model PERPLEXITY — the quality signal
  * the published LM-corpus pipelines (CCNet's KenLM buckets, the
  * Gopher/MassiveText quality stage) filter on: documents whose
  * character statistics diverge from a reference corpus score high
  * perplexity and get dropped or down-weighted. A char n-gram model is
  * the engine-sized stand-in for KenLM: same decision shape, no
  * external binary, exact arithmetic.
  *
  * Reference lineage: the repo's quality stack (tx2/tx5 heuristics,
  * qc1 learned classifier) under SURVEY §2's F-family text functions;
  * this adds the distribution-based third leg.
  *
  * Execution shape, sized for 100 TB:
  *  - [[train]]: one explode of the reference corpus into trigram
  *    windows (a codegen'd `transform(sequence(...))` — no UDF) and
  *    ONE partial-aggregated groupBy; prefix (bigram) totals derive
  *    from the trigram counts, never a second corpus pass. The model
  *    is trigram-vocabulary-sized (charset-bounded, ~10⁴-10⁶ rows) —
  *    broadcast-class, like centroids or codebooks.
  *  - [[perplexity]]: explode the scored docs the same way, TWO
  *    broadcast left joins (trigram count, prefix count — unseen
  *    n-grams coalesce to 0 and add-one smoothing keeps p > 0), one
  *    keyed aggregate back to doc grain. No shuffle moves more than
  *    (doc_id, 8-byte logprob) per window; the model never shuffles.
  *
  * Determinism (the oracle-gate discipline): each window's log₂ p is
  * snapped to an integer MICRO grid (`round(log2(p)·10⁶)` as long)
  * BEFORE the per-doc sum, so the aggregate is exact integer addition
  * — immune to float summation order — and any engine computing the
  * same formula lands on the same 4-dp perplexity.
  */
object CharLm {

  /** Smoothing denominator: add-one over a byte-sized charset. */
  val SmoothV = 256

  /** Character trigram windows of `__t`, 1-based positions 1..len-2;
    * empty (never a negative-step sequence) below 3 chars. */
  private def windows: Column =
    when(length(col("__t")) >= 3,
      expr("transform(sequence(1, length(__t) - 2), i -> substring(__t, i, 3))"))
      .otherwise(array().cast("array<string>"))

  /** Train the trigram model over a reference corpus: one pass,
    * output (tri, big, c3, c2) where c3 counts the trigram's windows
    * and c2 the windows sharing its 2-char prefix. */
  def train(corpus: DataFrame, textCol: String): DataFrame = {
    val tri = corpus.select(col(textCol).as("__t"))
      .select(explode(windows).as("tri"))
      .groupBy("tri").agg(count(lit(1)).as("c3"))
    val prefix = tri.groupBy(substring(col("tri"), 1, 2).as("big"))
      .agg(sum(col("c3")).as("c2"))
    tri.withColumn("big", substring(col("tri"), 1, 2))
      .join(prefix, "big")
      .select(col("tri"), col("big"), col("c3"), col("c2"))
  }

  /** Per-document perplexity under a [[train]]ed model:
    * 2^(−mean log₂ p̂), p̂ = (c3+1)/(c2+[[SmoothV]]), rounded to 4 dp.
    * Documents with no trigram window (length < 3) emit NULL — "no
    * evidence", not "perfect score". Output: (idCol, n_windows, ppl),
    * one row per input document. */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
                 model: DataFrame): DataFrame = {
    val w = docs.select(col(idCol), col(textCol).as("__t"))
      .select(col(idCol), explode_outer(windows).as("__tri"))
    val tric = broadcast(model.select(col("tri"), col("c3")))
    val bigc = broadcast(model.select(col("big"), col("c2")).distinct())
    val scored = w
      .join(tric, col("__tri") === col("tri"), "left")
      .join(bigc, substring(col("__tri"), 1, 2) === col("big"), "left")
      .select(col(idCol), col("__tri"),
        // integer micro-grid BEFORE the sum: exact addition, no
        // float-order nondeterminism across partitions/engines
        when(col("__tri").isNotNull,
          round(log2((coalesce(col("c3"), lit(0L)) + lit(1L)).cast("double") /
            (coalesce(col("c2"), lit(0L)) + lit(SmoothV)).cast("double"))
            * lit(1000000.0)).cast("long")).as("__lp"))
    scored.groupBy(col(idCol))
      .agg(count(col("__tri")).as("n_windows"), sum(col("__lp")).as("__s"))
      .select(col(idCol), col("n_windows"),
        when(col("n_windows") > 0,
          round(pow(lit(2.0),
            -(col("__s").cast("double") / (col("n_windows") * lit(1000000.0)))),
            4)).as("ppl"))
  }
}
