package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Unigram language-model quality scoring — the cheap end of the
  * model-based quality ladder (unigram → KenLM → learned classifier):
  * score(doc) = mean log-probability of its tokens under the corpus'
  * own top-`vocabSize` unigram distribution, out-of-vocabulary tokens
  * at a fixed penalty. Low scores flag gibberish, boilerplate-stuffed,
  * or off-distribution documents.
  *
  * Scale shape: the FIT is one token-count aggregation plus a
  * top-`vocabSize` TakeOrdered (never a full sort); the model itself is
  * bounded driver state (vocabSize entries — the same bounded-state
  * class as the IVF centroids, Ann.trainIvfCells). SCORING is a pure
  * column expression over a broadcast literal map: evaluated inside
  * the scan, no explode, no shuffle of token rows — the naive
  * explode-join-groupBy shape would shuffle one row PER TOKEN, which
  * at 100 TB is the corpus re-keyed several times over.
  */
object UnigramLM {

  /** Token → ln(count/total) for the `vocabSize` most frequent tokens
    * (ties broken by token ascending, deterministically). */
  def fit(docs: DataFrame, textCol: String, vocabSize: Int): Map[String, Double] = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val toks = docs
      .select(explode(T.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
    val total = toks.agg(count(lit(1)).as("_t"))
    counts.orderBy(desc("n"), asc("token")).limit(vocabSize) // TakeOrdered, no full sort
      .crossJoin(total)
      .select(col("token"), log(col("n").cast("double") / col("_t")).as("logp"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
  }

  /** Mean token log-probability under a fitted model, `oovLogProb` for
    * tokens outside the vocabulary; null for docs with no tokens.
    * Rounded to 4 decimals. */
  def score(text: Column, logps: Map[String, Double],
            oovLogProb: Double = -10.0): Column = {
    val toks = filter(T.tokens(text), t => length(t) > 0)
    val m = typedLit(logps)
    when(size(toks) === 0, lit(null).cast("double")).otherwise(
      round(
        aggregate(toks, lit(0.0),
          (acc, t) => acc + coalesce(element_at(m, t), lit(oovLogProb))) /
          size(toks).cast("double"), 4))
  }
}
