package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse (BM25) retrieval and rank fusion — the lexical complement to
  * the dense path ([[Ann]]): keyword lookup over a corpus, and the
  * standard hybrid-search combiner (reciprocal-rank fusion) that merges
  * a lexical top-k with a dense top-k without score calibration.
  *
  * BM25 (Robertson/Sparck-Jones, the Lucene-default scoring):
  *   score(d, Q) = Σ_{t ∈ Q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   idf(t)     = ln(1 + (N − df + 0.5)/(df + 0.5))
  *
  * Distributed shape — the inverted index is implicit, built on the
  * fly for exactly the query's terms:
  *   1. corpus stats (N, avgdl): one 1-row aggregate, broadcast;
  *   2. postings: tokenize + explode, FILTERED TO THE QUERY TERMS at
  *      the explode (the query is a literal `isin` — tiny), then one
  *      partial-agged groupBy (doc, term) → tf. Only query-term hits
  *      ever shuffle — the corpus text itself never does;
  *   3. df per query term: a second tiny agg over the postings,
  *      broadcast back (|Q| rows);
  *   4. per-doc score: sum over the doc's matched terms, then top-k =
  *      `TakeOrderedAndProject` (no global sort materializes).
  * Serving many queries amortizes step 2 into a real persisted posting
  * table; this on-the-fly shape is the one-shot/audit path.
  */
object Retrieval {

  /** Case-folded whitespace tokens — the corpus convention
    * (TextFunctions.tokens) plus `lower` for term matching. */
  private def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Top-k docs by BM25 over `queryTerms` (case-folded). Returns
    * (idCol, score), score descending, ties to the smaller id; docs
    * sharing no term with the query never appear. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase)
    val base = docs.select(col(idCol),
      size(toks(col(textCol))).cast("double").as("_dl"),
      toks(col(textCol)).as("_toks"))
    val stats = base.agg(count(lit(1)).cast("double").as("_n"),
      avg(col("_dl")).as("_avgdl"))

    val tf = base.select(col(idCol), col("_dl"), explode(col("_toks")).as("_term"))
      .filter(col("_term").isin(terms: _*))
      .groupBy(col(idCol), col("_dl"), col("_term"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    val df_ = tf.groupBy(col("_term")).agg(count(lit(1)).cast("double").as("_df"))

    tf.join(broadcast(df_), Seq("_term"))
      .crossJoin(broadcast(stats))
      .withColumn("_s",
        log(lit(1.0) + (col("_n") - col("_df") + 0.5) / (col("_df") + 0.5))
          * col("_tf") * (k1 + 1)
          / (col("_tf") + lit(k1) * (lit(1 - b) + lit(b) * col("_dl") / col("_avgdl"))))
      .groupBy(col(idCol)).agg(sum(col("_s")).as("score"))
      .orderBy(desc("score"), col(idCol)).limit(k)
  }

  /** Reciprocal-rank fusion of already-ranked top-k lists: fused(d) =
    * Σ_lists 1/(c + rank_list(d)), rank 1-based by (scoreCol desc, id),
    * absent-from-list contributes 0. Inputs are top-k results (k rows
    * each) by contract — the unpartitioned rank window and the id
    * full-outer joins are driver-scale, not corpus-scale. c = 60 is the
    * published default; higher c flattens rank differences. */
  def rrfFuse(lists: Seq[(DataFrame, String)], idCol: String, k: Int,
              c: Double = 60.0): DataFrame = {
    val ranked = lists.zipWithIndex.map { case ((df, scoreCol), i) =>
      df.select(col(idCol),
        (lit(1.0) / (lit(c) + row_number().over(
          Window.orderBy(desc(scoreCol), col(idCol))))).as(s"_rrf$i"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    joined.select(col(idCol),
        ranked.indices.map(i => coalesce(col(s"_rrf$i"), lit(0.0)))
          .reduce(_ + _).as("score"))
      .orderBy(desc("score"), col(idCol)).limit(k)
  }
}
