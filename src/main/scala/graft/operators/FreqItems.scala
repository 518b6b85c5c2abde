package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Heavy hitters at scale — the two-pass sketch-then-verify pattern:
  *
  *   pass 1: a MERGEABLE Misra–Gries summary (custom typed
  *           [[Aggregator]] — partial summaries per partition, combined
  *           associatively) finds a ≤k-item CANDIDATE set with the
  *           classic guarantee: every item with true count > n/(k+1)
  *           is in the summary (it may also contain light items —
  *           never the reverse);
  *   pass 2: the candidates broadcast into an `isin` filter and only
  *           THEY are exactly counted.
  *
  * The result — all items with exact count > n/(k+1) — is therefore
  * EXACT and deterministic (combine order can change which light items
  * ride along in the summary, but pass 2's exact counts filter them
  * identically), which is what lets a DuckDB GROUP BY/HAVING oracle
  * gate it.
  *
  * Why not vb1's plain groupBy at 100 TB: exact term counting shuffles
  * every distinct term as a partial count — for web-scale vocabularies
  * that is billions of keys of exchange for a 10-item answer. Here
  * pass 1 moves one ≤k-entry map per partition to the driver and
  * pass 2 shuffles only rows matching ≤k candidate terms. The driver
  * holds one ≤k map — bounded state, same class as IVF centroids.
  */
object FreqItems {

  /** (total rows seen, counter map). The map never exceeds `k` keys. */
  type MGSummary = (Long, Map[String, Long])

  /** Misra–Gries as a Spark typed Aggregator: `reduce` is the textbook
    * single-item update (decrement-all when full), `merge` the
    * Agarwal-et-al. mergeable-summaries combine (sum counters, subtract
    * the (k+1)-th largest, drop ≤0) that preserves the n/(k+1)
    * containment guarantee across any combine tree. */
  final class MisraGries(k: Int)
      extends Aggregator[String, MGSummary, MGSummary] {
    require(k >= 1, s"k must be positive: $k")

    override def zero: MGSummary = (0L, Map.empty)

    override def reduce(b: MGSummary, term: String): MGSummary = {
      val (n, m) = b
      val t = if (term == null) "" else term
      if (m.contains(t)) (n + 1, m.updated(t, m(t) + 1))
      else if (m.size < k) (n + 1, m.updated(t, 1L))
      else (n + 1, m.view.mapValues(_ - 1).filter(_._2 > 0).toMap)
    }

    override def merge(b1: MGSummary, b2: MGSummary): MGSummary = {
      val m = (b1._2.keySet ++ b2._2.keySet).iterator
        .map(t => t -> (b1._2.getOrElse(t, 0L) + b2._2.getOrElse(t, 0L)))
        .toMap
      val n = b1._1 + b2._1
      if (m.size <= k) (n, m)
      else {
        val d = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
        (n, m.view.mapValues(_ - d).filter(_._2 > 0).toMap)
      }
    }

    override def finish(b: MGSummary): MGSummary = b
    override def bufferEncoder: Encoder[MGSummary] =
      Encoders.product[MGSummary]
    override def outputEncoder: Encoder[MGSummary] =
      Encoders.product[MGSummary]
  }

  /** All items of `termCol` with exact count > n/(k+1), as
    * (term, n) — computed via sketch-candidates + exact recount, never
    * a full-vocabulary shuffle. The projected term column is persisted
    * across the two passes, so BOTH see one materialization of the
    * input: a non-deterministic `df` (rand()-derived, or a source that
    * mutates between actions) can't make the pass-2 recount disagree
    * with the pass-1 candidate guarantee and silently drop a true
    * heavy hitter. The result (≤ k rows by the MG bound) returns as a
    * local relation so the cache can be released eagerly. */
  def heavyHitters(df: DataFrame, termCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // NULL terms fold to "" in BOTH passes — the sketch's reduce does
    // it per item, and pass 2 must mirror it or `isin("")` silently
    // misses every NULL row and the guarantee breaks for null-heavy
    // columns (a NULL group above n/(k+1) would vanish)
    val termN = coalesce(col(termCol).cast("string"), lit(""))
    val terms = df.select(termN.as(termCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (n, summary) = terms.as[String].select(new MisraGries(k).toColumn).head()
      val threshold = n / (k + 1) // guarantee bound: count > threshold ⇒ in summary
      val candidates = summary.keys.toSeq
      if (candidates.isEmpty) {
        spark.emptyDataset[(String, Long)].toDF(termCol, "n")
      } else {
        // ≤ k survivor rows — bounded driver materialization, same
        // class as the ≤ k-entry summary map pass 1 already collected
        val hits = terms
          .filter(col(termCol).isin(candidates: _*))
          .groupBy(col(termCol)).agg(count(lit(1)).as("n"))
          .filter(col("n") > threshold)
          .as[(String, Long)].collect().toSeq
        hits.toDF(termCol, "n")
      }
    } finally terms.unpersist(blocking = false)
  }
}
