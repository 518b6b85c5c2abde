package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-lifecycle operators: what changed between two snapshots of a
  * collection, and which document survives a duplicate cluster. The
  * first is the crawl-refresh CDC question ("what did this month's
  * crawl add / drop / rewrite"); the second is the last step of every
  * near-dup pipeline ([[Dedup.connectedComponentsStar]] builds the
  * clusters, this picks the keeper by source priority instead of the
  * min-id default the dd queries use).
  *
  * Scale posture: [[snapshotDiff]] compares 8-byte content hashes, not
  * text — each side collapses to (id, hash) at the scan, so the join
  * shuffles 16 bytes a row (co-locate with same-key bucketing when
  * both snapshots are yours). [[canonicalPerCluster]] is a partial-
  * agged `min(struct)` — the per-cluster argmin combines map-side,
  * one keyed shuffle of one candidate row per (partition, cluster),
  * never a window sort.
  */
object Curation {

  /** Diff two snapshots by id: one row per id whose membership or
    * content changed — `change` ∈ added | removed | changed.
    * Unchanged ids (same id, same `contentCol`) are dropped at the
    * join, so the output is the delta, not the corpus. Content
    * equality is by `xxhash64` — collisions (~2^-64 a pair) can mask
    * a change; audit-grade runs compare the column itself at 2-16×
    * the shuffle width via `byHash = false`. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
                   contentCol: String, byHash: Boolean = true): DataFrame = {
    def sig(df: DataFrame) = {
      val c = if (byHash) xxhash64(col(contentCol)) else col(contentCol)
      df.select(col(idCol), c.as("_sig"))
    }
    sig(oldSnap).withColumnRenamed("_sig", "_old")
      .join(sig(newSnap).withColumnRenamed("_sig", "_new"), Seq(idCol), "full_outer")
      .withColumn("change",
        when(col("_old").isNull, lit("added"))
          .when(col("_new").isNull, lit("removed"))
          .when(col("_old") =!= col("_new"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col(idCol), col("change"))
  }

  /** One keeper per duplicate cluster: the row minimizing
    * (`priorityCol` asc, `idCol` asc) — curated sources beat crawl,
    * ties break deterministically on id. Input is any frame carrying a
    * cluster assignment (star-CC output, SemDeDup cells, exact-dup
    * hashes); output is (clusterCol, idCol, priorityCol) of the
    * keeper. The argmin is `min(struct(priority, id))` so it partial-
    * aggregates before its one shuffle — no window, no sort. */
  def canonicalPerCluster(docs: DataFrame, clusterCol: String, idCol: String,
                          priorityCol: String): DataFrame =
    docs.groupBy(col(clusterCol))
      .agg(min(struct(col(priorityCol), col(idCol))).as("_keep"))
      .select(col(clusterCol), col(s"_keep.$idCol").as(idCol),
        col(s"_keep.$priorityCol").as(priorityCol))
}
