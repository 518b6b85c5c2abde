package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted per-key distinct-count SKETCH TABLE — mergeable aggregate
  * state as data (Apache DataSketches HLL via `hll_sketch_agg`):
  * each ingest batch collapses to one fixed-size sketch row per key,
  * and any later "how many distinct X per key so far?" is a UNION of
  * the stored sketches — never a re-scan of history.
  *
  * Why this matters at 100 TB: an exact rolling distinct needs either
  * the full value set per key (unbounded state) or a re-scan of every
  * prior batch; the sketch table stores O(keys × batches) rows of a
  * few KB each, append is one small parquet write, and estimation
  * reads only the sketch table. This is the same batch-partitioned
  * lifecycle as the MinHash/IVF/posting indexes ([[Dedup]], [[Ann]],
  * [[Retrieval]]): build lands as the reserved batch -1, each append
  * OVERWRITES its own `batch_id=N` partition (a redelivered batch
  * replaces itself — idempotent under at-least-once ingest), readers
  * take the plain union of all batch directories.
  */
object SketchTable {

  private def sketchRows(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(expr(s"hll_sketch_agg($valCol)").as("sketch"))

  /** Fresh build: per-key sketches of `df` land as batch -1 (reserved
    * for the build — ingest-loop batch ids start at 0). A build is a
    * TABLE RESET, not a snapshot commit: the overwrite wipes the root
    * (old manifests included), then — if the table was
    * snapshot-enabled — a fresh v1 manifest publishes so readers stay
    * manifest-resolved. Pinned readers do not survive a rebuild. */
  def build(df: DataFrame, keyCol: String, valCol: String, path: String): Unit =
    Snapshot.withTableReset(df.sparkSession, path) {
      sketchRows(df, keyCol, valCol).withColumn("batch_id", lit(-1L))
        .write.partitionBy("batch_id").mode("overwrite").parquet(path)
    }

  /** Append one batch under [[Snapshot.stagedAppend]]'s shared
    * protocol: on a plain table the write overwrites ITS partition dir
    * (a retry replaces the earlier, possibly partial, write instead of
    * stacking a duplicate sketch); on a snapshot-enabled table the
    * write stages invisibly, the manifest publishes LAST, and a
    * redelivery of an already-committed batch id is a NO-OP — it must
    * neither rewrite a directory live readers resolve through nor
    * resurrect a retention-retired batch. */
  def appendBatch(df: DataFrame, keyCol: String, valCol: String,
                  path: String, batchId: Long): Unit = {
    require(batchId >= 0, s"batch ids start at 0 (-1 is the build): $batchId")
    Snapshot.stagedAppend(df.sparkSession, path, batchId) {
      sketchRows(df, keyCol, valCol)
        .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
    }
  }

  /** Distinct-count estimates per key across the LIVE batches: one
    * scan of the sketch table, one union-agg per key. The estimate is
    * deterministic for a given set of stored sketches.
    * Snapshot-enabled tables resolve through the newest manifest
    * (retired-but-unvacuumed and staged batches are invisible);
    * non-enabled tables read the plain directory union as always. */
  def estimateDistinct(spark: SparkSession, path: String): DataFrame =
    Snapshot.read(spark, path)
      .groupBy(col("key"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("estimate"))
}
