package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MATERIALIZED AGGREGATE table — the algebraic-aggregate
  * sibling of [[SketchTable]] (which holds the non-algebraic distinct
  * counts as HLL state). Each ingest batch collapses to one row per
  * group holding the decomposable partials (row count, and per value
  * column: non-null count, sum, min, max); a refresh therefore costs
  * one aggregate of the NEW batch only, and the full-history rollup
  * is a merge of O(groups × batches) partial rows — history is never
  * re-scanned. This is the classic incremental-view-maintenance
  * contract for distributive/algebraic measures (count/sum/min/max
  * exactly; avg derived at read as sum/count).
  *
  * Lifecycle matches the whole persisted-table family: build = table
  * reset landing as reserved batch -1, append OVERWRITES its own
  * `batch_id=N` partition (idempotent under at-least-once delivery),
  * and when the table is [[Snapshot]]-enabled, appends stage then
  * publish via the manifest, composing with retention, compaction,
  * time travel, and vacuum unchanged.
  *
  * Exactness note: count/min/max merge exactly for any type; SUM of
  * floating-point values is reordered by batching (partial sums merge
  * in a different order than a direct scan), so for hash-stable sums
  * feed integer units — the repo's cents pattern — as the value
  * column. Integer sums are checked for overflow by ANSI mode.
  */
object MaterializedAgg {

  private[operators] val RowsCol = "__rows"
  private[operators] val Suffixes = Seq("__cnt", "__sum", "__min", "__max")

  private[operators] def partialRows(df: DataFrame, keys: Seq[String],
      values: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(values.nonEmpty, "at least one value column")
    val bad = values.filter(v => Suffixes.exists(v.endsWith) || v == RowsCol)
    require(bad.isEmpty, s"value column names collide with partial-stat " +
      s"suffixes: ${bad.mkString(", ")}")
    val aggs = count(lit(1)).as(RowsCol) +: values.flatMap { v =>
      Seq(count(col(v)).as(s"${v}__cnt"), sum(col(v)).as(s"${v}__sum"),
        min(col(v)).as(s"${v}__min"), max(col(v)).as(s"${v}__max"))
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fresh build: partials of `df` land as reserved batch -1 (a table
    * reset — see [[SketchTable.build]] for the protocol). */
  def build(df: DataFrame, keys: Seq[String], values: Seq[String],
      path: String): Unit =
    Snapshot.withTableReset(df.sparkSession, path) {
      partialRows(df, keys, values).withColumn("batch_id", lit(-1L))
        .write.partitionBy("batch_id").mode("overwrite").parquet(path)
    }

  /** Incremental refresh: aggregate ONLY this batch's rows and append
    * them under [[Snapshot.stagedAppend]]'s shared commit protocol. */
  def appendBatch(df: DataFrame, keys: Seq[String], values: Seq[String],
      path: String, batchId: Long): Unit = {
    require(batchId >= 0, s"batch ids start at 0 (-1 is the build): $batchId")
    Snapshot.stagedAppend(df.sparkSession, path, batchId) {
      partialRows(df, keys, values)
        .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
    }
  }

  /** Re-align the rollup after its BASE was FOLDED (compaction, COW
    * delete / merge rewrote history into new batch ids — the one
    * event [[appendBatch]]'s id-tracking cannot follow): rebuild
    * partials for base batches the rollup lacks — each from one scan
    * of that batch alone, committed under the shared stage-then-
    * publish protocol — then drop rollup batches the base no longer
    * lists via one manifest edit, leaving shared ids (and their
    * partials) untouched. After resync the rollup's live set EQUALS
    * the base's, so the [[graft.plans.MatAggRewrite]] freshness gate
    * re-arms; between the delete and the resync that gate stands every
    * query down (a fired rewrite could serve a min/max whose carrying
    * row was deleted — MatAggRewriteSpec pins the sequence). Work is
    * proportional to the folded batches, not base history. */
  def resyncWithBase(spark: SparkSession, basePath: String, aggPath: String,
      keys: Seq[String], values: Seq[String]): Unit = {
    val bm = Snapshot.latest(spark, basePath).getOrElse(
      throw new IllegalStateException(
        s"$basePath is not snapshot-enabled — resync follows manifest ids"))
    val baseLive = bm.batches.toSet
    val aggLive = Snapshot.liveBatches(spark, aggPath).toSet
    (baseLive -- aggLive).toSeq.sorted.foreach { b =>
      Snapshot.stagedAppend(spark, aggPath, b) {
        partialRows(
          Snapshot.readBatches(spark, basePath, bm.copy(batches = Seq(b)))
            .drop("batch_id"),
          keys, values)
          .write.mode("overwrite").parquet(s"$aggPath/batch_id=$b")
      }
    }
    val toDrop = (aggLive -- baseLive).toSeq.sorted
    if (toDrop.nonEmpty) Snapshot.latest(spark, aggPath) match {
      case Some(am) => // enabled rollup: one manifest edit, no file IO
        Snapshot.commitEdit(spark, aggPath, am, remove = toDrop,
          tolerateConcurrentRemoves = true)
      case None => // plain rollup resolves by directory listing — the
        // superseded partials must physically go (they are REPLACED by
        // the fold partials just written, not retired history)
        val fs = new org.apache.hadoop.fs.Path(aggPath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        toDrop.foreach(b => fs.delete(
          new org.apache.hadoop.fs.Path(s"$aggPath/batch_id=$b"), true))
    }
  }

  /** Full-history rollup from the stored partials alone: one scan of
    * the (tiny) materialized table, one merge aggregate. Key and value
    * columns are inferred from the stored schema, so a reader needs
    * only the path. Output per group: `n_rows`, and per value column
    * `<v>_cnt/_sum/_min/_max/_avg` (avg NULL when no non-null values
    * survived). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val stored = Snapshot.read(spark, path)
    val cols = stored.columns.toSeq
    val values = cols.collect {
      case c if c.endsWith("__sum") => c.dropRight("__sum".length)
    }
    val keys = cols.filterNot(c => c == RowsCol || c == "batch_id"
      || Suffixes.exists(s => c.endsWith(s) && values.contains(
        c.dropRight(s.length))))
    require(values.nonEmpty && keys.nonEmpty,
      s"not a materialized-agg table at $path (columns: ${cols.mkString(", ")})")
    val aggs = sum(col(RowsCol)).as("n_rows") +: values.flatMap { v =>
      Seq(sum(col(s"${v}__cnt")).as(s"${v}_cnt"),
        sum(col(s"${v}__sum")).as(s"${v}_sum"),
        min(col(s"${v}__min")).as(s"${v}_min"),
        max(col(s"${v}__max")).as(s"${v}_max"))
    }
    stored.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select((keys.map(col) :+ col("n_rows")) ++ values.flatMap { v =>
        Seq(col(s"${v}_cnt"), col(s"${v}_sum"), col(s"${v}_min"),
          col(s"${v}_max"),
          when(col(s"${v}_cnt") > 0,
            col(s"${v}_sum").cast("double") / col(s"${v}_cnt"))
            .as(s"${v}_avg"))
      }: _*)
  }
}
