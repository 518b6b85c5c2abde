package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.operators.Snapshot

/** STREAMING READ of a snapshot-governed table — the table-as-stream
  * half of the lakehouse loop (Delta/Iceberg's streaming source over
  * this family's manifest protocol): a Structured Streaming source
  * whose OFFSETS ARE MANIFEST VERSIONS. Each micro-batch serves the
  * append batches newly COMMITTED between two manifest versions, so a
  * downstream pipeline (dedup → quality → sink, the st* family)
  * consumes exactly what writers publish, in commit order, with
  * nothing staged-but-unpublished ever visible — the property a plain
  * file-source stream over the same directory cannot give (it would
  * emit a batch dir the moment files land, BEFORE its manifest commit,
  * breaking snapshot isolation for the reader).
  *
  * Semantics (the Delta appends-only streaming contract):
  *  - the INITIAL micro-batch of an `earliest` stream is the LIVE SET
  *    of the starting manifest (the Delta "initial snapshot"
  *    convention) — NOT the cumulative committed history, which would
  *    resurrect retention-retired rows and read fold-input dirs vacuum
  *    may have swept; a pre-stream compaction's folds ARE the current
  *    content and serve exactly once here.
  *  - every LATER micro-batch emits only batches with id ≥ 0 — the
  *    ingest appends. Maintenance never re-emits: a compaction FOLD
  *    (ids ≤ -2) re-homes already-served rows, retention only removes
  *    (appends-only: no retractions), and the build batch (-1) is
  *    schema scaffolding. A redelivered append id is already in the
  *    older committed set, so replays don't double-serve.
  *  - offsets are replayable while manifests + batch dirs survive:
  *    `getBatch(v_a, v_b]` re-reads exactly the ids
  *    `committed(v_b) − committed(v_a)` — deterministic from the
  *    manifests alone. [[Snapshot.vacuum]] expires old offsets the
  *    same way it expires pinned readers (documented there).
  *  - the start horizon is PERSISTED under the stream's metadata dir
  *    on first construction: a `latest` stream that crashes between
  *    the offset WAL and the batch commit replays its first batch
  *    from the ORIGINAL horizon, not from whatever is latest after
  *    the restart (which would silently skip the commits in between).
  *  - schema is the manifest schema AT STREAM START (+ the `batch_id`
  *    provenance column); a mid-stream widening null-projects away
  *    until restart, the Delta convention.
  *
  * `startingVersion`: `earliest` (default — first micro-batch serves
  * everything already committed) or `latest` (only appends committed
  * after the stream starts).
  *
  * V1 `Source` deliberately (not DataSourceV2): `getBatch` returns the
  * manifest-resolved parquet read as a plain DataFrame, so the scan
  * keeps every batch-reader property (declared schema, partition
  * pruning, columnar parquet) without hand-writing a PartitionReader —
  * the same architecture Delta's streaming source uses.
  */
object SnapshotStream {

  /** The stream's schema: manifest data columns + batch_id provenance
    * (the partition column the governed layout carries). */
  private[sources] def streamSchema(spark: SparkSession, path: String): StructType = {
    val m = Snapshot.latest(spark, path).getOrElse(throw new IllegalStateException(
      s"$path is not snapshot-enabled — the snapshot stream resolves " +
        "through manifests (fail at stream START, not first batch)"))
    val data = m.schemaJson.map(Snapshot.structOf).getOrElse(
      throw new IllegalStateException(
        s"$path has no manifest schema — pre-schema lineages cannot " +
          "serve a stream (schema must be stable across micro-batches)"))
    StructType(data.fields :+ StructField("batch_id", IntegerType, nullable = true))
  }

  /** Schema of the CHANGES feed: change_type + data columns +
    * _commit_version (Delta CDF's column naming). */
  private[sources] def changesSchema(spark: SparkSession, path: String): StructType = {
    val data = streamSchema(spark, path).fields.dropRight(1) // no batch_id
    StructType(
      StructField("change_type", org.apache.spark.sql.types.StringType,
        nullable = false) +:
        data :+
        StructField("_commit_version", org.apache.spark.sql.types.LongType,
          nullable = false))
  }

  /** Reader-side entry point: a streaming DataFrame over the governed
    * table at `path`. */
  def readStream(spark: SparkSession, path: String,
                 startingVersion: String = "earliest"): DataFrame =
    spark.readStream.format(classOf[SnapshotStreamProvider].getName)
      .option("path", path)
      .option("startingVersion", startingVersion)
      .load()

  /** CHANGE DATA FEED entry point: per-commit row-level changes
    * (`change_type` delete/insert + `_commit_version`) — the streaming
    * face of [[Snapshot.diffVersions]]. See [[SnapshotChangesSource]]. */
  def readChanges(spark: SparkSession, path: String,
                  startingVersion: String = "latest"): DataFrame =
    spark.readStream.format(classOf[SnapshotStreamProvider].getName)
      .option("path", path)
      .option("startingVersion", startingVersion)
      .option("mode", "changes")
      .load()

  /** The stream's start horizon, PINNED atomically (temp + rename)
    * under its metadata dir on first construction — recomputing it
    * after a crash-restart would silently skip in-between commits when
    * the engine replays its WAL'd first offset (the FileStreamSource
    * metadataLog discipline); shared by both source modes. */
  private[sources] def pinnedHorizon(spark: SparkSession, metadataPath: String)
                                    (compute: => Long): Long = {
    val fs = new org.apache.hadoop.fs.Path(metadataPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val f = new org.apache.hadoop.fs.Path(metadataPath,
      "graft-snapshot-initial-version")
    def readPinned(): Long = {
      val in = fs.open(f)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      try text.toLong
      catch { case e: NumberFormatException =>
        throw new IllegalStateException(
          s"corrupt snapshot-stream horizon pin at $f: '$text'", e)
      }
    }
    if (fs.exists(f)) readPinned()
    else {
      val v = compute
      // TEMP + RENAME, never create-then-write at the final name: a
      // crash mid-write (or a reader racing the winner's unflushed
      // create) must never leave an empty/partial pin that bricks
      // every later restart with a parse error. Rename-to-existing
      // fails, so a racing constructor loses cleanly and adopts the
      // winner's.
      val tmp = new org.apache.hadoop.fs.Path(metadataPath,
        s".graft-snapshot-initial-version.${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, false)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      if (fs.rename(tmp, f)) v
      else { fs.delete(tmp, false); readPinned() }
    }
  }
}

final class SnapshotStreamProvider extends StreamSourceProvider {
  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "snapshot stream needs .option(\"path\", <governed table root>)"))

  private def isChanges(parameters: Map[String, String]): Boolean =
    parameters.getOrElse("mode", "appends") match {
      case "appends" => false
      case "changes" => true
      case other => throw new IllegalArgumentException(
        s"mode must be 'appends' or 'changes': $other")
    }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-snapshot",
      if (isChanges(parameters))
        SnapshotStream.changesSchema(sqlContext.sparkSession, pathOf(parameters))
      else
        SnapshotStream.streamSchema(sqlContext.sparkSession, pathOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val path = pathOf(parameters)
    val earliest =
      parameters.getOrElse("startingVersion", "earliest") match {
        case "earliest" => true
        case "latest" => false
        case other => throw new IllegalArgumentException(
          s"startingVersion must be 'earliest' or 'latest': $other")
      }
    if (isChanges(parameters))
      new SnapshotChangesSource(sqlContext.sparkSession, path, earliest,
        metadataPath)
    else
      new SnapshotStreamSource(sqlContext.sparkSession, path, earliest,
        metadataPath)
  }
}

final class SnapshotStreamSource(spark: SparkSession, path: String,
                                 earliest: Boolean,
                                 metadataPath: String) extends Source {

  override val schema: StructType = SnapshotStream.streamSchema(spark, path)

  /** Version horizon of the stream: 0 (earliest — batch 0 serves the
    * live set) or the version at FIRST construction (latest), pinned
    * via [[SnapshotStream.pinnedHorizon]]. */
  private val initialVersion: Long =
    SnapshotStream.pinnedHorizon(spark, metadataPath)(
      if (earliest) 0L else Snapshot.latestVersion(spark, path).getOrElse(0L))

  /** Spec hook: the horizon this source resolved (and pinned). */
  private[graft] def pinnedInitialVersion: Long = initialVersion

  private def ver(o: Offset): Long = o.json.toLong

  /** Ids committed as of version `v` (empty below the first publish).
    * `committed` is cumulative in every manifest, so this is ONE
    * manifest read — no history walk. */
  private def committedAt(v: Long): Set[Long] =
    if (v <= 0) Set.empty
    else {
      val m = Snapshot.readManifest(spark, path, v)
      (m.committed ++ m.batches).toSet
    }

  override def getOffset: Option[Offset] =
    Snapshot.latestVersion(spark, path).map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val toV = ver(end)
    def empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val batchDf = start match {
      case None if earliest =>
        // INITIAL SNAPSHOT: the end manifest's LIVE set — never the
        // cumulative committed history, which would resurrect
        // retention-retired rows and read fold-input dirs vacuum may
        // have swept (review r17 #1). Folds (the current content
        // after a pre-stream compaction) serve exactly once here.
        val m = Snapshot.readManifest(spark, path, toV)
        if (m.batches.isEmpty) empty // fully-retired table: no history
        else Snapshot.readBatches(spark, path, m)
      case _ =>
        val fromV = start.map(ver).getOrElse(initialVersion)
        // newly-committed APPENDS in (fromV, toV]: maintenance ids
        // (build -1, folds ≤ -2) re-home rows this stream already served
        val ids = (committedAt(toV) -- committedAt(fromV))
          .filter(_ >= 0).toSeq.sorted
        if (ids.isEmpty) empty
        else spark.read.option("basePath", path)
          .schema(StructType(schema.fields.dropRight(1)))
          .parquet(ids.map(b => s"$path/batch_id=$b"): _*)
    }
    // ONE shared projection to the declared column order, then the
    // STREAMING re-tag getBatch's contract wants (the bridge does what
    // FileStreamSource does internally)
    org.apache.spark.sql.graftbridge.ColumnBridge.asStreaming(
      batchDf.select(
        schema.fieldNames.map(org.apache.spark.sql.functions.col): _*))
  }

  override def stop(): Unit = ()
}

/** CHANGE DATA FEED over a governed table — the streaming face of
  * [[Snapshot.diffVersions]] (Delta's CDF / `readChangeFeed`): each
  * micro-batch emits the PER-COMMIT row-level changes of every version
  * in its offset window, tagged `change_type` (delete/insert) and
  * `_commit_version`. Where the appends-mode source serves the table's
  * CONTENT, this serves its HISTORY: retention emits its retired rows
  * as deletes, an append emits its rows as inserts, a COW
  * merge/delete emits exactly the changed rows — and a compaction
  * emits NOTHING (diffVersions' flagship property: rows moved between
  * batch dirs are not a table change).
  *
  * Each commit's diff reads only the symmetric difference of the two
  * adjacent live sets (the diffVersions contract), so a window of k
  * quiet-table commits costs k metadata reads and near-zero data IO.
  * `startingVersion = earliest` prepends the v1 content as inserts
  * tagged version 1 (Delta's startingVersion=0 semantics); `latest`
  * (the [[SnapshotStream.readChanges]] default) serves only post-start
  * commits. Replayability requires the window's manifests
  * ([[Snapshot.expireManifests]] horizon) and their symmetric-
  * difference dirs ([[Snapshot.vacuum]]) to survive — the pinned-
  * reader contract applied to offsets.
  */
final class SnapshotChangesSource(spark: SparkSession, path: String,
                                  earliest: Boolean,
                                  metadataPath: String) extends Source {

  override val schema: StructType = SnapshotStream.changesSchema(spark, path)

  /** earliest → 0 (batch 0 starts at v1's content); latest → the
    * version at first construction, pinned like the appends mode. */
  private val initialVersion: Long =
    SnapshotStream.pinnedHorizon(spark, metadataPath)(
      if (earliest) 0L else Snapshot.latestVersion(spark, path).getOrElse(0L))

  private[graft] def pinnedInitialVersion: Long = initialVersion

  private def ver(o: Offset): Long = o.json.toLong

  override def getOffset: Option[Offset] =
    Snapshot.latestVersion(spark, path).map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val fromV = start.map(ver).getOrElse(initialVersion)
    val toV = ver(end)
    def tagged(df: DataFrame, v: Long): DataFrame =
      df.withColumn("_commit_version", lit(v))
        .select(schema.fieldNames.map(col): _*)
    val parts = ((fromV + 1) to toV).map { v =>
      if (v == 1L)
        // the first commit has no predecessor to diff against: its
        // content IS its insert set (earliest-mode only — latest mode
        // never starts below the current version)
        tagged(Snapshot.readAt(spark, path, 1L).drop("batch_id")
          .select(lit("insert").as("change_type") +:
            schema.fieldNames.filter(n =>
              n != "change_type" && n != "_commit_version").map(col): _*), 1L)
      else
        tagged(Snapshot.diffVersions(spark, path, v - 1, v), v)
    }
    val batchDf = parts.reduceOption(_.unionByName(_)).getOrElse(
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
    // COMPUTED plan (diffVersions = exceptAll unions): must hide
    // behind an RDD leaf — re-tagging its leaves streaming would make
    // the planner turn the set ops into STATEFUL streaming operators
    // (state-store load failures at the second micro-batch)
    org.apache.spark.sql.graftbridge.ColumnBridge.asStreamingComputed(batchDf)
  }

  override def stop(): Unit = ()
}
