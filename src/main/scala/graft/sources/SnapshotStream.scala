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
  *  - emits batches with id ≥ 0 — the ingest appends. Maintenance
  *    never re-emits: a compaction FOLD (ids ≤ -2) re-homes already-
  *    served rows, retention only removes, and the build batch (-1) is
  *    schema scaffolding. A redelivered append id is already in the
  *    older committed set, so replays don't double-serve.
  *  - offsets are replayable while manifests + batch dirs survive:
  *    `getBatch(v_a, v_b]` re-reads exactly the ids
  *    `committed(v_b) − committed(v_a)` — deterministic from the
  *    manifests alone. [[Snapshot.vacuum]] expires old offsets the
  *    same way it expires pinned readers (documented there).
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

  /** Reader-side entry point: a streaming DataFrame over the governed
    * table at `path`. */
  def readStream(spark: SparkSession, path: String,
                 startingVersion: String = "earliest"): DataFrame =
    spark.readStream.format(classOf[SnapshotStreamProvider].getName)
      .option("path", path)
      .option("startingVersion", startingVersion)
      .load()
}

final class SnapshotStreamProvider extends StreamSourceProvider {
  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "snapshot stream needs .option(\"path\", <governed table root>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-snapshot",
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
    new SnapshotStreamSource(sqlContext.sparkSession, path, earliest)
  }
}

final class SnapshotStreamSource(spark: SparkSession, path: String,
                                 earliest: Boolean) extends Source {

  override val schema: StructType = SnapshotStream.streamSchema(spark, path)

  /** Version horizon for a fresh (checkpoint-less) stream: 0 serves
    * the whole committed history in batch 0; `latest` pins to the
    * version at construction so only later commits flow. */
  private val initialVersion: Long =
    if (earliest) 0L
    else Snapshot.latestVersion(spark, path).getOrElse(0L)

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
    val fromV = start.map(ver).getOrElse(initialVersion)
    val toV = ver(end)
    // newly-committed APPENDS in (fromV, toV]: maintenance ids
    // (build -1, folds ≤ -2) re-home rows this stream already served
    val ids = (committedAt(toV) -- committedAt(fromV)).filter(_ >= 0).toSeq.sorted
    val data = StructType(schema.fields.dropRight(1))
    // getBatch's contract wants a STREAMING-flagged plan — the bridge
    // re-tags the batch relation the way FileStreamSource does
    org.apache.spark.sql.graftbridge.ColumnBridge.asStreaming(
      if (ids.isEmpty)
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else
        spark.read.option("basePath", path).schema(data)
          .parquet(ids.map(b => s"$path/batch_id=$b"): _*)
          .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*))
  }

  override def stop(): Unit = ()
}
