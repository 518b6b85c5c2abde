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
  * everything already committed, as the live-set snapshot), `latest`
  * (only appends committed after the stream starts), or a NUMERIC
  * manifest version (Delta's convention: inclusive — version v's own
  * commits are the first served; the raw append history from v
  * onward, NOT a live-set snapshot, so rows retired after v appear;
  * manifests back to v−1 must survive or the first window fails
  * loudly).
  *
  * ADMISSION CONTROL (VERDICT r17 gap #1 — at 100 TB the initial
  * live-set snapshot as ONE micro-batch is a non-starter, and a stream
  * that falls behind must not drain its whole backlog in one
  * `getBatch`): `maxBatchesPerTrigger` caps how many batch DIRS a
  * micro-batch serves, `maxBytesPerTrigger` caps their on-disk bytes
  * (whichever trips first; every trigger still serves at least one
  * unit so the stream always progresses) — Delta's
  * `maxFilesPerTrigger`/`maxBytesPerTrigger` pair over this protocol.
  * Under a cap an `earliest` stream PINS its initial-snapshot version
  * at first construction and serves that snapshot's live dirs in
  * chunks across micro-batches (offset form `v#i` = "first `i` live
  * dirs of the pinned snapshot served"), then follows the commit
  * history with at most the configured batches per trigger. Caps are
  * admission knobs, not semantics: the union of all micro-batches is
  * identical with and without them, and a cap can be added, changed,
  * or removed across restarts (an uncapped or pre-cap checkpoint
  * simply never re-enters the chunked-snapshot phase — its snapshot
  * already served whole). The admission HIGH-WATER (last offset
  * handed out) is persisted under the stream's metadata dir and kept
  * fresh by getBatch through UNCAPPED stretches too, so re-capping a
  * checkpoint resumes from where the stream actually is; a legacy
  * checkpoint with no high-water at all gets one uncapped catch-up
  * window from the engine's committed offset to the current head —
  * never a horizon replay (the FileStreamSource metadata-log
  * discipline; the engine's own WAL remains the source of truth for
  * what was CONSUMED).
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

  /** Schema of the CHANGES feed: _change_type + data columns +
    * _commit_version (Delta CDF's column naming — underscore-prefixed
    * precisely so the reserved columns cannot collide with ordinary
    * data columns; ADVICE r17 renamed from the bare `change_type` the
    * doc wrongly claimed matched Delta). A data column that DOES use a
    * reserved name fails loudly here, at stream start, instead of
    * producing a duplicate-name schema with ambiguous resolution. */
  private[sources] def changesSchema(spark: SparkSession, path: String): StructType = {
    val data = streamSchema(spark, path).fields.dropRight(1) // no batch_id
    val reserved = Set("_change_type", "_commit_version")
    val clash = data.map(_.name).filter(reserved)
    require(clash.isEmpty,
      s"$path has data column(s) ${clash.mkString(", ")} colliding with " +
        "the change-feed's reserved columns (_change_type, " +
        "_commit_version) — rename them before reading the table as a " +
        "changes stream")
    StructType(
      StructField("_change_type", org.apache.spark.sql.types.StringType,
        nullable = false) +:
        data :+
        StructField("_commit_version", org.apache.spark.sql.types.LongType,
          nullable = false))
  }

  /** Reader-side entry point: a streaming DataFrame over the governed
    * table at `path`. `startingVersion` is `earliest` / `latest` / a
    * numeric manifest version (Delta's convention — inclusive, serves
    * the raw append history from that commit onward rather than an
    * initial-snapshot live set). `maxBatchesPerTrigger` /
    * `maxBytesPerTrigger` are the admission knobs (see the class
    * doc); None = uncapped. */
  def readStream(spark: SparkSession, path: String,
                 startingVersion: String = "earliest",
                 maxBatchesPerTrigger: Option[Int] = None,
                 maxBytesPerTrigger: Option[Long] = None): DataFrame = {
    var r = spark.readStream.format(classOf[SnapshotStreamProvider].getName)
      .option("path", path)
      .option("startingVersion", startingVersion)
    maxBatchesPerTrigger.foreach(n => r = r.option("maxBatchesPerTrigger", n.toString))
    maxBytesPerTrigger.foreach(b => r = r.option("maxBytesPerTrigger", b.toString))
    r.load()
  }

  /** CHANGE DATA FEED entry point: per-commit row-level changes
    * (`_change_type` delete/insert + `_commit_version`) — the streaming
    * face of [[Snapshot.diffVersions]]. `maxBatchesPerTrigger` here
    * caps COMMITS (diff legs) per micro-batch — a replay over a long
    * history otherwise builds one union leg per commit in a single
    * `getBatch` (VERDICT r17 gap #2: driver planning blow-up) — and
    * `maxBytesPerTrigger` caps the window by each commit's DIFF COST
    * (the on-disk bytes of its manifest symmetric difference), so a
    * replay over a history of fat commits stays byte-bounded even
    * when the commit count is low. See [[SnapshotChangesSource]]. */
  def readChanges(spark: SparkSession, path: String,
                  startingVersion: String = "latest",
                  maxBatchesPerTrigger: Option[Int] = None,
                  maxBytesPerTrigger: Option[Long] = None): DataFrame = {
    var r = spark.readStream.format(classOf[SnapshotStreamProvider].getName)
      .option("path", path)
      .option("startingVersion", startingVersion)
      .option("mode", "changes")
    maxBatchesPerTrigger.foreach(n => r = r.option("maxBatchesPerTrigger", n.toString))
    maxBytesPerTrigger.foreach(b => r = r.option("maxBytesPerTrigger", b.toString))
    r.load()
  }

  /** A value PINNED atomically (temp + rename) under the stream's
    * metadata dir on first construction — recomputing it after a
    * crash-restart would silently skip in-between commits when the
    * engine replays its WAL'd first offset (the FileStreamSource
    * metadataLog discipline); shared by both source modes. */
  private[sources] def pinned(spark: SparkSession, metadataPath: String,
                              name: String)(compute: => Long): Long = {
    val fs = new org.apache.hadoop.fs.Path(metadataPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val f = new org.apache.hadoop.fs.Path(metadataPath, name)
    def readPinned(): Long = {
      val in = fs.open(f)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      try text.toLong
      catch { case e: NumberFormatException =>
        throw new IllegalStateException(
          s"corrupt snapshot-stream pin at $f: '$text'", e)
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
        s".$name.${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, false)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      if (fs.rename(tmp, f)) v
      else { fs.delete(tmp, false); readPinned() }
    }
  }

  private[sources] def pinnedHorizon(spark: SparkSession, metadataPath: String)
                                    (compute: => Long): Long =
    pinned(spark, metadataPath, "graft-snapshot-initial-version")(compute)

  /** Per-batch-dir on-disk bytes, memoized on SUCCESS only (dirs are
    * immutable once committed; one recursive listing each,
    * metadata-only). A listing failure reports UNKNOWN (Long.MaxValue)
    * — treated as cap-tripping by the admission arithmetic, so a
    * transient object-store error shrinks the window to its floor of
    * one unit instead of silently disabling the byte budget and
    * serving the whole backlog in one micro-batch; nothing sticks,
    * the next trigger retries the listing. Shared by both source
    * modes' admission. */
  private[sources] final class DirBytes(spark: SparkSession, path: String) {
    private val memo = scala.collection.mutable.HashMap.empty[Long, Long]
    def apply(batchId: Long): Long =
      memo.get(batchId).getOrElse {
        try {
          val p = new org.apache.hadoop.fs.Path(s"$path/batch_id=$batchId")
          val n = p.getFileSystem(spark.sessionState.newHadoopConf())
            .getContentSummary(p).getLength
          memo(batchId) = n
          n
        } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
      }
  }

  /** Saturating add: UNKNOWN (MaxValue) sizes poison the sum instead
    * of wrapping negative past a real cap. */
  private[sources] def addSat(a: Long, b: Long): Long = {
    val s = a + b
    if (((a ^ s) & (b ^ s)) < 0) Long.MaxValue else s
  }
}

/** Admission knobs shared by both source modes, parsed once. */
private[graft] final case class Admission(maxBatches: Option[Int],
                                            maxBytes: Option[Long]) {
  require(maxBatches.forall(_ > 0),
    s"maxBatchesPerTrigger must be positive: $maxBatches")
  require(maxBytes.forall(_ > 0),
    s"maxBytesPerTrigger must be positive: $maxBytes")
  def capped: Boolean = maxBatches.isDefined || maxBytes.isDefined
}

private[graft] object Admission {
  def apply(parameters: Map[String, String]): Admission =
    Admission(
      parameters.get("maxBatchesPerTrigger").map(_.toInt),
      parameters.get("maxBytesPerTrigger").map(_.toLong))
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
    val (earliest, startAt) =
      parameters.getOrElse("startingVersion", "earliest") match {
        case "earliest" => (true, None)
        case "latest" => (false, None)
        case n if n.forall(_.isDigit) && n.nonEmpty =>
          val v = n.toLong
          require(v >= 1, s"startingVersion must be >= 1 (v1 is the " +
            s"first commit): $v")
          (false, Some(v))
        case other => throw new IllegalArgumentException(
          s"startingVersion must be 'earliest', 'latest', or a numeric " +
            s"manifest version: $other")
      }
    if (isChanges(parameters))
      new SnapshotChangesSource(sqlContext.sparkSession, path, earliest,
        metadataPath, Admission(parameters), startAt)
    else
      new SnapshotStreamSource(sqlContext.sparkSession, path, earliest,
        metadataPath, Admission(parameters), startAt)
  }
}

/** Offset of the appends-mode source. Two serialized forms:
  *  - bare `v` ([[LongOffset]]-compatible — every pre-admission
  *    checkpoint): "everything committed through manifest version v
  *    served, initial snapshot included".
  *  - `v#i` (chunked-snapshot phase only): "first `i` live batch dirs
  *    of the snapshot pinned at version v served; no appends yet".
  * Ordering is lexicographic on (v, i) with bare = (v, ∞): every
  * chunk offset of the pinned snapshot precedes every append offset. */
private[graft] final case class SnapshotChunkOffset(v: Long, served: Int)
    extends Offset {
  override val json: String = s"$v#$served"
}

private[graft] object SnapshotOffsets {
  /** (version, Some(servedChunks) | None = snapshot fully served). */
  def parseJson(j: String): (Long, Option[Int]) = {
    val cut = j.indexOf('#')
    if (cut < 0) (j.toLong, None)
    else (j.substring(0, cut).toLong, Some(j.substring(cut + 1).toInt))
  }
  def parse(o: Offset): (Long, Option[Int]) = parseJson(o.json)
}

final class SnapshotStreamSource(spark: SparkSession, path: String,
                                 earliest: Boolean,
                                 metadataPath: String,
                                 admission: Admission = Admission(None, None),
                                 startAtVersion: Option[Long] = None)
    extends Source {

  override val schema: StructType = SnapshotStream.streamSchema(spark, path)

  private val fs = new org.apache.hadoop.fs.Path(metadataPath)
    .getFileSystem(spark.sessionState.newHadoopConf())

  /** Whether this checkpoint existed before this construction —
    * captured BEFORE [[initialVersion]] pins the horizon file (which
    * is exactly what marks a checkpoint as existing). */
  private val freshCheckpoint: Boolean = !fs.exists(
    new org.apache.hadoop.fs.Path(metadataPath,
      "graft-snapshot-initial-version"))

  /** Version horizon of the stream: 0 (earliest — batch 0 serves the
    * live set), an explicit numeric startingVersion minus one (the
    * Delta convention: version v's OWN commits are served — and like
    * Delta, a numeric start serves the raw append history from v
    * onward, NOT a live-set snapshot, so rows retired after v DO
    * appear; manifests back to v-1 must still exist or the first
    * window fails loudly), or the version at FIRST construction
    * (latest) — pinned via [[SnapshotStream.pinnedHorizon]]. */
  private val initialVersion: Long =
    SnapshotStream.pinnedHorizon(spark, metadataPath)(
      startAtVersion.map(_ - 1).getOrElse(
        if (earliest) 0L else Snapshot.latestVersion(spark, path).getOrElse(0L)))

  /** Chunked-snapshot phase (capped `earliest` streams only): the
    * initial snapshot's version, pinned at the FIRST construction of
    * this checkpoint — so its live set is a stable, replayable list
    * the chunk offsets index into. Pinned only when this checkpoint
    * is BORN capped: on a pre-existing checkpoint (horizon pin already
    * present, marker absent) the snapshot was already served whole,
    * and entering the chunk phase now would re-serve it. Read back
    * unconditionally so a later UNCAPPED restart still understands
    * the checkpoint's chunk-form offsets. */
  private val chunkSnapshotV: Option[Long] = {
    val markerName = "graft-snapshot-chunked-at"
    val marker = new org.apache.hadoop.fs.Path(metadataPath, markerName)
    if (fs.exists(marker))
      // compute arm unreachable: pinned() short-circuits to the read
      Some(SnapshotStream.pinned(spark, metadataPath, markerName)(0L))
    else if (admission.capped && earliest && freshCheckpoint)
      Some(SnapshotStream.pinned(spark, metadataPath, markerName)(
        Snapshot.latestVersion(spark, path).getOrElse(0L)))
    else None
  }

  /** Spec hooks. */
  private[graft] def pinnedInitialVersion: Long = initialVersion
  private[graft] def pinnedChunkSnapshotVersion: Option[Long] = chunkSnapshotV

  /** The pinned snapshot's live batch ids, sorted — the stable list
    * chunk offsets index into. Resolved once (manifests immutable). */
  private lazy val snapshotLive: Seq[Long] =
    chunkSnapshotV.filter(_ > 0)
      .map(v => Snapshot.readManifest(spark, path, v).batches.sorted)
      .getOrElse(Seq.empty)

  /** Per-batch-dir bytes with UNKNOWN-poisons-the-cap semantics
    * ([[SnapshotStream.DirBytes]], review r18 #2). */
  private val bytesOf = new SnapshotStream.DirBytes(spark, path)
  private def addSat(a: Long, b: Long): Long = SnapshotStream.addSat(a, b)

  /** Take ids off the front of `candidates` until a cap trips —
    * always at least one, so the stream progresses. */
  private def admit(candidates: Seq[Long]): Int = {
    val byCount = admission.maxBatches.getOrElse(Int.MaxValue)
    var taken = 0
    var bytes = 0L
    while (taken < candidates.size && taken < byCount &&
      (taken == 0 ||
        admission.maxBytes.forall(b =>
          addSat(bytes, bytesOf(candidates(taken))) <= b))) {
      bytes = addSat(bytes, bytesOf(candidates(taken)))
      taken += 1
    }
    taken
  }

  /** Last offset handed out (admission state), persisted under the
    * metadata dir. The engine's WAL stays the consumption record; this
    * only remembers where ADMISSION got to, so a restart neither
    * re-admits a full backlog nor skips the pending window. Read AND
    * written regardless of the current cap — getBatch keeps it fresh
    * through uncapped stretches too, so ADDING a cap to an existing
    * checkpoint resumes from where the stream actually is instead of
    * replaying from the horizon (review r18 #1: a re-capped checkpoint
    * whose high state sat behind the engine's committed offset
    * re-served already-delivered versions). A legacy checkpoint with
    * no high file at all gets ONE final uncapped catch-up window
    * (cur falls back to the CURRENT head — the stream's real position
    * is at most that, and the engine's own committed offset bounds the
    * window), never a replay. */
  private val highFile = new org.apache.hadoop.fs.Path(metadataPath,
    "graft-admission-high")
  private var high: Option[(Long, Option[Int])] = {
    if (!fs.exists(highFile)) None
    else {
      val in = fs.open(highFile)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      Some(SnapshotOffsets.parseJson(text))
    }
  }
  private var persistedHigh: Option[(Long, Option[Int])] = high

  private def persistHigh(p: (Long, Option[Int])): Unit =
    if (!persistedHigh.contains(p)) {
      Snapshot.atomicOverwrite(spark.sessionState.newHadoopConf(), highFile,
        mkOffset(p).json)
      persistedHigh = Some(p)
    }

  /** Raise the high-water to at least `p` (in memory + on disk). */
  private def raiseHigh(p: (Long, Option[Int])): Unit = {
    val merged = high.map(laterOf(_, p)).getOrElse(p)
    high = Some(merged)
    persistHigh(merged)
  }

  private def laterOf(a: (Long, Option[Int]),
                      b: (Long, Option[Int])): (Long, Option[Int]) =
    (a, b) match {
      case ((av, _), (bv, _)) if av != bv => if (av > bv) a else b
      case ((_, None), _) => a // bare outranks any chunk form at same v
      case (_, (_, None)) => b
      case ((av, Some(ai)), (_, Some(bi))) => (av, Some(math.max(ai, bi)))
    }

  /** Ids committed as of version `v` (empty below the first publish).
    * `committed` is cumulative in every manifest, so this is ONE
    * manifest read — no history walk. */
  private def committedAt(v: Long): Set[Long] =
    if (v <= 0) Set.empty
    else {
      val m = Snapshot.readManifest(spark, path, v)
      (m.committed ++ m.batches).toSet
    }

  private def mkOffset(p: (Long, Option[Int])): Offset = p match {
    case (v, None) => LongOffset(v)
    case (v, Some(i)) => SnapshotChunkOffset(v, i)
  }

  override def getOffset: Option[Offset] = {
    val headOpt = Snapshot.latestVersion(spark, path)
    if (!admission.capped) headOpt.map(LongOffset(_))
    else headOpt.map { head =>
      val cur: (Long, Option[Int]) = high.getOrElse(
        chunkSnapshotV match {
          // born-capped earliest checkpoint: snapshot phase. Safe on a
          // restart too — an absent high file means no capped offset
          // was ever handed out AND no batch ever ran (both persist),
          // so chunk 0 is genuinely where this checkpoint is.
          case Some(sv) => (sv, Some(0))
          // pre-admission/legacy checkpoint: ONE uncapped catch-up
          // window from wherever the engine's committed offset is to
          // the current head — never a horizon replay (review r18 #1).
          // A legacy earliest checkpoint that never ran batch 0 still
          // serves its initial snapshot: getBatch(None, head) takes
          // the uncapped live-set branch.
          case None if !freshCheckpoint => (head, None)
          case None => (initialVersion, None)
        })
      val next: (Long, Option[Int]) = cur match {
        case (sv, Some(i)) if i < snapshotLive.size =>
          // snapshot phase: admit the next chunk of pinned live dirs
          val n = i + admit(snapshotLive.drop(i))
          if (n < snapshotLive.size) (sv, Some(n)) else (sv, None)
        case (v, _) if v >= head =>
          cur // caught up: zero manifest reads on the idle steady state
        case (v, _) =>
          // append phase: walk versions past v, admitting whole
          // commits until a cap trips. A VERSION is the atomic
          // admission unit here (its batch ids committed together) —
          // and at least one version is always taken, so a single
          // commit larger than the cap still serves.
          var upTo = v
          var count = 0
          var bytes = 0L
          var seen = committedAt(v)
          var stop = false
          while (upTo < head && !stop) {
            val nextSeen = committedAt(upTo + 1)
            val newIds = (nextSeen -- seen).filter(_ >= 0).toSeq.sorted
            val wouldCount = count + newIds.size
            val wouldBytes = newIds.map(bytesOf(_)).foldLeft(bytes)(addSat(_, _))
            val exceeds =
              admission.maxBatches.exists(wouldCount > _) ||
                admission.maxBytes.exists(wouldBytes > _)
            if (exceeds && upTo > v) stop = true
            else {
              upTo += 1; count = wouldCount; bytes = wouldBytes
              seen = nextSeen
              if (admission.maxBatches.exists(count >= _) ||
                admission.maxBytes.exists(bytes >= _)) stop = true
            }
          }
          (upTo, None)
      }
      if (next != cur) raiseHigh(next)
      mkOffset(high.getOrElse(next))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val (toV, toChunk) = SnapshotOffsets.parse(end)
    // keep the admission high-water fresh through UNCAPPED stretches
    // too: the engine's consumed offsets are the stream's real
    // position, and a later re-cap must resume from them (review r18)
    raiseHigh((toV, toChunk))
    def empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    def readIds(ids: Seq[Long]): DataFrame =
      if (ids.isEmpty) empty
      else spark.read.option("basePath", path)
        .schema(StructType(schema.fields.dropRight(1)))
        .parquet(ids.map(b => s"$path/batch_id=$b"): _*)
    val batchDf = (start, chunkSnapshotV) match {
      case (None, None) if earliest =>
        // INITIAL SNAPSHOT (uncapped form): the end manifest's LIVE
        // set — never the cumulative committed history, which would
        // resurrect retention-retired rows and read fold-input dirs
        // vacuum may have swept (review r17 #1). Folds (the current
        // content after a pre-stream compaction) serve exactly once.
        val m = Snapshot.readManifest(spark, path, toV)
        if (m.batches.isEmpty) empty // fully-retired table: no history
        else Snapshot.readBatches(spark, path, m)
      case (st, Some(sv)) if st.forall(o => SnapshotOffsets.parse(o) match {
          case (v, Some(_)) => v == sv
          case _ => false
        }) =>
        // CHUNKED-SNAPSHOT window: [fromChunk, toChunk) of the pinned
        // live list, plus any appends committed in (sv, toV] (the
        // window that closes the snapshot may also be asked to carry
        // the first appends after a restart gap)
        val fromChunk = st.map(o => SnapshotOffsets.parse(o)._2.get).getOrElse(0)
        val upToChunk = if (toV == sv) toChunk.getOrElse(snapshotLive.size)
          else snapshotLive.size
        val snapIds = snapshotLive.slice(fromChunk, upToChunk)
        val appendIds =
          if (toV <= sv) Seq.empty
          else (committedAt(toV) -- committedAt(sv)).filter(_ >= 0).toSeq.sorted
        readIds(snapIds ++ appendIds)
      case (st, _) =>
        val fromV = st.map(o => SnapshotOffsets.parse(o)._1).getOrElse(initialVersion)
        // newly-committed APPENDS in (fromV, toV]: maintenance ids
        // (build -1, folds ≤ -2) re-home rows this stream already served
        val ids = (committedAt(toV) -- committedAt(fromV))
          .filter(_ >= 0).toSeq.sorted
        readIds(ids)
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
  * in its offset window, tagged `_change_type` (delete/insert) and
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
  *
  * `maxBatchesPerTrigger` caps COMMITS (union legs) per micro-batch:
  * an uncapped replay over a 10k-commit history would build a
  * 10k-leg union plan in one `getBatch` (VERDICT r17 gap #2) — with
  * the cap each micro-batch plans a bounded window and the engine's
  * trigger loop walks the history. `maxBytesPerTrigger` caps the
  * window by BYTES, costing each commit as the on-disk size of its
  * manifest symmetric difference — exactly the dirs its diff leg
  * reads (VERDICT r18 missing #2: a few fat commits could otherwise
  * admit maxBatches × commit-size bytes). Both caps admit at least
  * one commit so the stream always progresses; offsets stay bare
  * versions, so caps can be added or removed across restarts freely.
  */
final class SnapshotChangesSource(spark: SparkSession, path: String,
                                  earliest: Boolean,
                                  metadataPath: String,
                                  admission: Admission = Admission(None, None),
                                  startAtVersion: Option[Long] = None)
    extends Source {

  override val schema: StructType = SnapshotStream.changesSchema(spark, path)

  private val fs = new org.apache.hadoop.fs.Path(metadataPath)
    .getFileSystem(spark.sessionState.newHadoopConf())

  /** Whether this checkpoint existed before this construction —
    * captured BEFORE [[initialVersion]] pins the horizon file (the
    * pin is exactly what marks a checkpoint as existing, so field
    * ORDER is load-bearing here — same as the appends twin). */
  private val freshCheckpoint: Boolean = !fs.exists(
    new org.apache.hadoop.fs.Path(metadataPath,
      "graft-snapshot-initial-version"))

  /** earliest → 0 (batch 0 starts at v1's content); a numeric
    * startingVersion → v−1 (v's own changes are the first served,
    * Delta's inclusive convention; the window's manifests must
    * survive); latest → the version at first construction — pinned
    * like the appends mode. */
  private val initialVersion: Long =
    SnapshotStream.pinnedHorizon(spark, metadataPath)(
      startAtVersion.map(_ - 1).getOrElse(
        if (earliest) 0L else Snapshot.latestVersion(spark, path).getOrElse(0L)))

  private[graft] def pinnedInitialVersion: Long = initialVersion

  private def ver(o: Offset): Long = o.json.toLong

  /** Admission state (see the appends-mode twin's scaladoc for the
    * full restart/re-cap contract): the last version handed out,
    * persisted so a restart keeps walking the history in capped
    * windows. Read AND written regardless of the current cap —
    * getBatch keeps it fresh through uncapped stretches, and a legacy
    * pre-admission checkpoint falls back to the CURRENT head for one
    * uncapped catch-up window, never a horizon replay (review r18 #1:
    * re-capping a checkpoint must not re-serve delivered commits). */
  private val highFile = new org.apache.hadoop.fs.Path(metadataPath,
    "graft-admission-high")
  private var high: Option[Long] = {
    if (!fs.exists(highFile)) None
    else {
      val in = fs.open(highFile)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      Some(text.toLong)
    }
  }
  private var persistedHigh: Option[Long] = high

  private def raiseHigh(v: Long): Unit = {
    val merged = math.max(high.getOrElse(v), v)
    high = Some(merged)
    if (!persistedHigh.contains(merged)) {
      Snapshot.atomicOverwrite(spark.sessionState.newHadoopConf(), highFile,
        merged.toString)
      persistedHigh = Some(merged)
    }
  }

  /** What commit v COSTS to serve: the on-disk bytes of its manifest
    * symmetric difference — exactly the dirs [[Snapshot.diffVersions]]
    * will read for that leg (compaction commits read both sides, and
    * their byte cost says so). Manifest batch lists memoize (manifests
    * immutable); a missing/expired manifest reports UNKNOWN, which
    * poisons the sum and trips the cap to its one-commit floor rather
    * than silently uncapping the window. */
  private val verBatches = scala.collection.mutable.HashMap.empty[Long, Seq[Long]]
  private val dirBytes = new SnapshotStream.DirBytes(spark, path)
  private def commitBytes(v: Long): Long =
    try {
      def batchesAt(mv: Long): Seq[Long] =
        if (mv <= 0) Seq.empty
        else verBatches.getOrElseUpdate(mv,
          Snapshot.readManifest(spark, path, mv).batches)
      val prev = batchesAt(v - 1)
      val cur = batchesAt(v)
      (prev.diff(cur) ++ cur.diff(prev))
        .map(dirBytes(_)).foldLeft(0L)(SnapshotStream.addSat)
    } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }

  override def getOffset: Option[Offset] = {
    val headOpt = Snapshot.latestVersion(spark, path)
    if (!admission.capped) headOpt.map(LongOffset(_))
    else headOpt.map { head =>
      val cur = high.getOrElse(
        if (!freshCheckpoint) head else initialVersion)
      // admit commits off the front of the pending window until a cap
      // trips — count (maxBatchesPerTrigger) or bytes
      // (maxBytesPerTrigger over each commit's diff cost); always at
      // least one commit, so the stream progresses under any cap
      val byCount = admission.maxBatches.map(_.toLong).getOrElse(Long.MaxValue)
      var next = cur
      var bytes = 0L
      var stop = false
      while (!stop && next < head && (next - cur) < byCount) {
        val would = SnapshotStream.addSat(bytes,
          if (admission.maxBytes.isDefined) commitBytes(next + 1) else 0L)
        if (next > cur && admission.maxBytes.exists(would > _)) stop = true
        else {
          next += 1
          bytes = would
          if (admission.maxBytes.exists(bytes >= _)) stop = true
        }
      }
      if (next > cur) raiseHigh(next)
      LongOffset(math.max(next, cur))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val fromV = start.map(ver).getOrElse(initialVersion)
    val toV = ver(end)
    raiseHigh(toV) // fresh through uncapped stretches too (review r18)
    def tagged(df: DataFrame, v: Long): DataFrame =
      df.withColumn("_commit_version", lit(v))
        .select(schema.fieldNames.map(col): _*)
    val parts = ((fromV + 1) to toV).map { v =>
      if (v == 1L)
        // the first commit has no predecessor to diff against: its
        // content IS its insert set (earliest-mode only — latest mode
        // never starts below the current version)
        tagged(Snapshot.readAt(spark, path, 1L).drop("batch_id")
          .select(lit("insert").as("_change_type") +:
            schema.fieldNames.filter(n =>
              n != "_change_type" && n != "_commit_version").map(col): _*), 1L)
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
