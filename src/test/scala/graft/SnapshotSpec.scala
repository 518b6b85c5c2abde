package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.operators.{Retention, SketchTable, Snapshot}

/** The manifest commit protocol: readers resolve live state through
  * the newest manifest, a pinned reader's view survives any number of
  * later publishes (retention AND compaction) until vacuum, and every
  * lifecycle writer stages first / publishes last. The composed
  * retain→compact→read equivalence is oracle-gated by
  * rt1_snapshot_isolation; these cover the protocol edges a VALUES
  * oracle can't. */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def plantSketch(sub: String, days: Int = 5): String = {
    val path = TempDirs.path(s"snapshot-spec/$sub")
    def day(k: Int) = (k * 50 until k * 50 + 60)
      .map(u => ("all", u.toLong)).toDF("key", "user_id")
    (0 until days).foreach(k =>
      SketchTable.appendBatch(day(k), "key", "user_id", path, k.toLong))
    path
  }

  private def est(path: String): Long =
    SketchTable.estimateDistinct(spark, path).head().getLong(1)

  private def dirIds(path: String): Seq[Long] = Retention.batchIds(spark, path)

  /** Content fingerprint of (key, sketch) rows — sketch bytes compared
    * by VALUE (base64), not array identity. */
  private def rowSet(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.select("key", "sketch").collect()
      .map(r => (r.getString(0),
        java.util.Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](1))))
      .toSeq.sorted

  test("enable seeds v1 from the listing; publishes are monotonic and atomic") {
    val path = plantSketch("enable")
    Snapshot.isEnabled(spark, path) shouldBe false
    Snapshot.enable(spark, path) shouldBe 1L
    Snapshot.isEnabled(spark, path) shouldBe true
    val m1 = Snapshot.latest(spark, path).get
    m1.copy(schemaJson = None, committedAtMs = None) shouldBe
      Snapshot.Manifest(1L, Seq(0L, 1L, 2L, 3L, 4L), Seq(0L, 1L, 2L, 3L, 4L))
    // every protocol publish carries its writer-clock commit stamp
    m1.committedAtMs.isDefined shouldBe true
    // enable captured the table schema (data columns only)
    m1.schemaJson.get should include("\"key\"")
    m1.schemaJson.get should not include "batch_id"
    Snapshot.publish(spark, path, Seq(2L, 3L, 4L)) shouldBe 2L
    Snapshot.latestVersion(spark, path) shouldBe Some(2L)
    // the committed HISTORY rides every manifest: retired ids stay
    // known to stagedAppend through the single newest manifest
    Snapshot.latest(spark, path).get.committed shouldBe Seq(0L, 1L, 2L, 3L, 4L)
    Snapshot.committedBatches(spark, path) shouldBe Set(0L, 1L, 2L, 3L, 4L)
    // no staging litter: only committed v*.json files in _manifests
    // (dot-files — local-FS .crc sidecars, staged tmps — are hidden by
    // Hadoop listing convention and excluded here too)
    val names = Files.list(Paths.get(path, Snapshot.ManifestDir))
      .toArray.map(_.toString.split("/").last).toSeq
      .filterNot(_.startsWith("."))
    names should not be empty
    all(names) should fullyMatch regex "v\\d{12}\\.json"
    // older versions remain readable (pinning) until vacuumed
    Snapshot.readManifest(spark, path, 1L).batches should contain(0L)
    // manifest expiry: versions older than the keep horizon go; the
    // newest keeps the full committed history, so redelivery detection
    // survives the metadata cleanup
    (3 to 6).foreach(i => Snapshot.publish(spark, path, Seq(2L, 3L, 4L, i.toLong)))
    Snapshot.expireManifests(spark, path, keepLast = 2) shouldBe Seq(1L, 2L, 3L, 4L)
    Snapshot.listVersions(spark, path) shouldBe Seq(5L, 6L)
    Snapshot.committedBatches(spark, path) shouldBe Set(0L, 1L, 2L, 3L, 4L, 5L, 6L)
    intercept[Exception] { Snapshot.readManifest(spark, path, 1L) } // pin expired
    Snapshot.expireManifests(spark, path, keepLast = 2) shouldBe Seq.empty
  }

  test("pinned reader is unaffected by concurrent retention AND compaction") {
    val path = plantSketch("pinned")
    Snapshot.enable(spark, path)
    val v1 = Snapshot.latestVersion(spark, path).get
    val fullBefore = est(path)

    // concurrent maintenance: logical retention then a full compaction
    Retention.dropBatchesBefore(spark, path, keepFrom = 2L) shouldBe Seq(0L, 1L)
    val folded = Snapshot.compactLive(spark, path)
    folded shouldBe -2L

    // the pinned reader resolves v1 AFTER both publishes — no file it
    // references was touched, so its estimate is the original full one
    val pinned = Snapshot.readAt(spark, path, v1)
      .groupBy(col("key"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("estimate"))
      .head().getLong(1)
    pinned shouldBe fullBefore

    // the live reader sees the retained-then-compacted view
    val live = est(path)
    math.abs(live - 160L) should be <= 16L
    (fullBefore - live) should be >= 60L

    // dropped + folded dirs are still on disk (logical-only so far)
    dirIds(path).toSet shouldBe Set(-2L, 0L, 1L, 2L, 3L, 4L)
    // vacuum expires old pins: only the newest manifest's dirs survive
    Snapshot.vacuum(spark, path).toSet shouldBe Set(0L, 1L, 2L, 3L, 4L)
    dirIds(path) shouldBe Seq(-2L)
    est(path) shouldBe live // post-vacuum live read unchanged
    // the expired pin now fails loudly, not silently-something-else
    intercept[Exception] { Snapshot.readAt(spark, path, v1).collect() }
  }

  test("retention on an enabled table is logical; on a plain table physical") {
    val enabledPath = plantSketch("logical")
    Snapshot.enable(spark, enabledPath)
    Retention.dropBatchesBefore(spark, enabledPath, 2L) shouldBe Seq(0L, 1L)
    dirIds(enabledPath) shouldBe Seq(0L, 1L, 2L, 3L, 4L) // files untouched
    Snapshot.liveBatches(spark, enabledPath) shouldBe Seq(2L, 3L, 4L)
    // idempotent at the manifest level too
    Retention.dropBatchesBefore(spark, enabledPath, 2L) shouldBe Seq.empty

    val plainPath = plantSketch("physical")
    Retention.dropBatchesBefore(spark, plainPath, 2L) shouldBe Seq(0L, 1L)
    dirIds(plainPath) shouldBe Seq(2L, 3L, 4L) // historical in-place delete
  }

  test("keepLastBatches goes through the manifest and protects the build") {
    val path = TempDirs.path("snapshot-spec/keeplast")
    SketchTable.build((0L until 10L).map(("k", _)).toDF("key", "u"),
      "key", "u", path)
    (0 until 4).foreach(k => SketchTable.appendBatch(
      (0L until 5L).map(("k", _)).toDF("key", "u"), "key", "u", path, k.toLong))
    Snapshot.enable(spark, path)
    Retention.keepLastBatches(spark, path, n = 2) shouldBe Seq(0L, 1L)
    Snapshot.liveBatches(spark, path) shouldBe Seq(-1L, 2L, 3L)
    dirIds(path) shouldBe Seq(-1L, 0L, 1L, 2L, 3L) // logical only
  }

  test("appendBatch on an enabled table stages then publishes; orphans vacuum") {
    val path = plantSketch("append", days = 2)
    Snapshot.enable(spark, path)
    val before = est(path)
    SketchTable.appendBatch(
      (500L until 560L).map(u => ("all", u)).toDF("key", "user_id"),
      "key", "user_id", path, 2L)
    Snapshot.liveBatches(spark, path) shouldBe Seq(0L, 1L, 2L)
    val afterAppend = est(path)
    (afterAppend - before) should be >= 50L // the new batch is visible
    // a crashed append = a staged dir with NO manifest: plant one
    val orphan = (900L until 960L).map(u => ("all", u)).toDF("key", "user_id")
    orphan.write.mode("overwrite").parquet(s"$path/batch_id=9")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // (simulate the crash: the dir exists but was never published)
    Snapshot.liveBatches(spark, path) should not contain 9L
    est(path) shouldBe afterAppend // invisible to the manifest-resolved read
    Snapshot.vacuum(spark, path) shouldBe Seq(9L)
    fs.exists(new org.apache.hadoop.fs.Path(s"$path/batch_id=9")) shouldBe false
  }

  test("compactLive preserves content exactly and descends ids across runs") {
    val path = plantSketch("compact", days = 3)
    Snapshot.enable(spark, path)
    val rowsBefore = rowSet(Snapshot.read(spark, path))
    Snapshot.compactLive(spark, path) shouldBe -2L
    rowSet(Snapshot.read(spark, path)) shouldBe rowsBefore
    // append, compact again WITHOUT vacuuming: the -2 dir is still on
    // disk, so the next compaction must descend past it
    SketchTable.appendBatch(
      (700L until 710L).map(u => ("all", u)).toDF("key", "user_id"),
      "key", "user_id", path, 5L)
    Snapshot.compactLive(spark, path) shouldBe -3L
    Snapshot.liveBatches(spark, path) shouldBe Seq(-3L)
  }

  test("retention never retires a compaction fold as 'ancient'") {
    val path = plantSketch("fold-protect", days = 3)
    Snapshot.enable(spark, path)
    Snapshot.compactLive(spark, path) shouldBe -2L
    // the fold id (-2) sorts below every ingest id — an age cut must
    // treat it as RESERVED, or the next routine pass empties the table
    Retention.dropBatchesBefore(spark, path, keepFrom = 100L) shouldBe Seq.empty
    Snapshot.liveBatches(spark, path) shouldBe Seq(-2L)
    SketchTable.appendBatch(
      (900L until 910L).map(u => ("all", u)).toDF("key", "user_id"),
      "key", "user_id", path, 7L)
    Retention.keepLastBatches(spark, path, n = 1) shouldBe Seq.empty
    Snapshot.liveBatches(spark, path) shouldBe Seq(-2L, 7L)
    // explicit full retirement still possible
    Retention.dropBatchesBefore(spark, path, keepFrom = 100L,
      includeBuild = true) shouldBe Seq(-2L, 7L)
  }

  test("redelivering a committed batch is a no-op: no overwrite, no resurrection") {
    val path = plantSketch("redeliver", days = 2)
    Snapshot.enable(spark, path)
    val v = Snapshot.latestVersion(spark, path).get
    val before = est(path)
    // redeliver the already-committed batch 1 with DIFFERENT content —
    // the manifest made the original append exactly-once, so nothing
    // may change: no manifest version, no directory rewrite under
    // concurrent readers
    SketchTable.appendBatch(
      (700L until 760L).map(u => ("all", u)).toDF("key", "user_id"),
      "key", "user_id", path, 1L)
    Snapshot.latestVersion(spark, path) shouldBe Some(v)
    est(path) shouldBe before
    // retire batch 0, then redeliver it: it must NOT resurrect
    Retention.dropBatchesBefore(spark, path, keepFrom = 1L) shouldBe Seq(0L)
    SketchTable.appendBatch(
      (800L until 860L).map(u => ("all", u)).toDF("key", "user_id"),
      "key", "user_id", path, 0L)
    Snapshot.liveBatches(spark, path) shouldBe Seq(1L)
  }

  test("multi-table root manifest commits the whole triple atomically") {
    val root = TempDirs.path("snapshot-spec/multitable")
    def write(sub: String, b: Long, n: Int): Unit =
      (0 until n).map(i => (b, i)).toDF("b", "i")
        .write.mode("overwrite").parquet(s"$root/$sub/batch_id=$b")
    write("t1", 0L, 3); write("t2", 0L, 3)
    Snapshot.enableSub(spark, root, "t1")
    // committed append: both sub-tables flip together
    Snapshot.stagedAppend(spark, root, 1L) {
      write("t1", 1L, 2); write("t2", 1L, 2)
    } shouldBe true
    Snapshot.readSub(spark, root, "t1").count() shouldBe 5
    Snapshot.readSub(spark, root, "t2").count() shouldBe 5
    // a crashed append (dirs staged, publish never ran) is invisible
    // to BOTH sub-tables — no torn postings-without-stats state
    write("t1", 2L, 9)
    Snapshot.readSub(spark, root, "t1").count() shouldBe 5
    // retention via the root is one manifest edit for the whole index
    Retention.dropBatchesBeforeAllTables(spark, root, keepFrom = 1L)
      .shouldBe(Map("" -> Seq(0L)))
    Snapshot.readSub(spark, root, "t1").count() shouldBe 2
    Snapshot.readSub(spark, root, "t2").count() shouldBe 2
    // vacuum sweeps every sub-table's unreferenced dirs (incl. the
    // crashed stage)
    Snapshot.vacuumAllTables(spark, root, Seq("t1", "t2")) shouldBe
      Map("t1" -> Seq(0L, 2L), "t2" -> Seq(0L))
  }

  test("an index rebuild resets manifest history: reused batch ids land again") {
    import graft.operators.Retrieval
    val idx = TempDirs.path("snapshot-spec/rebuild-index")
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha delta"))
      .toDF("doc_id", "text")
    Retrieval.buildPostingIndex(docs, "doc_id", "text", idx, nBuckets = 4)
    Snapshot.enableSub(spark, idx, "postings")
    Retrieval.appendToPostingIndex(
      Seq((3L, "alpha zeta")).toDF("doc_id", "text"), "doc_id", "text", idx, 0L)
    Snapshot.latest(spark, idx).get.batches shouldBe Seq(-1L, 0L)
    // rebuild: the stale root manifest must die with the data it
    // governed — a survivor would point probes at deleted batch dirs
    // AND silently no-op the first post-rebuild append below
    Retrieval.buildPostingIndex(docs, "doc_id", "text", idx, nBuckets = 4)
    Snapshot.latest(spark, idx).get.batches shouldBe Seq(-1L)
    Snapshot.committedBatches(spark, idx) shouldBe Set(-1L)
    // a REUSED micro-batch id (checkpoint restarted with the rebuild)
    // is a fresh commit, not a redelivery no-op
    Retrieval.appendToPostingIndex(
      Seq((4L, "alpha eta")).toDF("doc_id", "text"), "doc_id", "text", idx, 0L)
    Snapshot.latest(spark, idx).get.batches shouldBe Seq(-1L, 0L)
    Retrieval.bm25TopKIndexed(spark, idx, "doc_id", Seq("eta"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq shouldBe Seq(4L)
  }

  test("vacuum sweeps event-time ledger rows of non-live batches") {
    val path = plantSketch("ledger-vacuum", days = 3)
    (0 until 3).foreach { k =>
      Retention.recordBatchEventTime(
        (k * 50 until k * 50 + 60).map(u => ("all", u.toLong))
          .toDF("key", "user_id")
          .withColumn("ts", lit(java.sql.Timestamp.valueOf(
            f"2024-01-${k + 1}%02d 12:00:00"))),
        "ts", path, k.toLong)
    }
    Snapshot.enable(spark, path)
    Retention.dropBatchesBefore(spark, path, keepFrom = 2L) shouldBe Seq(0L, 1L)
    // logical drop leaves the ledger rows; vacuum sweeps them with the
    // dirs so a reused id can never inherit stale bounds
    Retention.batchLedger(spark, path).keySet shouldBe Set(0L, 1L, 2L)
    Snapshot.vacuum(spark, path).toSet shouldBe Set(0L, 1L)
    Retention.batchLedger(spark, path).keySet shouldBe Set(2L)
    // vacuum stays idempotent even after a FULL retire sweeps every
    // ledger row (the emptied dir must not fail the next maintenance)
    Retention.dropBatchesBefore(spark, path, keepFrom = 10L)
    Snapshot.vacuum(spark, path) shouldBe Seq(2L)
    Retention.batchLedger(spark, path) shouldBe Map.empty
    Snapshot.vacuum(spark, path) shouldBe Seq.empty // second pass: no-op
  }

  test("a fully-retired table reads loudly, never as an empty zero") {
    val path = plantSketch("retired", days = 2)
    Snapshot.enable(spark, path)
    Retention.dropBatchesBefore(spark, path, keepFrom = 10L, includeBuild = true)
    val e = intercept[IllegalArgumentException] { Snapshot.read(spark, path) }
    e.getMessage should include("no live batches")
  }

  test("non-enabled tables fall back to plain discovery everywhere") {
    val path = plantSketch("fallback", days = 2)
    rowSet(Snapshot.read(spark, path)) shouldBe rowSet(spark.read.parquet(path))
    Snapshot.liveBatches(spark, path) shouldBe Seq(0L, 1L)
  }

  test("diffVersions prunes to the symmetric difference and sees through compaction", Slow) {
    val path = TempDirs.path(s"snapshot-spec/diff-${java.util.UUID.randomUUID()}")
    def batch(id: Long, ks: String*): Unit = Snapshot.stagedAppend(spark, path, id) {
      ks.map(k => (k, id)).toDF("k", "born").write
        .mode("overwrite").parquet(s"$path/batch_id=$id")
    }
    batch(0L, "a", "b"); batch(1L, "c")
    Snapshot.enable(spark, path)
    val v1 = Snapshot.latestVersion(spark, path).get
    batch(2L, "d")
    val v2 = Snapshot.latestVersion(spark, path).get

    // append diff: only batch 2 read — batches 0/1 are common and pruned
    val d12 = Snapshot.diffVersions(spark, path, v1, v2)
    d12.inputFiles.foreach(_ should include("batch_id=2"))
    d12.collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("insert", "d"))

    // identical versions diff empty without reading data files
    Snapshot.publish(spark, path, Snapshot.latest(spark, path).get.batches)
    val v3 = Snapshot.latestVersion(spark, path).get
    Snapshot.diffVersions(spark, path, v2, v3).count() shouldBe 0L

    // compaction: every row moves directories, the diff reports nothing
    Snapshot.compactLive(spark, path)
    val v4 = Snapshot.latestVersion(spark, path).get
    Snapshot.diffVersions(spark, path, v3, v4).count() shouldBe 0L

    // retention diff reports the retired rows as deletes, reverse
    // direction reports them as inserts (diff is directional)
    Snapshot.diffVersions(spark, path, v1, v4).count() shouldBe 1L // just d
    val back = Snapshot.diffVersions(spark, path, v4, v1)
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._2)
    back shouldBe Array(("delete", "d"))
  }

  test("schema evolution rides the manifest: new columns null-fill old batches, time travel pins schema, type conflicts abort", Slow) {
    val path = TempDirs.path(s"snapshot-spec/evolve-${java.util.UUID.randomUUID()}")
    Seq(("a", 1L)).toDF("k", "n").write.mode("overwrite")
      .parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    val v1 = Snapshot.latestVersion(spark, path).get
    // batch 1 brings a new column
    Snapshot.stagedAppend(spark, path, 1L) {
      Seq(("b", 2L, "en")).toDF("k", "n", "lang").write
        .mode("overwrite").parquet(s"$path/batch_id=1")
    }
    val now = Snapshot.read(spark, path)
    now.columns.toSeq shouldBe Seq("k", "n", "lang", "batch_id")
    now.orderBy("k").collect().map(r =>
      (r.getString(0), r.getLong(1), Option(r.getString(2)))) shouldBe
      Array(("a", 1L, None), ("b", 2L, Some("en")))
    // the pinned v1 reader sees the columns ITS version knew
    Snapshot.readAt(spark, path, v1).columns.toSeq shouldBe Seq("k", "n", "batch_id")
    // retention and compaction carry the widened schema forward
    Snapshot.retainFrom(spark, path, keepFrom = 1L)
    Snapshot.compactLive(spark, path)
    Snapshot.read(spark, path).columns.toSeq shouldBe
      Seq("k", "n", "lang", "batch_id")
    // a type change on an existing column must abort BEFORE publish
    val before = Snapshot.latestVersion(spark, path).get
    intercept[IllegalArgumentException] {
      Snapshot.stagedAppend(spark, path, 9L) {
        Seq(("c", "oops", "de")).toDF("k", "n", "lang").write
          .mode("overwrite").parquet(s"$path/batch_id=9")
      }
    }.getMessage should include("type conflict")
    Snapshot.latestVersion(spark, path).get shouldBe before
    // the orphaned conflicting dir is exactly what vacuum sweeps
    Snapshot.vacuum(spark, path) should contain(9L)
  }

  test("diffVersions catches duplicate-row multiplicity changes (multiset, not set, semantics)", Slow) {
    val path = TempDirs.path(s"snapshot-spec/dup-${java.util.UUID.randomUUID()}")
    def batch(id: Long, ks: String*): Unit = Snapshot.stagedAppend(spark, path, id) {
      // constant payload: the same logical row can appear in many batches
      ks.map(k => (k, 1)).toDF("k", "p").write
        .mode("overwrite").parquet(s"$path/batch_id=$id")
    }
    batch(0L, "x"); Snapshot.enable(spark, path)
    val v1 = Snapshot.latestVersion(spark, path).get
    batch(1L, "x") // second copy of the identical row
    val v2 = Snapshot.latestVersion(spark, path).get
    Snapshot.diffVersions(spark, path, v1, v2)
      .collect().map(_.getString(0)).toSeq shouldBe Seq("insert")
  }

  test("merge rewrites ONLY affected batches; untouched rows keep their directories", Slow) {
    val path = TempDirs.path(s"snapshot-spec/merge-${java.util.UUID.randomUUID()}")
    def batch(id: Long, rows: (String, Long)*): Unit =
      Snapshot.stagedAppend(spark, path, id) {
        rows.toDF("k", "n").write.mode("overwrite")
          .parquet(s"$path/batch_id=$id")
      }
    batch(0L, ("a", 1L), ("b", 2L)); batch(1L, ("c", 3L))
    Snapshot.enable(spark, path)
    val v1 = Snapshot.latestVersion(spark, path).get

    val stats = Snapshot.merge(spark, path,
      Seq(("b", 20L), ("d", 4L)).toDF("k", "n"), Seq("k"))
    stats.matched shouldBe 1L
    stats.inserted shouldBe 1L
    stats.rewrittenBatches shouldBe Seq(0L)

    val now = Snapshot.read(spark, path)
    now.orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))) shouldBe
      Array(("a", 1L), ("b", 20L), ("c", 3L), ("d", 4L))
    // batch 1 was never rewritten: row c still resolves from its dir
    now.filter(col("k") === "c").select(col("batch_id").cast("long"))
      .head().getLong(0) shouldBe 1L
    // the pinned pre-merge reader still sees the old values
    Snapshot.readAt(spark, path, v1).filter(col("k") === "b")
      .select("n").head().getLong(0) shouldBe 2L
    // the replaced batch 0 dir is vacuum's to sweep
    Snapshot.vacuum(spark, path) shouldBe Seq(0L)

    // pure-insert merge (no key matches): no batch rewritten
    val ins = Snapshot.merge(spark, path, Seq(("e", 5L)).toDF("k", "n"), Seq("k"))
    ins.matched shouldBe 0L
    ins.rewrittenBatches shouldBe Seq.empty
    Snapshot.read(spark, path).count() shouldBe 5L
  }

  test("merge rejects duplicate update keys and schema drift loudly; empty updates are a no-op", Slow) {
    val path = TempDirs.path(s"snapshot-spec/mergebad-${java.util.UUID.randomUUID()}")
    Seq(("a", 1L)).toDF("k", "n").write.parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    intercept[IllegalArgumentException] {
      Snapshot.merge(spark, path,
        Seq(("a", 1L), ("a", 2L)).toDF("k", "n"), Seq("k"))
    }.getMessage should include("duplicate keys")
    intercept[IllegalArgumentException] {
      Snapshot.merge(spark, path,
        Seq(("a", 1L, "x")).toDF("k", "n", "extra"), Seq("k"))
    }.getMessage should include("schema mismatch")
    val before = Snapshot.latestVersion(spark, path).get
    Snapshot.merge(spark, path,
      Seq.empty[(String, Long)].toDF("k", "n"), Seq("k")).version shouldBe None
    Snapshot.latestVersion(spark, path).get shouldBe before
  }

  test("deleteWhere rewrites only matching batches, keeps NULL-predicate rows, no-ops on zero matches", Slow) {
    val path = TempDirs.path(s"snapshot-spec/del-${java.util.UUID.randomUUID()}")
    def batch(id: Long, rows: (String, Option[Long])*): Unit =
      Snapshot.stagedAppend(spark, path, id) {
        rows.toDF("k", "n").write.mode("overwrite")
          .parquet(s"$path/batch_id=$id")
      }
    batch(0L, ("a", Some(1L)), ("b", Some(100L)), ("x", None))
    batch(1L, ("c", Some(2L)))
    Snapshot.enable(spark, path)

    val stats = Snapshot.deleteWhere(spark, path, col("n") >= 100L)
    stats.matched shouldBe 1L
    stats.rewrittenBatches shouldBe Seq(0L)
    // NULL n evaluates NULL → kept (SQL WHERE semantics)
    Snapshot.read(spark, path).select("k").collect().map(_.getString(0))
      .sorted shouldBe Array("a", "c", "x")
    // untouched batch survives in place
    Snapshot.read(spark, path).filter(col("k") === "c")
      .select(col("batch_id").cast("long")).head().getLong(0) shouldBe 1L

    Snapshot.deleteWhere(spark, path, col("n") >= 9999L).version shouldBe None
  }

  test("deleteMatching: keyed COW erase — anti-join fold; zone maps prune " +
    "the find-affected scan; full-batch erase is a manifest-only removal; " +
    "NULL keys and no-matches erase nothing") {
    val path = TempDirs.path(s"snapshot-spec/delkeys-${java.util.UUID.randomUUID()}")
    def batch(id: Long, rows: (Long, String)*): Unit =
      Snapshot.stagedAppend(spark, path, id) {
        rows.toDF("n", "k").write.mode("overwrite")
          .parquet(s"$path/batch_id=$id")
      }
    Seq((1L, "a"), (10L, "b")).toDF("n", "k").write
      .mode("overwrite").parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path) // batch 0: no stats (never prunable)
    batch(1L, (100L, "c"), (200L, "d"))
    batch(2L, (1000L, "e"), (2000L, "f"))
    // no-match erase: zero work, no version published
    val none = Snapshot.deleteMatching(spark, path,
      Seq(777L).toDF("n"), Seq("n"))
    (none.matched, none.version) shouldBe ((0L, None))
    // NULL keys match nothing (SQL IN semantics): only 100 goes
    val withNull = Seq(Some(100L), None).toDF("n")
    // decisive prune pin first: physically delete batch 2's files — if
    // the keys' [100,100] bounds failed to exclude batch 2 from even
    // the find-affected scan, the erase would crash on missing files
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, "batch_id=2"), true)
    val st = Snapshot.deleteMatching(spark, path, withNull, Seq("n"))
    st.matched shouldBe 1L
    st.rewrittenBatches shouldBe Seq(1L)

    // full-batch erase on a fresh table: every row of batch 1 matches →
    // pure manifest removal, no fold directory appears
    val p2 = TempDirs.path(s"snapshot-spec/delkeys2-${java.util.UUID.randomUUID()}")
    Seq((1L, "a"), (2L, "b")).toDF("n", "k").write
      .mode("overwrite").parquet(s"$p2/batch_id=0")
    Snapshot.enable(spark, p2)
    Snapshot.stagedAppend(spark, p2, 1L) {
      Seq((5L, "e"), (6L, "f")).toDF("n", "k").write.mode("overwrite")
        .parquet(s"$p2/batch_id=1")
    }
    val full = Snapshot.deleteMatching(spark, p2,
      Seq(5L, 6L, 6L).toDF("n"), Seq("n")) // dup key counts once per row
    full.matched shouldBe 2L
    Snapshot.liveBatches(spark, p2) shouldBe Seq(0L) // no fold id
    Snapshot.read(spark, p2).select("n").collect().map(_.getLong(0))
      .sorted shouldBe Array(1L, 2L)
  }

  test("zone maps: readRange and merge prune non-overlapping batches by metadata alone") {
    val path = TempDirs.path(s"snapshot-spec/zone-${java.util.UUID.randomUUID()}")
    def batch(id: Long, rows: (Long, String)*): Unit =
      Snapshot.stagedAppend(spark, path, id) {
        rows.toDF("n", "k").write.mode("overwrite")
          .parquet(s"$path/batch_id=$id")
      }
    Seq((1L, "a"), (10L, "b")).toDF("n", "k").write
      .mode("overwrite").parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    batch(1L, (100L, "c"), (200L, "d"))
    batch(2L, (1000L, "e"), (2000L, "f"))
    // enable captured no stats for batch 0 (pre-stats listing); appends
    // did — batch 0 must therefore NEVER be pruned (blind ≠ skippable)
    val m = Snapshot.latest(spark, path).get
    m.stats.keySet shouldBe Set(1L, 2L)
    m.stats(1L)("n") shouldBe (("100", "200"))

    val r = Snapshot.readRange(spark, path, "n", BigDecimal(120), BigDecimal(150))
    r.inputFiles.foreach { f =>
      f should not include "batch_id=2" // pruned by stats
    }
    r.collect() shouldBe empty // no rows fall inside [120,150]
    Snapshot.readRange(spark, path, "n", BigDecimal(100), BigDecimal(1000))
      .collect().map(_.getLong(0)).sorted shouldBe Array(100L, 200L, 1000L)

    // the decisive pin: physically delete batch 2's files, then run a
    // merge whose update keys live entirely in batch 1's range — if
    // pruning failed to exclude batch 2 from even the keys-only scan,
    // the merge would crash on the missing files
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, "batch_id=2"), true)
    val stats = Snapshot.merge(spark, path,
      Seq((200L, "D2")).toDF("n", "k"), Seq("n"))
    stats.matched shouldBe 1L
    // batch 0 (no stats — never prunable) was scanned but unaffected;
    // only the overlapping batch 1 was rewritten
    stats.rewrittenBatches shouldBe Seq(1L)
  }

  test("compactSmall folds only sub-threshold batches; big batches and their stats survive untouched", Slow) {
    val path = TempDirs.path(s"snapshot-spec/tiered-${java.util.UUID.randomUUID()}")
    def batch(id: Long, n: Int): Unit = Snapshot.stagedAppend(spark, path, id) {
      (0 until n).map(i => (id * 1000 + i, "x" * 200)).toDF("n", "pad")
        .write.mode("overwrite").parquet(s"$path/batch_id=$id")
    }
    Seq((1L, "seed")).toDF("n", "pad").write.mode("overwrite")
      .parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    batch(1L, 5000) // big
    batch(2L, 3)    // small
    batch(3L, 2)    // small
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bigSize = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(path, "batch_id=1")).getLength
    val before = Snapshot.read(spark, path).select("n", "pad")
      .orderBy("n").collect()

    val folded = Snapshot.compactSmall(spark, path, smallBytes = bigSize - 1)
    folded should contain theSameElementsAs Seq(0L, 2L, 3L)
    val m = Snapshot.latest(spark, path).get
    m.batches should contain(1L) // big batch kept in place, zero IO
    m.stats(1L)("n") shouldBe (("1000", "5999")) // carried verbatim
    // the fold got fresh stats spanning the folded rows
    val foldId = m.batches.filterNot(Seq(1L).contains).head
    BigDecimal(m.stats(foldId)("n")._1) shouldBe BigDecimal(1)
    // content preserved exactly (batch_id moves for folded rows, by design)
    Snapshot.read(spark, path).select("n", "pad")
      .orderBy("n").collect() shouldBe before
    // a single small batch left → nothing to gain, nothing published
    Snapshot.compactSmall(spark, path, smallBytes = 1L) shouldBe Seq.empty
  }

  test("optimistic commit: an append racing retention/compaction rebases and BOTH edits hold", Slow) {
    val path = TempDirs.path(s"snapshot-spec/occ-${java.util.UUID.randomUUID()}")
    def write(id: Long): Unit =
      Seq((s"r$id", id)).toDF("k", "n").write.mode("overwrite")
        .parquet(s"$path/batch_id=$id")
    write(0L)
    Snapshot.enable(spark, path)
    Snapshot.stagedAppend(spark, path, 1L) { write(1L) } shouldBe true
    // interleave: stagedAppend reads the manifest and stages its dir,
    // and BEFORE its publish (inside the write closure) a maintenance
    // job publishes retention. The append's publish loses the version
    // race, rebases, and commits — the append is not lost AND the
    // retention holds.
    Snapshot.stagedAppend(spark, path, 2L) {
      write(2L)
      Snapshot.retainFrom(spark, path, keepFrom = 1L) shouldBe Seq(0L)
    } shouldBe true
    Snapshot.latest(spark, path).get.batches shouldBe Seq(1L, 2L)
    // same interleave against SIZE-TIERED COMPACTION: the fold commits
    // first, the append rebases over it — fold and append both live
    Snapshot.stagedAppend(spark, path, 3L) {
      write(3L)
      Snapshot.compactSmall(spark, path, smallBytes = Long.MaxValue)
        .toSet shouldBe Set(1L, 2L)
    } shouldBe true
    Snapshot.latest(spark, path).get.batches.toSet shouldBe Set(-2L, 3L)
    Snapshot.read(spark, path).select("k").collect().map(_.getString(0))
      .sorted shouldBe Array("r1", "r2", "r3")

    // EXACTLY-ONCE survives the race: a commit whose added id was
    // concurrently committed by another writer is a no-op (None)
    val base1 = Snapshot.latest(spark, path).get
    Snapshot.stagedAppend(spark, path, 7L) { write(7L) } shouldBe true
    Snapshot.commitEdit(spark, path, base1, add = Seq(7L)) shouldBe None

    // NON-COMMUTING: a fold whose input batch was concurrently retired
    // must abort loudly — publishing it would resurrect retired rows
    val base2 = Snapshot.latest(spark, path).get // live: -2, 3, 7
    Snapshot.retainFrom(spark, path, keepFrom = 4L) shouldBe Seq(3L)
    intercept[Snapshot.CommitConflictException] {
      Snapshot.commitEdit(spark, path, base2,
        add = Seq(-9L), remove = Seq(3L))
    }.getMessage should include("no longer live")

    // NON-COMMUTING: a whole-table predicate edit (merge/delete shape)
    // refuses to rebase over a concurrent append it never saw
    val base3 = Snapshot.latest(spark, path).get
    Snapshot.stagedAppend(spark, path, 8L) { write(8L) } shouldBe true
    intercept[Snapshot.CommitConflictException] {
      Snapshot.commitEdit(spark, path, base3, add = Seq(-10L),
        allowConcurrentAdds = false)
    }.getMessage should include("appended concurrently")
  }

  test("deleteRange prunes the find-affected scan by zone maps alone", Slow) {
    val path = TempDirs.path(s"snapshot-spec/delrange-${java.util.UUID.randomUUID()}")
    def batch(id: Long, rows: (Long, String)*): Unit =
      Snapshot.stagedAppend(spark, path, id) {
        rows.toDF("n", "k").write.mode("overwrite")
          .parquet(s"$path/batch_id=$id")
      }
    Seq((1L, "a"), (10L, "b")).toDF("n", "k").write
      .mode("overwrite").parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path) // batch 0: no stats, never prunable
    batch(1L, (100L, "c"), (200L, "d"))
    batch(2L, (1000L, "e"), (2000L, "f"))
    // the physical pin: delete batch 2's FILES; a deleteRange whose
    // range overlaps only batch 1 must succeed anyway — if pruning
    // failed to exclude batch 2 from the find-affected scan, the job
    // would crash on the missing files
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, "batch_id=2"), true)
    val stats = Snapshot.deleteRange(spark, path, "n",
      BigDecimal(150), BigDecimal(250))
    stats.matched shouldBe 1L // only n=200
    stats.rewrittenBatches shouldBe Seq(1L) // batch 0 scanned, unaffected
    // verify through the pruned reader (a full read would plan over the
    // deliberately-deleted batch 2 dirs)
    Snapshot.readRange(spark, path, "n", BigDecimal(0), BigDecimal(500))
      .select("n").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 10L, 100L)
    // a range matching nothing publishes nothing
    Snapshot.deleteRange(spark, path, "n",
      BigDecimal(300), BigDecimal(400)).version shouldBe None
    // string columns refuse loudly (no stats, no collation-safe bounds)
    intercept[IllegalArgumentException] {
      Snapshot.deleteRange(spark, path, "k", BigDecimal(0), BigDecimal(1))
    }.getMessage should include("numeric/timestamp")
  }

  test("versioned merge is commutative: replaying an OLD update after a newer one never regresses", Slow) {
    val path = TempDirs.path(s"snapshot-spec/vmerge-${java.util.UUID.randomUUID()}")
    Seq(("a", 1L, 10L), ("b", 2L, 10L)).toDF("k", "n", "ver")
      .write.mode("overwrite").parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    def state(): Seq[(String, Long, Long)] =
      Snapshot.read(spark, path).select("k", "n", "ver").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    // newer update applies
    Snapshot.merge(spark, path, Seq(("a", 100L, 20L)).toDF("k", "n", "ver"),
      Seq("k"), versionCol = Some("ver"))
    state() shouldBe Seq(("a", 100L, 20L), ("b", 2L, 10L))
    // REPLAY of an older update: per-row no-op, no regression
    Snapshot.merge(spark, path, Seq(("a", 50L, 15L)).toDF("k", "n", "ver"),
      Seq("k"), versionCol = Some("ver"))
    state() shouldBe Seq(("a", 100L, 20L), ("b", 2L, 10L))
    // version tie: the UPDATE wins deterministically
    Snapshot.merge(spark, path, Seq(("b", 999L, 10L)).toDF("k", "n", "ver"),
      Seq("k"), versionCol = Some("ver"))
    state() shouldBe Seq(("a", 100L, 20L), ("b", 999L, 10L))
    // inserts still insert under version mode
    Snapshot.merge(spark, path, Seq(("c", 3L, 5L)).toDF("k", "n", "ver"),
      Seq("k"), versionCol = Some("ver"))
    state() shouldBe Seq(("a", 100L, 20L), ("b", 999L, 10L), ("c", 3L, 5L))
    // ORDER-FREE convergence: applying {v=30} then {v=25} equals
    // applying {v=25} then {v=30}
    val other = TempDirs.path(s"snapshot-spec/vmerge2-${java.util.UUID.randomUUID()}")
    Seq(("a", 1L, 10L)).toDF("k", "n", "ver")
      .write.mode("overwrite").parquet(s"$other/batch_id=0")
    Snapshot.enable(spark, other)
    val u25 = Seq(("a", 25L, 25L)).toDF("k", "n", "ver")
    val u30 = Seq(("a", 30L, 30L)).toDF("k", "n", "ver")
    Snapshot.merge(spark, other, u30, Seq("k"), versionCol = Some("ver"))
    Snapshot.merge(spark, other, u25, Seq("k"), versionCol = Some("ver"))
    Snapshot.read(spark, other).select("n").head().getLong(0) shouldBe 30L
  }

  test("diffVersions across a schema-evolution boundary widens both sides with null-fill", Slow) {
    val path = TempDirs.path(s"snapshot-spec/diffevo-${java.util.UUID.randomUUID()}")
    Seq(("a", 1L)).toDF("k", "n").write.mode("overwrite")
      .parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    val v1 = Snapshot.latestVersion(spark, path).get
    // batch 1 brings a new `lang` column — the evolution boundary
    Snapshot.stagedAppend(spark, path, 1L) {
      Seq(("b", 2L, "en")).toDF("k", "n", "lang").write
        .mode("overwrite").parquet(s"$path/batch_id=1")
    }
    val v2 = Snapshot.latestVersion(spark, path).get
    val d = Snapshot.diffVersions(spark, path, v1, v2)
    d.columns.toSeq shouldBe Seq("_change_type", "k", "n", "lang")
    d.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      Option(r.getString(3)))).toSeq shouldBe
      Seq(("insert", "b", 2L, Some("en")))
    // reverse direction: the old side's rows null-fill the new column
    Snapshot.diffVersions(spark, path, v2, v1)
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(3)))).toSeq shouldBe
      Seq(("delete", "b", Some("en")))
    // retire the old batch and diff ACROSS the boundary from v1: the
    // deleted row reports its `lang` as null, exactly as readAt shows it
    Snapshot.retainFrom(spark, path, keepFrom = 1L)
    val v3 = Snapshot.latestVersion(spark, path).get
    Snapshot.diffVersions(spark, path, v1, v3)
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(3)))).toSeq.sorted shouldBe
      Seq(("delete", "a", None), ("insert", "b", Some("en")))
  }

  test("retention racing a FOLD aborts; racing a RETIREMENT reports only its own drops", Slow) {
    val path = TempDirs.path(s"snapshot-spec/foldrace-${java.util.UUID.randomUUID()}")
    def write(id: Long): Unit =
      Seq((s"r$id", id)).toDF("k", "n").write.mode("overwrite")
        .parquet(s"$path/batch_id=$id")
    write(0L)
    Snapshot.enable(spark, path)
    Snapshot.stagedAppend(spark, path, 1L) { write(1L) } shouldBe true
    Snapshot.stagedAppend(spark, path, 2L) { write(2L) } shouldBe true
    // a retention edit based on a manifest read BEFORE a fold commits:
    val stale = Snapshot.latest(spark, path).get // live: 0, 1, 2
    Snapshot.compactSmall(spark, path, smallBytes = Long.MaxValue)
      .toSet shouldBe Set(0L, 1L, 2L)
    // the fold output holds every row of 0/1/2 — claiming to have
    // dropped 0 now would be a silent retention failure (TTL/GDPR),
    // so the rebase must abort loudly, not filter silently
    intercept[Snapshot.CommitConflictException] {
      Snapshot.commitEdit(spark, path, stale, remove = Seq(0L),
        tolerateConcurrentRemoves = true)
    }.getMessage should include("FOLDED")
    // a TRUE retirement race still commutes — and the commit reports
    // only the ids THIS edit dropped, not everything it asked for
    Snapshot.stagedAppend(spark, path, 3L) { write(3L) } shouldBe true
    Snapshot.stagedAppend(spark, path, 4L) { write(4L) } shouldBe true
    val stale2 = Snapshot.latest(spark, path).get // live: fold, 3, 4
    Snapshot.retainFrom(spark, path, keepFrom = 4L) shouldBe Seq(3L)
    val c = Snapshot.commitEdit(spark, path, stale2, remove = Seq(3L, 4L),
      tolerateConcurrentRemoves = true)
    c.get.removed shouldBe Seq(4L)
    Snapshot.latest(spark, path).get.batches.forall(_ < 0) shouldBe true
    // an add-less edit whose removes were ALL concurrently retired has
    // nothing left to publish
    Snapshot.commitEdit(spark, path, stale2, remove = Seq(3L),
      tolerateConcurrentRemoves = true) shouldBe None
  }

  test("concurrent folds from the same base reserve DIFFERENT output ids", Slow) {
    val path = TempDirs.path(s"snapshot-spec/foldid-${java.util.UUID.randomUUID()}")
    Seq(("a", 1L)).toDF("k", "n").write.mode("overwrite")
      .parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    Snapshot.stagedAppend(spark, path, 1L) {
      Seq(("b", 2L)).toDF("k", "n").write.mode("overwrite")
        .parquet(s"$path/batch_id=1")
    }
    val m = Snapshot.latest(spark, path).get
    // two fold jobs planning from the SAME manifest (the disjoint-input
    // concurrent-fold race): the exclusive reservation hands each a
    // different directory, so neither can clobber the other's output
    val id1 = Snapshot.freshFoldId(spark, path, m)
    val id2 = Snapshot.freshFoldId(spark, path, m)
    id1 should be < -1L
    id2 should be < id1
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(path,
      s"_manifests/fold-reserve-${-id1}")) shouldBe true
    fs.exists(new org.apache.hadoop.fs.Path(path,
      s"_manifests/fold-reserve-${-id2}")) shouldBe true
    // a real fold AFTER the reservations skips both claimed ids
    Snapshot.compactSmall(spark, path, smallBytes = Long.MaxValue)
      .toSet shouldBe Set(0L, 1L)
    val foldBatch = Snapshot.latest(spark, path).get.batches.head
    foldBatch should be < id2
    // reservation files never read as manifest versions
    Snapshot.listVersions(spark, path).size should be >= 3
    Snapshot.read(spark, path).count() shouldBe 2L
  }

  test("deleteRange fractional bounds round INWARD, agreeing with zone maps", Slow) {
    val path = TempDirs.path(s"snapshot-spec/delfrac-${java.util.UUID.randomUUID()}")
    Seq((120L, "x")).toDF("n", "k").write.mode("overwrite")
      .parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path) // batch 0: enable-seeded, NO stats
    Snapshot.stagedAppend(spark, path, 1L) { // batch 1: stats [120, 300]
      Seq((120L, "y"), (300L, "z")).toDF("n", "k").write.mode("overwrite")
        .parquet(s"$path/batch_id=1")
    }
    // [120.5, 500.7] on a bigint column means the integers [121, 500]:
    // n=120 must survive in BOTH batches — the one the zone maps see
    // and the one they don't — and n=300 goes
    val st = Snapshot.deleteRange(spark, path, "n",
      BigDecimal("120.5"), BigDecimal("500.7"))
    st.matched shouldBe 1L
    Snapshot.read(spark, path).select("n").collect().map(_.getLong(0))
      .sorted shouldBe Array(120L, 120L)
    // a range whose inward rounding empties it deletes nothing
    Snapshot.deleteRange(spark, path, "n",
      BigDecimal("120.1"), BigDecimal("120.9")).version shouldBe None
    // readRange agrees with the same normalization
    Snapshot.readRange(spark, path, "n",
      BigDecimal("119.5"), BigDecimal("120.2")).count() shouldBe 2L
    Snapshot.readRange(spark, path, "n",
      BigDecimal("120.1"), BigDecimal("120.9")).count() shouldBe 0L
  }

  test("versioned merge tolerates a data column named like its scratch columns", Slow) {
    val path = TempDirs.path(s"snapshot-spec/scratch-${java.util.UUID.randomUUID()}")
    Seq(("a", 1L, 10L, "keep")).toDF("k", "n", "ver", "__src")
      .write.mode("overwrite").parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    def state(): Seq[(String, Long, Long, String)] =
      Snapshot.read(spark, path).select("k", "n", "ver", "__src").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSeq.sorted
    // the REAL `__src` column must survive verbatim — not be replaced
    // by the merge's internal source flag
    Snapshot.merge(spark, path,
      Seq(("a", 100L, 20L, "upd"), ("b", 2L, 5L, "new"))
        .toDF("k", "n", "ver", "__src"),
      Seq("k"), versionCol = Some("ver"))
    state() shouldBe Seq(("a", 100L, 20L, "upd"), ("b", 2L, 5L, "new"))
    // replay of an older version: no regression, `__src` untouched
    Snapshot.merge(spark, path,
      Seq(("a", 50L, 15L, "old")).toDF("k", "n", "ver", "__src"),
      Seq("k"), versionCol = Some("ver"))
    state() shouldBe Seq(("a", 100L, 20L, "upd"), ("b", 2L, 5L, "new"))
  }

  test("build resets an enabled table and republishes a fresh manifest") {
    val path = plantSketch("rebuild", days = 3)
    Snapshot.enable(spark, path)
    Retention.dropBatchesBefore(spark, path, keepFrom = 1L)
    SketchTable.build((0L until 30L).map(u => ("all", u)).toDF("key", "user_id"),
      "key", "user_id", path)
    Snapshot.isEnabled(spark, path) shouldBe true
    Snapshot.liveBatches(spark, path) shouldBe Seq(-1L)
    dirIds(path) shouldBe Seq(-1L)
    math.abs(est(path) - 30L) should be <= 3L
  }

  test("vacuum racing a staged append leaves the staged dir; the append then commits", Slow) {
    val path = TempDirs.path(s"snapshot-spec/vacrace-${java.util.UUID.randomUUID()}")
    def rows(id: Long) = Seq((s"r$id", id)).toDF("k", "n")
    rows(0L).write.mode("overwrite").parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    Retention.dropBatchesBefore(spark, path, keepFrom = 1L) // 0 retired, dir stays
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // THE RACE (r14 verdict #1): maintenance vacuums while an append is
    // between stage and publish — the write closure runs exactly in
    // that window, so calling vacuum inside it IS the interleaving
    var sweptDuringStage: Seq[Long] = null
    Snapshot.stagedAppend(spark, path, 5L) {
      rows(5L).write.mode("overwrite").parquet(s"$path/batch_id=5")
      sweptDuringStage = Snapshot.vacuum(spark, path)
    } shouldBe true
    // the concurrent vacuum swept the RETIRED dir but honored the
    // intent marker on the staged-not-yet-committed one
    sweptDuringStage shouldBe Seq(0L)
    Snapshot.liveBatches(spark, path) shouldBe Seq(5L)
    Snapshot.read(spark, path).select("k").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("r5")
    // the marker was released at publish: nothing protected remains
    fs.exists(new org.apache.hadoop.fs.Path(path,
      "_manifests/append-intent-5")) shouldBe false
    Snapshot.vacuum(spark, path) shouldBe Seq.empty
  }

  test("vacuum: crashed protocol writers are protected for the grace window, then swept", Slow) {
    val path = TempDirs.path(s"snapshot-spec/vacgrace-${java.util.UUID.randomUUID()}")
    Seq(("a", 1L)).toDF("k", "n").write.mode("overwrite")
      .parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a HARD-crashed append: dir staged, intent marker still held
    // (the in-JVM abort path releases the marker; only a crash leaves it)
    Seq(("x", 9L)).toDF("k", "n").write.mode("overwrite")
      .parquet(s"$path/batch_id=9")
    fs.create(new org.apache.hadoop.fs.Path(path,
      "_manifests/append-intent-9"), true).close()
    // a crashed FOLD: id reserved, output dir written, commit never ran
    val foldId = Snapshot.freshFoldId(spark, path, Snapshot.latest(spark, path).get)
    Seq(("y", 2L)).toDF("k", "n").write.mode("overwrite")
      .parquet(s"$path/batch_id=$foldId")
    // within grace both are protected — the writer MIGHT still publish
    Snapshot.vacuum(spark, path) shouldBe Seq.empty
    // past grace both are garbage: swept, and the crashed append's
    // expired marker goes with its dir (the fold-reserve marker is
    // permanent — the id must never be reusable)
    Snapshot.vacuum(spark, path, graceMs = 0L).toSet shouldBe Set(foldId, 9L)
    fs.exists(new org.apache.hadoop.fs.Path(s"$path/batch_id=9")) shouldBe false
    fs.exists(new org.apache.hadoop.fs.Path(path,
      "_manifests/append-intent-9")) shouldBe false
    fs.exists(new org.apache.hadoop.fs.Path(path,
      s"_manifests/fold-reserve-${-foldId}")) shouldBe true
    // an UNMARKED orphan (pre-protocol write) still sweeps immediately
    Seq(("z", 3L)).toDF("k", "n").write.mode("overwrite")
      .parquet(s"$path/batch_id=7")
    Snapshot.vacuum(spark, path) shouldBe Seq(7L)
  }

  test("root manifest: vacuumAllTables honors a staged multi-table append's intent marker", Slow) {
    val root = TempDirs.path(s"snapshot-spec/rootvac-${java.util.UUID.randomUUID()}")
    def write(sub: String, b: Long): Unit =
      Seq((b, sub)).toDF("b", "s").write.mode("overwrite")
        .parquet(s"$root/$sub/batch_id=$b")
    write("t1", 0L); write("t2", 0L)
    Snapshot.enableSub(spark, root, "t1")
    Retention.dropBatchesBeforeAllTables(spark, root, keepFrom = 1L)
    // vacuum races the staged append of the WHOLE triple: the one root
    // marker must protect every sub-table's staged dir
    var sweptDuringStage: Map[String, Seq[Long]] = null
    Snapshot.stagedAppend(spark, root, 1L) {
      write("t1", 1L); write("t2", 1L)
      sweptDuringStage = Snapshot.vacuumAllTables(spark, root, Seq("t1", "t2"))
    } shouldBe true
    sweptDuringStage shouldBe Map("t1" -> Seq(0L), "t2" -> Seq(0L))
    Snapshot.readSub(spark, root, "t1").count() shouldBe 1L
    Snapshot.readSub(spark, root, "t2").count() shouldBe 1L
    // post-publish: nothing protected, nothing left to sweep
    Snapshot.vacuumAllTables(spark, root, Seq("t1", "t2")) shouldBe Map.empty
  }

  test("root manifest: retention racing a FOLD aborts (multi-table twin)", Slow) {
    // the flat-table fold-race abort (above) through the ROOT-manifest
    // path the index family (ret4, vacuumAllTables) shares: a stale
    // retention edit must see its target was FOLDED — its rows live on
    // inside the fold output across EVERY sub-table — and abort loudly
    // rather than report a TTL/GDPR drop that didn't happen
    val root = TempDirs.path(s"snapshot-spec/rootfold-${java.util.UUID.randomUUID()}")
    def write(sub: String, b: Long): Unit =
      Seq((b, sub)).toDF("b", "s").write.mode("overwrite")
        .parquet(s"$root/$sub/batch_id=$b")
    write("t1", 0L); write("t2", 0L)
    Snapshot.enableSub(spark, root, "t1")
    Snapshot.stagedAppend(spark, root, 1L) {
      write("t1", 1L); write("t2", 1L)
    } shouldBe true
    val stale = Snapshot.latest(spark, root).get // live: 0, 1
    // a root-level fold: both sub-tables' batches 0+1 rewritten into
    // one fresh reserved id, committed as a fold edit on the root
    val foldId = Snapshot.freshFoldId(spark, root, stale)
    write("t1", foldId); write("t2", foldId)
    Snapshot.commitEdit(spark, root, stale, add = Seq(foldId),
      remove = Seq(0L, 1L), removeIsFold = true).isDefined shouldBe true
    intercept[Snapshot.CommitConflictException] {
      Snapshot.commitEdit(spark, root, stale, remove = Seq(0L),
        tolerateConcurrentRemoves = true)
    }.getMessage should include("FOLDED")
    // a true retirement race on the root still commutes
    Snapshot.stagedAppend(spark, root, 2L) { write("t1", 2L); write("t2", 2L) }
    val stale2 = Snapshot.latest(spark, root).get
    Snapshot.commitEdit(spark, root, stale2, remove = Seq(2L),
      tolerateConcurrentRemoves = true).get.removed shouldBe Seq(2L)
  }

  test("backfillStats: blind enable-listed batches gain zone stats in one " +
    "manifest edit; idempotent; unstatable batches stay conservative") {
    import spark.implicits._
    val path = graft.TempDirs.path(
      s"snapshot/backfill-${java.util.UUID.randomUUID()}")
    Seq((100L, "x"), (200L, "y")).toDF("n", "k")
      .write.parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path) // batch 0: enable-listed, stat-blind
    Snapshot.stagedAppend(spark, path, 1L) {
      Seq((1L, "a")).toDF("n", "k").write.mode("overwrite")
        .parquet(s"$path/batch_id=1")
    }
    Snapshot.latest(spark, path).get.stats.get(0L) shouldBe None
    val v0 = Snapshot.latestVersion(spark, path).get
    Snapshot.backfillStats(spark, path) shouldBe Seq(0L)
    // exactly one publish; batch 1's protocol stats carried verbatim
    Snapshot.latestVersion(spark, path).get shouldBe v0 + 1
    val st = Snapshot.latest(spark, path).get.stats
    st(0L)("n") shouldBe ("100", "200")
    st(1L)("n") shouldBe ("1", "1")
    // the formerly-blind batch now PRUNES
    Snapshot.readRange(spark, path, "n", BigDecimal(1), BigDecimal(10))
      .inputFiles.map(_.split("batch_id=")(1).split("/")(0))
      .distinct.toSeq shouldBe Seq("1")
    // idempotent: nothing blind left → no publish
    Snapshot.backfillStats(spark, path) shouldBe Seq.empty
    Snapshot.latestVersion(spark, path).get shouldBe v0 + 1
  }

  test("readAsOf resolves by writer-clock commit stamp: between-commit " +
    "timestamps pin the earlier version; before-first fails loudly; " +
    "pre-stamp manifests fall back to file mtime") {
    import spark.implicits._
    val path = graft.TempDirs.path(
      s"snapshot/asof-${java.util.UUID.randomUUID()}")
    Seq((1L, "a")).toDF("n", "k").write.parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path) // v1: batch 0
    val t1 = Snapshot.commitTimeMs(spark, path, 1L)
    Snapshot.stagedAppend(spark, path, 1L) {
      Seq((2L, "b")).toDF("n", "k").write.mode("overwrite")
        .parquet(s"$path/batch_id=1")
    } // v2: batches 0, 1
    val t2 = Snapshot.commitTimeMs(spark, path, 2L)
    // STRICT: publish clamps stamp = max(now, predecessor + 1), so two
    // commits in the same millisecond stay separable (VERDICT r17 #3)
    t2 should be > t1
    // at exactly t1 (and any instant before t2): version 1's view
    Snapshot.versionAsOf(spark, path, t1) shouldBe Some(1L)
    Snapshot.readAsOf(spark, path, t1)
      .select("n").collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    // at/after the last commit: the live view
    Snapshot.versionAsOf(spark, path, t2 + 60000) shouldBe Some(2L)
    Snapshot.readAsOf(spark, path, t2 + 60000)
      .select("n").collect().map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 2L)
    // before the first commit: there was no table then — loud, never
    // a silent current-version read
    an[IllegalStateException] should be thrownBy
      Snapshot.readAsOf(spark, path, t1 - 60000)
    // legacy manifest without the stamp field: mtime fallback — strip
    // committedAtMs from v1's JSON in place and resolve again
    val f = java.nio.file.Paths.get(
      path, Snapshot.ManifestDir, "v%012d.json".format(1L))
    val legacy = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      .replaceFirst("\"committedAtMs\":\\d+,", "")
    java.nio.file.Files.write(f, legacy.getBytes("UTF-8"))
    // the out-of-band rewrite invalidates LocalFileSystem's checksum
    // sidecar — drop it (real legacy files carry a matching crc)
    java.nio.file.Files.deleteIfExists(
      f.getParent.resolve(s".${f.getFileName}.crc"))
    Snapshot.readManifest(spark, path, 1L).committedAtMs shouldBe None
    // mtime is "now" (just rewritten) — far after t1, so v1 resolves
    // for a NOW-ish timestamp; the ordering contract degrades exactly
    // as documented for legacy files, it never throws
    Snapshot.commitTimeMs(spark, path, 1L) should be > t2
  }

  test("commit stamps are strictly monotone per table: back-to-back " +
    "commits never share a millisecond, and a backwards-skewed writer " +
    "clock resolves in version order (the Delta in-commit-timestamp " +
    "clamp, VERDICT r17 #3)") {
    import spark.implicits._
    val path = graft.TempDirs.path(
      s"snapshot/monotone-${java.util.UUID.randomUUID()}")
    Seq((1L, "a")).toDF("n", "k").write.parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path) // v1
    // PLANT a forward-skewed writer at v1: stamp one hour in the
    // future. The next publish's own clock reads "backwards" relative
    // to it — the clamp must still produce a strictly later stamp.
    val f = java.nio.file.Paths.get(
      path, Snapshot.ManifestDir, "v%012d.json".format(1L))
    val skewed = System.currentTimeMillis() + 3600000L
    val json = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      .replaceFirst("\"committedAtMs\":\\d+,", s""""committedAtMs":$skewed,""")
    java.nio.file.Files.write(f, json.getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(
      f.getParent.resolve(s".${f.getFileName}.crc"))
    // three rapid commits after the skewed one
    (1L to 3L).foreach { b =>
      Snapshot.stagedAppend(spark, path, b) {
        Seq((b + 1, "x")).toDF("n", "k").write.mode("overwrite")
          .parquet(s"$path/batch_id=$b")
      }
    }
    val stamps = (1L to 4L).map(Snapshot.commitTimeMs(spark, path, _))
    // strictly increasing across the whole history, skew included
    stamps.sliding(2).foreach { case Seq(a, b) => b should be > a }
    // and version order == stamp order for as-of resolution: the stamp
    // of each version pins exactly that version
    (1L to 4L).foreach { v =>
      Snapshot.versionAsOf(spark, path,
        Snapshot.commitTimeMs(spark, path, v)) shouldBe Some(v)
    }
  }

  test("readTopK: boundary ties survive, null rows never certify a skip") {
    val path = TempDirs.path("snapshot-spec/topk")
    Seq((1L, Some(5L)), (2L, Some(5L))).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    // batch 1: max 5 TIES batch 0's values; its copies are legitimate
    // top-k candidates, so strict-inequality must keep it readable
    Snapshot.stagedAppend(spark, path, 1L) {
      Seq((3L, Some(5L)), (4L, Some(4L))).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$path/batch_id=1")
    }
    // batch 2: TWO non-null values (10, 9) padded with nulls — its
    // row count is 5 but only 2 rows can outrank anything; a k=3 read
    // must therefore still read the tied 5s below
    Snapshot.stagedAppend(spark, path, 2L) {
      Seq((5L, Some(10L)), (6L, Some(9L)), (7L, None), (8L, None),
        (9L, None)).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$path/batch_id=2")
    }
    Snapshot.backfillStats(spark, path)
    val top3 = Snapshot.readTopK(spark, path, "v", 3)
      .select(col("v")).as[Long].collect()
    top3 shouldBe Array(10L, 9L, 5L)
    // k=2 IS certified by batch 2's two non-null rows: both other
    // batches (max 5 < 9) prune physically
    val top2 = Snapshot.readTopK(spark, path, "v", 2)
    top2.inputFiles.foreach(f => f should include("batch_id=2"))
    top2.select(col("v")).as[Long].collect() shouldBe Array(10L, 9L)
    // ascending: bottom-2 = the 4 and one of the 5s; the null batch
    // can never win an ascending read either (nulls sort last)
    Snapshot.readTopK(spark, path, "v", 2, ascending = true)
      .select(col("v")).as[Long].collect() shouldBe Array(4L, 5L)
  }

  test("readTopK: stat-less batches are always read, never certify") {
    val path = TempDirs.path("snapshot-spec/topk-blind")
    Seq((1L, 100L)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path) // batch 0 stays BLIND: no backfill
    Snapshot.stagedAppend(spark, path, 1L) {
      Seq((2L, 1L), (3L, 2L)).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$path/batch_id=1")
    }
    // blind batch 0 holds the true max — it must be read despite
    // having no stats to argue with
    Snapshot.readTopK(spark, path, "v", 1)
      .select(col("v")).as[Long].collect() shouldBe Array(100L)
  }
}
