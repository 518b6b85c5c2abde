package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Retention, SketchTable}

/** Retention: age is a partition boundary — dropping old batch dirs
  * is the whole rolling-window story, build batch protected, and the
  * multi-table dedup index stays probe-consistent after a cut. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  test("rolling sketch window: dropping old batches forgets exactly their users") {
    val path = TempDirs.path("retention-spec/sketch")
    def day(k: Int) = (k * 50 until k * 50 + 60)
      .map(u => ("all", u.toLong)).toDF("key", "user_id")
    (0 until 5).foreach(k =>
      SketchTable.appendBatch(day(k), "key", "user_id", path, k.toLong))
    Retention.batchIds(spark, path) shouldBe Seq(0L, 1L, 2L, 3L, 4L)
    def est(): Long = SketchTable.estimateDistinct(spark, path)
      .head().getLong(1)
    val full = est() // users 0..259 → 260 distinct
    Retention.dropBatchesBefore(spark, path, keepFrom = 2L) shouldBe Seq(0L, 1L)
    Retention.batchIds(spark, path) shouldBe Seq(2L, 3L, 4L)
    val kept = est() // users 100..259 → 160 distinct
    math.abs(kept - 160L) should be <= 16L
    math.abs(full - 260L) should be <= 26L
    (full - kept) should be >= 60L // the dropped days' users are GONE
    // idempotent: nothing more to drop
    Retention.dropBatchesBefore(spark, path, keepFrom = 2L) shouldBe Seq.empty
  }

  test("the build batch (-1) is protected unless explicitly included") {
    val path = TempDirs.path("retention-spec/build")
    SketchTable.build((0L until 10L).map(("k", _)).toDF("key", "u"),
      "key", "u", path)
    SketchTable.appendBatch((10L until 20L).map(("k", _)).toDF("key", "u"),
      "key", "u", path, 0L)
    Retention.dropBatchesBefore(spark, path, keepFrom = 5L) shouldBe Seq(0L)
    Retention.batchIds(spark, path) shouldBe Seq(-1L)
    Retention.dropBatchesBefore(spark, path, keepFrom = 5L,
      includeBuild = true) shouldBe Seq(-1L)
    Retention.batchIds(spark, path) shouldBe Seq.empty
  }

  test("keepLastBatches keeps the newest n") {
    val path = TempDirs.path("retention-spec/keeplast")
    (0 until 6).foreach(k =>
      SketchTable.appendBatch(Seq(("k", k.toLong)).toDF("key", "u"),
        "key", "u", path, k.toLong))
    Retention.keepLastBatches(spark, path, 2) shouldBe Seq(0L, 1L, 2L, 3L)
    Retention.batchIds(spark, path) shouldBe Seq(4L, 5L)
  }

  test("non-numeric batch dirs are skipped, never fatal and never deleted") {
    val path = TempDirs.path("retention-spec/foreign")
    SketchTable.appendBatch(Seq(("k", 1L)).toDF("key", "u"), "key", "u", path, 0L)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path, "batch_id=__HIVE_DEFAULT_PARTITION__"))
    Retention.batchIds(spark, path) shouldBe Seq(0L)
    Retention.dropBatchesBefore(spark, path, keepFrom = 10L) shouldBe Seq(0L)
    fs.exists(new org.apache.hadoop.fs.Path(path,
      "batch_id=__HIVE_DEFAULT_PARTITION__")) shouldBe true
  }

  test("dropOlderThan resolves through the ledger: straddlers and unledgered protected") {
    val path = TempDirs.path("retention-spec/event-time")
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")
    def batch(k: Long, days: Seq[Int]): Unit = {
      val df = days.map(d => ("k", d.toLong, ts(d))).toDF("key", "u", "ts")
      SketchTable.appendBatch(df, "key", "u", path, k)
      Retention.recordBatchEventTime(df, "ts", path, k)
    }
    batch(0L, Seq(1, 2, 3))   // entirely before the cutoff → dropped
    batch(1L, Seq(4, 5, 9))   // STRADDLES day 8 → kept whole
    batch(2L, Seq(10, 11))    // after → kept
    // an unledgered batch: age unknown ⇒ never dropped
    SketchTable.appendBatch(Seq(("k", 99L, ts(2))).toDF("key", "u", "ts")
      .select("key", "u"), "key", "u", path, 3L)
    // a batch whose ledger row has NULL bounds (recorded from an
    // empty / all-null-ts batch — the global agg still emits one row):
    // age unknown ⇒ protected, and it must not crash the pass
    val emptyBatch = Seq.empty[(String, Long, java.sql.Timestamp)]
      .toDF("key", "u", "ts")
    SketchTable.appendBatch(Seq(("k", 50L)).toDF("key", "u"),
      "key", "u", path, 4L)
    Retention.recordBatchEventTime(emptyBatch, "ts", path, 4L)
    val cutoff = java.sql.Timestamp.valueOf("2024-01-08 00:00:00")
    Retention.dropOlderThan(spark, path, cutoff) shouldBe Seq(0L)
    Retention.batchIds(spark, path) shouldBe Seq(1L, 2L, 3L, 4L)
    // physical path swept the dropped batch's ledger row too (batch 4
    // keeps its null-bounds row — protected, not dropped)
    Retention.batchLedger(spark, path).keySet shouldBe Set(1L, 2L, 4L)
    // idempotent
    Retention.dropOlderThan(spark, path, cutoff) shouldBe Seq.empty
  }

  test("dropOlderThan on a snapshot-enabled table is a manifest edit") {
    import graft.operators.Snapshot
    val path = TempDirs.path("retention-spec/event-time-snapshot")
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")
    (0 until 3).foreach { k =>
      val df = Seq(("k", k.toLong, ts(k * 5 + 1))).toDF("key", "u", "ts")
      SketchTable.appendBatch(df, "key", "u", path, k.toLong)
      Retention.recordBatchEventTime(df, "ts", path, k.toLong)
    }
    Snapshot.enable(spark, path)
    // batches hold days 1 / 6 / 11 — only batch 0 lies wholly before
    val cutoff = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    Retention.dropOlderThan(spark, path, cutoff) shouldBe Seq(0L)
    Snapshot.liveBatches(spark, path) shouldBe Seq(1L, 2L)
    Retention.batchIds(spark, path) shouldBe Seq(0L, 1L, 2L) // logical only
    Retention.batchLedger(spark, path).keySet shouldBe Set(0L, 1L, 2L)
  }

  test("flat-layout calls on a multi-table root are rejected, not silent no-ops") {
    val path = TempDirs.path("retention-spec/multitable-misuse")
    SketchTable.appendBatch(Seq(("k", 1L)).toDF("key", "u"),
      "key", "u", s"$path/signatures", 0L)
    val e = intercept[IllegalArgumentException] {
      Retention.dropBatchesBefore(spark, path, keepFrom = 10L)
    }
    e.getMessage should include("dropBatchesBeforeAllTables")
    intercept[IllegalArgumentException] {
      Retention.keepLastBatches(spark, path, 1)
    }
    // the AllTables form handles it
    Retention.dropBatchesBeforeAllTables(spark, path, keepFrom = 10L)
      .shouldBe(Map("signatures" -> Seq(0L)))
  }

  test("dedup-index window: a dropped batch's docs stop matching probes", Slow) {
    val idx = TempDirs.path("retention-spec/minhash")
    val seed = "unrelated seed corpus document with entirely distinct words here"
    val dup = "the quick brown fox jumps over the lazy dog tonight again and again"
    Dedup.buildMinhashIndex(Seq(1L -> seed).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    Dedup.appendToMinhashIndex(Seq(10L -> dup).toDF("doc_id", "text"),
      "doc_id", "text", idx, batchId = Some(0L))
    Dedup.appendToMinhashIndex(Seq(20L -> dup).toDF("doc_id", "text"),
      "doc_id", "text", idx, batchId = Some(1L))
    def probeHits(): Set[Long] =
      Dedup.minhashNearDupsAgainstIndex(
          Seq(99L -> dup).toDF("doc_id", "text"), "doc_id", "text", idx)
        .select("corpus_doc").collect().map(_.getLong(0)).toSet
    probeHits() shouldBe Set(10L, 20L)
    // retire batch 0: doc 10 ages out of the dedup window everywhere
    // (signatures, buckets, payloads) in one metadata cut
    val dropped = Retention.dropBatchesBeforeAllTables(spark, idx, keepFrom = 1L)
    dropped.values.flatten.toSet shouldBe Set(0L)
    probeHits() shouldBe Set(20L)
    // the build's seed doc is untouched by default
    Dedup.minhashNearDupsAgainstIndex(
        Seq(98L -> (seed + " extra")).toDF("doc_id", "text"),
        "doc_id", "text", idx)
      .select("corpus_doc").collect().map(_.getLong(0)).toSet shouldBe Set(1L)
  }
}
