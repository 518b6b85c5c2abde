package graft

import org.apache.spark.sql.functions._
import graft.operators.{BloomIndex, Snapshot}

/** Bloom point-lookup index: batch pruning is physical (pruned
  * batches' files can be GONE), unindexed batches stay conservatively
  * readable, refresh is incremental, folds re-index, and a lookup is
  * never wrong — only ever over-reads — regardless of fpp. */
class BloomIndexSpec extends SparkSpec {

  private def governed(tag: String, rows: Seq[(Long, String)]*): String = {
    import spark.implicits._
    val path = graft.TempDirs.path(
      s"bloomidx/$tag-${java.util.UUID.randomUUID()}")
    rows.head.toDF("id", "k").write.parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    rows.zipWithIndex.drop(1).foreach { case (rs, i) =>
      Snapshot.stagedAppend(spark, path, i.toLong) {
        rs.toDF("id", "k").write.mode("overwrite")
          .parquet(s"$path/batch_id=$i")
      }
    }
    path
  }

  test("lookup reads only admitting batches; no-bloom batches always read; " +
      "pruning is physical; empty-candidate lookup does zero IO") {
    BloomIndex.clearCache()
    val path = governed("basic",
      Seq((1L, "a"), (2L, "b")),
      Seq((10L, "c"), (11L, "d")),
      Seq((20L, "e"), (21L, "f")))
    BloomIndex.refresh(spark, path, "id") shouldBe 3
    // batch 3 appended AFTER the refresh: no sidecar yet
    import spark.implicits._
    Snapshot.stagedAppend(spark, path, 3L) {
      Seq((30L, "g")).toDF("id", "k").write.mode("overwrite")
        .parquet(s"$path/batch_id=3")
    }
    val (keep, pruned) = BloomIndex.candidateBatches(spark, path, "id", 10L)
    keep should contain(1L)   // admits the value
    keep should contain(3L)   // no bloom → conservative read
    pruned should contain allOf (0L, 2L)
    // PHYSICAL pin: the pruned batches' data files can be gone
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/batch_id=0"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/batch_id=2"), true)
    val r = BloomIndex.readPoint(spark, path, "id", 10L)
    r.collect().map(_.getString(1)).toSeq shouldBe Seq("c")
    r.inputFiles.map(_.split("batch_id=")(1).split("/")(0))
      .distinct.sorted.toSeq shouldBe Seq("1", "3")
    // second refresh is INCREMENTAL: only batch 3 builds (0 and 2 have
    // sidecars already — their data loss is invisible to refresh)
    BloomIndex.refresh(spark, path, "id") shouldBe 1
    // a value in NO batch: blooms exclude everything → schema-only
    // empty frame, zero file IO
    val miss = BloomIndex.readPoint(spark, path, "id", 9999L)
    miss.count() shouldBe 0L
    miss.inputFiles shouldBe empty
  }

  test("lookups are never wrong, only ever over-read: parity with the full " +
      "scan for every present and absent key") {
    BloomIndex.clearCache()
    val path = governed("parity",
      (0L until 20L).map(i => (i, s"v$i")),
      (100L until 120L).map(i => (i, s"v$i")),
      (200L until 220L).map(i => (i, s"v$i")))
    BloomIndex.refresh(spark, path, "id")
    val full = Snapshot.read(spark, path)
    for (probe <- Seq(0L, 7L, 105L, 119L, 200L, 219L, 50L, 150L, 9999L)) {
      val got = BloomIndex.readPoint(spark, path, "id", probe)
        .select("id", "k").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = full.filter(col("id") === probe)
        .select("id", "k").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      got shouldBe want
    }
  }

  test("string columns index too; non-indexable dtypes fail loudly") {
    BloomIndex.clearCache()
    val path = governed("str", Seq((1L, "alpha")), Seq((2L, "beta")))
    BloomIndex.refresh(spark, path, "k") shouldBe 2
    BloomIndex.readPoint(spark, path, "k", "beta")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
    val (_, pruned) = BloomIndex.candidateBatches(spark, path, "k", "beta")
    pruned should contain(0L)
    import spark.implicits._
    val dpath = graft.TempDirs.path(
      s"bloomidx/double-${java.util.UUID.randomUUID()}")
    Seq((1L, 0.5)).toDF("id", "x").write.parquet(s"$dpath/batch_id=0")
    Snapshot.enable(spark, dpath)
    val ex = intercept[IllegalArgumentException] {
      BloomIndex.refresh(spark, dpath, "x")
    }
    ex.getMessage should include("integral or string")
  }

  test("refresh builds every missing sidecar in ONE distributed pass: " +
      "job count ≤ k+1 for k new batches (r16 verdict #3 — was 2k)") {
    BloomIndex.clearCache()
    val path = governed("jobs",
      Seq((1L, "a")), Seq((2L, "b")), Seq((3L, "c")), Seq((4L, "d")))
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      BloomIndex.refresh(spark, path, "id") shouldBe 4
      // async listener bus: poll to quiescence before reading the count
      var last = -1; var stable = 0; var polls = 0
      while (stable < 2 && polls < 20) {
        Thread.sleep(100)
        val n = jobs.get
        if (n == last) stable += 1 else { stable = 0; last = n }
        polls += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    jobs.get should be <= 5 // k=4 new batches; actual shape is 2 jobs
    // and the index it built prunes correctly
    val (_, pruned) = BloomIndex.candidateBatches(spark, path, "id", 3L)
    pruned should contain allOf (0L, 1L, 3L)
  }

  test("a table RESET reusing batch ids at the same path cannot serve stale " +
      "blooms: lookups read conservatively until refresh rebuilds (r16 advice)") {
    BloomIndex.clearCache()
    import spark.implicits._
    val path = graft.TempDirs.path(
      s"bloomidx/reset-${java.util.UUID.randomUUID()}")
    Seq((1L, "old")).toDF("id", "k").write.parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    BloomIndex.refresh(spark, path, "id") shouldBe 1
    // warm both the on-disk sidecar and the in-process cache: 5 absent
    BloomIndex.readPoint(spark, path, "id", 5L).count() shouldBe 0L
    // RESET the batch in place with DIFFERENT content (the `build` =
    // table-reset lifecycle reuses ids at the same path); the old
    // sidecar survives on disk and the old bloom sits in the cache.
    // NO sleep: staleness is detected by the CONTENT fingerprint
    // (per-write UUID part names), not mtime ordering, so even a
    // same-tick rewrite reads as stale.
    Seq((5L, "new")).toDF("id", "k").write.mode("overwrite")
      .parquet(s"$path/batch_id=0")
    // NO clearCache, NO refresh: the stale sidecar must be detected
    // (batch dir newer than sidecar) and the batch read conservatively
    // — id=5 exists now and MUST come back
    BloomIndex.readPoint(spark, path, "id", 5L)
      .collect().map(_.getString(1)).toSeq shouldBe Seq("new")
    // refresh sees the staleness and rebuilds exactly that sidecar
    BloomIndex.refresh(spark, path, "id") shouldBe 1
    BloomIndex.readPoint(spark, path, "id", 5L)
      .collect().map(_.getString(1)).toSeq shouldBe Seq("new")
    // and the rebuilt bloom prunes the OLD value now absent
    val (_, pruned) = BloomIndex.candidateBatches(spark, path, "id", 1L)
    pruned shouldBe Seq(0L)
    // the new life's bloom EVICTED the old life's cache entry — the
    // token-keyed cache must not accrete one bloom per rebuild cycle
    BloomIndex.cachedTokens(path, "id", 0L) shouldBe 1
  }

  test("compaction folds re-index on refresh; retired sidecars are swept") {
    BloomIndex.clearCache()
    val path = governed("fold", Seq((1L, "a")), Seq((2L, "b")), Seq((3L, "c")))
    BloomIndex.refresh(spark, path, "id") shouldBe 3
    val fold = Snapshot.compactLive(spark, path)
    // the fold has no sidecar yet → conservative read, still correct
    BloomIndex.readPoint(spark, path, "id", 2L)
      .collect().map(_.getString(1)).toSeq shouldBe Seq("b")
    // refresh builds exactly the fold's bloom and sweeps the retired ids
    BloomIndex.refresh(spark, path, "id") shouldBe 1
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val side = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/_bloomidx/id"))
      .map(_.getPath.getName).toSet
    side shouldBe Set(s"batch_$fold.bloom", s"batch_$fold.bloom.fp")
    // and the fold now prunes like any other batch
    val (_, pruned) = BloomIndex.candidateBatches(spark, path, "id", 9999L)
    pruned shouldBe Seq(fold)
  }
}
