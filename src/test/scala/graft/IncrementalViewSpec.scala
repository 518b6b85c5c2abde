package graft

import org.apache.spark.sql.functions._
import graft.operators.{IncrementalView, Snapshot}

/** Delete-aware incremental view maintenance: the refresh must equal a
  * full rebuild after every mutation class the governed base supports
  * (append / retention / COW delete / compaction), converge under
  * replayed windows (the crash contract), and touch nothing when the
  * window is maintenance-only. The sf-scale value parity is the ma5
  * oracle.
  */
class IncrementalViewSpec extends SparkSpec {

  private def freshPaths(): (String, String) = {
    val id = java.util.UUID.randomUUID()
    (TempDirs.path(s"ivbase/$id"), TempDirs.path(s"ivview/$id"))
  }

  private def append(path: String, b: Long, rows: Seq[(String, Long)]): Unit = {
    val session = spark
    import session.implicits._
    Snapshot.stagedAppend(spark, path, b) {
      rows.toDF("k", "v").write.mode("overwrite")
        .parquet(s"$path/batch_id=$b")
    }
  }

  private def viewRows(viewPath: String): Seq[(String, Long, Long, Long, Long)] =
    IncrementalView.read(spark, viewPath)
      .select("k", "n_rows", "v_cnt", "v_sum", "v_min")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq

  private def rebuiltRows(basePath: String): Seq[(String, Long, Long, Long, Long)] = {
    val (_, scratch) = freshPaths()
    IncrementalView.build(spark, basePath, scratch, Seq("k"), Seq("v"))
    viewRows(scratch)
  }

  test("refresh equals full rebuild across append, COW delete, retention, " +
    "and compaction; vanished groups drop; maintenance-only windows no-op") {
    val session = spark
    import session.implicits._
    val (base, view) = freshPaths()
    Seq(("a", 1L), ("a", 2L), ("b", 10L), ("c", 5L), ("c", 7L))
      .toDF("k", "v").write.parquet(s"$base/batch_id=0")
    Snapshot.enable(spark, base)
    val v1 = IncrementalView.build(spark, base, view, Seq("k"), Seq("v"))
    v1 shouldBe Snapshot.latestVersion(spark, base).get
    viewRows(view) shouldBe Seq(("a", 2L, 2L, 3L, 1L), ("b", 1L, 1L, 10L, 10L),
      ("c", 2L, 2L, 12L, 5L))

    // APPEND: existing group b grows, new group d appears
    append(base, 1L, Seq(("b", 20L), ("d", 3L)))
    // COW DELETE: c vanishes entirely, a loses one row (min must
    // re-derive — the non-invertible case partial merging cannot do)
    Snapshot.deleteWhere(spark, base, col("k") === "c")
    Snapshot.deleteWhere(spark, base, col("k") === "a" && col("v") === 1L)
    val s1 = IncrementalView.refresh(spark, base, view)
    s1.refreshedGroups shouldBe 3L // a, b, d recomputed
    s1.droppedGroups shouldBe 1L // c vanished
    viewRows(view) shouldBe Seq(("a", 1L, 1L, 2L, 2L), ("b", 2L, 2L, 30L, 10L),
      ("d", 1L, 1L, 3L, 3L))
    viewRows(view) shouldBe rebuiltRows(base)

    // idempotent: nothing moved → zero-work refresh
    val s2 = IncrementalView.refresh(spark, base, view)
    (s2.refreshedGroups, s2.droppedGroups) shouldBe ((0L, 0L))

    // COMPACTION: rows re-home, the table content is unchanged — the
    // diff window is empty and the refresh is metadata-only
    Snapshot.compactLive(spark, base)
    val s3 = IncrementalView.refresh(spark, base, view)
    (s3.refreshedGroups, s3.droppedGroups) shouldBe ((0L, 0L))
    s3.toVersion shouldBe Snapshot.latestVersion(spark, base).get
    viewRows(view) shouldBe rebuiltRows(base)

    // RETENTION after compaction: retire everything (includeBuild
    // reaches the fold the compaction produced), leaving only the new
    // append — refresh follows both mutation classes
    append(base, 2L, Seq(("e", 100L)))
    Snapshot.retainFrom(spark, base, keepFrom = 2L, includeBuild = true)
    IncrementalView.refresh(spark, base, view)
    viewRows(view) shouldBe Seq(("e", 1L, 1L, 100L, 100L))
    viewRows(view) shouldBe rebuiltRows(base)
  }

  test("refresh == rebuild under three interleaved mutation rounds on a " +
    "generated 500-row table (group accounting at width the hand fixture " +
    "can't reach)") {
    val session = spark
    import session.implicits._
    val (base, view) = freshPaths()
    def rows(ids: Range) = ids.map(i =>
      (s"g${i % 37}", (i.toLong * 31) % 1000)).toDF("k", "v")
    rows(0 until 300).write.parquet(s"$base/batch_id=0")
    Snapshot.enable(spark, base)
    IncrementalView.build(spark, base, view, Seq("k"), Seq("v"))
    def full(): Seq[org.apache.spark.sql.Row] = {
      val (_, scratch) = freshPaths()
      IncrementalView.build(spark, base, scratch, Seq("k"), Seq("v"))
      IncrementalView.read(spark, scratch).orderBy("k").collect().toSeq
    }
    def incr(): Seq[org.apache.spark.sql.Row] = {
      IncrementalView.refresh(spark, base, view)
      IncrementalView.read(spark, view).orderBy("k").collect().toSeq
    }
    // round 1: append + value-predicate COW delete
    Snapshot.stagedAppend(spark, base, 1L) {
      rows(300 until 400).write.mode("overwrite").parquet(s"$base/batch_id=1")
    }
    Snapshot.deleteWhere(spark, base, col("v") % 7 === 0)
    incr() shouldBe full()
    // round 2: append + keyed erase spanning many groups
    Snapshot.stagedAppend(spark, base, 2L) {
      rows(400 until 500).write.mode("overwrite").parquet(s"$base/batch_id=2")
    }
    Snapshot.deleteMatching(spark, base,
      (0 until 500 by 3).map(i => (s"g${i % 37}", (i.toLong * 31) % 1000))
        .toDF("k", "v"), Seq("k", "v"))
    incr() shouldBe full()
    // round 3: compaction (content no-op) then one more delete
    Snapshot.compactLive(spark, base)
    Snapshot.deleteWhere(spark, base, col("k") === "g0")
    incr() shouldBe full()
  }

  test("replayed refresh window converges (crash between view commit and " +
    "sync-pointer write): same values, no double counting") {
    val session = spark
    import session.implicits._
    val (base, view) = freshPaths()
    Seq(("a", 1L), ("b", 10L)).toDF("k", "v")
      .write.parquet(s"$base/batch_id=0")
    Snapshot.enable(spark, base)
    val v1 = IncrementalView.build(spark, base, view, Seq("k"), Seq("v"))
    append(base, 1L, Seq(("a", 2L), ("c", 5L)))
    IncrementalView.refresh(spark, base, view)
    val after = viewRows(view)
    // simulate the crash: the pointer never advanced — the SAME window
    // replays in full; recompute-from-pinned-base makes it a no-op in
    // values (a partial ADD would have doubled a's sum)
    IncrementalView.rollbackSync(spark, view, v1)
    val replay = IncrementalView.refresh(spark, base, view)
    replay.refreshedGroups shouldBe 2L // a, c re-recomputed
    viewRows(view) shouldBe after
    viewRows(view) shouldBe Seq(("a", 2L, 2L, 3L, 1L), ("b", 1L, 1L, 10L, 10L),
      ("c", 1L, 1L, 5L, 5L))
  }

  test("invalid states fail loudly: non-governed base, un-built view, " +
    "base history reset") {
    val session = spark
    import session.implicits._
    val (base, view) = freshPaths()
    an[IllegalStateException] should be thrownBy
      IncrementalView.build(spark, base, view, Seq("k"), Seq("v"))
    Seq(("a", 1L)).toDF("k", "v").write.parquet(s"$base/batch_id=0")
    Snapshot.enable(spark, base)
    an[IllegalArgumentException] should be thrownBy
      IncrementalView.refresh(spark, base, view) // never built
    IncrementalView.build(spark, base, view, Seq("k"), Seq("v"))
    // a base whose history went backwards (rebuilt) must not silently
    // re-sync: plant a smaller version by rebuilding the base
    IncrementalView.rollbackSync(spark, view,
      Snapshot.latestVersion(spark, base).get + 5)
    an[IllegalArgumentException] should be thrownBy
      IncrementalView.refresh(spark, base, view)
  }

  test("refresh is snapshot-consistent: commits landing AFTER the window " +
    "pins are not half-applied, and the next refresh picks them up") {
    val session = spark
    import session.implicits._
    val (base, view) = freshPaths()
    Seq(("a", 1L)).toDF("k", "v").write.parquet(s"$base/batch_id=0")
    Snapshot.enable(spark, base)
    IncrementalView.build(spark, base, view, Seq("k"), Seq("v"))
    append(base, 1L, Seq(("a", 2L)))
    val synced = IncrementalView.refresh(spark, base, view).toVersion
    IncrementalView.syncedVersion(spark, view) shouldBe synced
    // a later commit is OUTSIDE the applied window
    append(base, 2L, Seq(("a", 4L)))
    viewRows(view) shouldBe Seq(("a", 2L, 2L, 3L, 1L))
    IncrementalView.refresh(spark, base, view)
    viewRows(view) shouldBe Seq(("a", 3L, 3L, 7L, 1L))
  }

  test("chained lakehouse: the view's base is ITSELF a governedSink " +
    "landing table — sink replays and a refresh crash-replay in the " +
    "middle hop both stay exactly-once (bronze → silver → gold)") {
    val session = spark
    import session.implicits._
    val id = java.util.UUID.randomUUID()
    val silver = TempDirs.path(s"ivchain/silver-$id")
    val gold = TempDirs.path(s"ivchain/gold-$id")
    val sink = graft.streaming.Windows.governedSink(silver)
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", s"q-$id")
    try {
      def df(rows: (String, Long)*) = rows.toDF("k", "v")
      sink(df(("a", 1L), ("b", 2L)), 0L)
      sink(df(("a", 3L)), 1L)
      IncrementalView.build(spark, silver, gold, Seq("k"), Seq("v"))
      viewRows(gold) shouldBe Seq(("a", 2L, 2L, 4L, 1L), ("b", 1L, 1L, 2L, 2L))
      // MIDDLE-HOP crash-replay: the sink re-receives an already-
      // committed batch id (at-least-once redelivery after a
      // checkpoint restore) — exactly-once no-op; the silver version
      // must not move, so the view has nothing to re-apply
      val vSilver = Snapshot.latestVersion(spark, silver).get
      sink(df(("a", 999L)), 1L)
      Snapshot.latestVersion(spark, silver).get shouldBe vSilver
      IncrementalView.refresh(spark, silver, gold)
        .refreshedGroups shouldBe 0L
      viewRows(gold) shouldBe Seq(("a", 2L, 2L, 4L, 1L), ("b", 1L, 1L, 2L, 2L))
      // a REAL batch lands; the refresh window is exactly its commit
      sink(df(("b", 5L), ("c", 7L)), 2L)
      val st = IncrementalView.refresh(spark, silver, gold)
      (st.refreshedGroups, st.droppedGroups) shouldBe ((2L, 0L))
      val want = Seq(("a", 2L, 2L, 4L, 1L), ("b", 2L, 2L, 7L, 2L),
        ("c", 1L, 1L, 7L, 7L))
      viewRows(gold) shouldBe want
      // crash between the gold commit and the sync pointer: replaying
      // the same window converges (no double counting)
      IncrementalView.rollbackSync(spark, gold, st.fromVersion)
      IncrementalView.refresh(spark, silver, gold)
      viewRows(gold) shouldBe want
      viewRows(gold) shouldBe rebuiltRows(silver)
    } finally
      spark.sparkContext.setLocalProperty("sql.streaming.queryId", null)
  }
}
