package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Funnel

/** Funnel (fn1's operator): greedy earliest-match sequence semantics —
  * order sensitivity, same-instant ties, missing/repeated stages, and
  * the report's monotone/empty contracts. The sf-scale value parity
  * against the SQL min-cascade is the fn1 oracle.
  */
class FunnelSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  private def reach(rows: (Long, String, String)*): Map[Long, Long] = {
    val session = spark
    import session.implicits._
    Funnel.stageReach(
        rows.map { case (u, ts, st) => (u, t(ts), st) }.toDF("u", "ts", "step"),
        "u", "ts", "step", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("order matters: a click before the first view does not count") {
    // user 1: click precedes view, then a later click completes stage 2
    // user 2: only the preceding click — stuck at stage 1 after view
    reach(
      (1L, "2024-01-01 09:00:00", "click"),
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),
      (2L, "2024-01-01 09:00:00", "click"),
      (2L, "2024-01-01 10:00:00", "view")) shouldBe Map(1L -> 2L, 2L -> 1L)
  }

  test("same-instant ties progress (the >= cascade), ordered by stage") {
    // view and click at the SAME timestamp: click counts — and the
    // tie-sort puts the earlier stage first regardless of input order
    reach(
      (1L, "2024-01-01 10:00:00", "click"),
      (1L, "2024-01-01 10:00:00", "view")) shouldBe Map(1L -> 2L)
  }

  test("missing middle stage blocks; repeats don't double-advance; other steps ignored") {
    reach(
      // user 1: view then purchase, no click → stuck at 1
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "purchase"),
      // user 2: three views → still stage 1
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 11:00:00", "view"),
      (2L, "2024-01-01 12:00:00", "view"),
      // user 3: full path with noise steps interleaved
      (3L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-01 10:30:00", "error"),
      (3L, "2024-01-01 11:00:00", "click"),
      (3L, "2024-01-01 11:30:00", "signup"),
      (3L, "2024-01-01 12:00:00", "purchase")) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L)
  }

  test("report: monotone counts, all stages present, zeros on empty input") {
    val session = spark
    import session.implicits._
    val events = Seq(
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 11:00:00"), "click"),
      (2L, t("2024-01-01 10:00:00"), "view"),
      (3L, t("2024-01-01 10:00:00"), "purchase")) // purchase-only: reach 0
      .toDF("u", "ts", "step")
    val rows = Funnel.funnelCounts(events, "u", "ts", "step",
        Seq("view", "click", "purchase"))
      .orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    rows shouldBe Seq((1, "view", 2L), (2, "click", 1L), (3, "purchase", 0L))

    val empty = Funnel.funnelCounts(events.limit(0), "u", "ts", "step",
        Seq("view", "click"))
      .orderBy("stage").collect().map(_.getLong(2)).toSeq
    empty shouldBe Seq(0L, 0L)
  }

  private def reachWin(gapS: Long, rows: (Long, String, String)*): Map[Long, Long] = {
    val session = spark
    import session.implicits._
    Funnel.stageReach(
        rows.map { case (u, ts, st) => (u, t(ts), st) }.toDF("u", "ts", "step"),
        "u", "ts", "step", Seq("view", "click", "purchase"), Some(gapS))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("conversion window: in-window advances, out-of-window blocks, greedy anchor holds") {
    // user 1: click 30 min after view — inside a 1 h window
    // user 2: click 2 h after view — outside, stuck at stage 1
    // user 3: the GREEDY anchor is the earliest view; the 2nd view
    //         does not re-anchor, so the late click stays out of
    //         window (the documented cascade semantics, not maximal
    //         assignment — the oracle computes the same)
    reachWin(3600,
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:30:00", "click"),
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 12:00:00", "click"),
      (3L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-01 11:30:00", "view"),
      (3L, "2024-01-01 12:00:00", "click")) shouldBe
      Map(1L -> 2L, 2L -> 1L, 3L -> 1L)
  }

  test("conversion window: each stage re-opens the window; boundary instant counts") {
    // click exactly AT the window edge counts (<=); purchase is timed
    // from the CLICK, not the view
    reachWin(3600,
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),      // edge: +1 h exactly
      (1L, "2024-01-01 11:59:00", "purchase")) shouldBe Map(1L -> 3L)
    // same events, purchase 61 min after click — blocked
    reachWin(3600,
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 12:01:00", "purchase")) shouldBe Map(1L -> 2L)
  }

  test("invalid steps fail loudly") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, t("2024-01-01 10:00:00"), "view")).toDF("u", "ts", "step")
    an[IllegalArgumentException] should be thrownBy
      Funnel.stageReach(df, "u", "ts", "step", Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Funnel.stageReach(df, "u", "ts", "step", Seq("view", "view"))
    an[IllegalArgumentException] should be thrownBy
      Funnel.stageReach(df, "u", "ts", "step", Seq("view"), Some(0L))
    an[IllegalArgumentException] should be thrownBy
      Funnel.stageReach(df, "u", "ts", "step", Seq("view"),
        maxEventsPerEntity = 0)
  }

  test("maxEventsPerEntity guard trips with the offending entity; " +
    "at-cap entities pass unchanged (VERDICT r17 #8)") {
    val session = spark
    import session.implicits._
    // entity 7: 5 funnel-step events; entity 1: 2 — cap 4 names 7
    val rows = (1 to 5).map(i => (7L, t(f"2024-01-01 10:0$i%d:00"), "view")) ++
      Seq((1L, t("2024-01-01 10:00:00"), "view"),
        (1L, t("2024-01-01 11:00:00"), "click"),
        // non-funnel steps never count against the cap (pre-filtered)
        (7L, t("2024-01-01 12:00:00"), "scroll"),
        (7L, t("2024-01-01 12:01:00"), "scroll"))
    val df = rows.toDF("u", "ts", "step")
    val e = intercept[Exception] {
      Funnel.stageReach(df, "u", "ts", "step", Seq("view", "click"),
        maxEventsPerEntity = 4).collect()
    }
    e.getMessage should include("entity 7")
    e.getMessage should include("maxEventsPerEntity=4")
    // cap 5: entity 7 is exactly AT the cap — passes, results unchanged
    Funnel.stageReach(df, "u", "ts", "step", Seq("view", "click"),
        maxEventsPerEntity = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(7L -> 1L, 1L -> 2L)
  }
}
