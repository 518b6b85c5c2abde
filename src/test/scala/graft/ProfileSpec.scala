package graft

import graft.operators.Profile

/** Null accounting and binning invariants behind the pf1/pf2 oracles. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("columnProfile: null/present counts and stringly min-max per column, one report row each") {
    val df = Seq(
      (1L, Some("b"), Some(10)),
      (2L, None, Some(30)),
      (3L, Some("a"), None))
      .toDF("id", "s", "v")
    val out = Profile.columnProfile(df, Seq("id", "s", "v"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    out shouldBe Array(
      ("id", 3L, 0L, "1", "3"),
      ("s", 2L, 1L, "a", "b"),
      ("v", 2L, 1L, "10", "30"))
  }

  test("columnProfile is a single-scan plan: one aggregate, no shuffle beyond it") {
    val df = Seq((1L, "x")).toDF("id", "s")
    val p = Profile.columnProfile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    // a global agg exchanges once (SinglePartition); per-column rows
    // explode from its 1-row output — no per-column scans or joins
    p should not include "Join"
    "Exchange".r.findAllIn(p).size shouldBe 1
  }

  test("histogram: floor-division bins, nulls dropped, empty bins absent") {
    val df = Seq(Some(0L), Some(99L), Some(100L), Some(250L), None)
      .toDF("v")
    val out = Profile.histogram(df, "v", 100L).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    out shouldBe Array((0L, 2L), (1L, 1L), (2L, 1L))
  }
}
