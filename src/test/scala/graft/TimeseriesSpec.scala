package graft

import org.apache.spark.sql.functions._
import graft.operators.Timeseries

/** Gap-fill semantics on a planted series: materialized empty buckets,
  * forward fill across them, per-key independence, and the plan shape
  * (no cartesian, one running-frame window). */
class TimeseriesSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // key a: days 1, 2, 5 (gap 3-4); key b: days 2, 4 (gap 3) — two
    // events on a/day1 to pin in-bucket aggregation
    Seq(
      ("a", "2024-01-01 03:00:00", 1.5),
      ("a", "2024-01-01 07:00:00", 2.0),
      ("a", "2024-01-02 00:30:00", 4.0),
      ("a", "2024-01-05 12:00:00", 8.0),
      ("b", "2024-01-02 09:00:00", 10.0),
      ("b", "2024-01-04 23:00:00", 20.0))
      .toDF("k", "ts_s", "v")
      .select(col("k"), col("ts_s").cast("timestamp").as("ts"), col("v"))
  }

  test("gap days materialize with n=0, forward fill carries the last sum") {
    val out = Timeseries.gapFill(fixture, "k", "ts", "v")
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getDouble(4), r.getBoolean(5)))
    out.toSeq shouldBe Seq(
      ("a", "2024-01-01", 2L, Some(3.5), 3.5, false),
      ("a", "2024-01-02", 1L, Some(4.0), 4.0, false),
      ("a", "2024-01-03", 0L, None, 4.0, true),
      ("a", "2024-01-04", 0L, None, 4.0, true),
      ("a", "2024-01-05", 1L, Some(8.0), 8.0, false),
      // key b's grid starts at ITS first bucket (Jan 2), not the
      // global min — grids are per-key
      ("b", "2024-01-02", 1L, Some(10.0), 10.0, false),
      ("b", "2024-01-03", 0L, None, 10.0, true),
      ("b", "2024-01-04", 1L, Some(20.0), 20.0, false))
  }

  test("plan: no cartesian; the fill is ONE window over the running frame") {
    val p = Timeseries.gapFill(fixture, "k", "ts", "v")
      .queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    "RunningWindowFunction|Window".r.findAllIn(p).size should be >= 1
    p should include("Generate explode") // the grid synthesizes in-plan
  }
}
