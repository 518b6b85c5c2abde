package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries
import graft.operators.TimeSeries._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val MIN = 60000000L // one-minute buckets in µs

  private def series(rows: (String, Long, Double)*) =
    rows.toDF("k", "b", "v")
      .select(col("k"), timestamp_micros(col("b") * MIN).as("ts"), col("v"))

  private def out(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("key", "bucket")
      .collect()
      .map(r => (r.getString(0), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))

  test("grid densifies each key's own span only; ffill carries the last observation") {
    val got = out(TimeSeries.resample(
      series(("a", 10L, 1.0), ("a", 13L, 4.0), ("b", 100L, 7.0)),
      "k", "ts", "v", MIN, fill = ForwardFill))
    got shouldBe Array(
      ("a", 10L, Some(1.0), true), ("a", 11L, Some(1.0), false),
      ("a", 12L, Some(1.0), false), ("a", 13L, Some(4.0), true),
      // key b's grid is its own single bucket — never stretched to a's
      ("b", 100L, Some(7.0), true))
  }

  test("multiple events in one bucket aggregate BEFORE densify; NoFill leaves gap rows null; ZeroFill zeroes them") {
    val s3 = series(("a", 0L, 2.0), ("a", 0L, 4.0), ("a", 2L, 9.0))
    out(TimeSeries.resample(s3, "k", "ts", "v", MIN, fill = NoFill)) shouldBe
      Array(("a", 0L, Some(3.0), true), ("a", 1L, None, false),
        ("a", 2L, Some(9.0), true))
    out(TimeSeries.resample(s3, "k", "ts", "v", MIN, agg = sum,
      fill = ZeroFill)) shouldBe
      Array(("a", 0L, Some(6.0), true), ("a", 1L, Some(0.0), false),
        ("a", 2L, Some(9.0), true))
  }

  test("linear interpolation hits exact fractions between both neighbors") {
    val got = out(TimeSeries.resample(
      series(("a", 0L, 10.0), ("a", 4L, 30.0)),
      "k", "ts", "v", MIN, fill = LinearFill))
    got.map(_._3.get).toSeq shouldBe Seq(10.0, 15.0, 20.0, 25.0, 30.0)
    got.map(_._4).toSeq shouldBe Seq(true, false, false, false, true)
  }

  test("span guard fails loudly with the offending key, not an executor OOM") {
    val e = intercept[Exception] {
      TimeSeries.resample(
        series(("runaway", 0L, 1.0), ("runaway", 5000L, 2.0)),
        "k", "ts", "v", MIN, maxBucketsPerKey = 1000L).count()
    }
    e.getMessage should include("runaway")
    e.getMessage should include("buckets")
  }

  test("bucket_ts round-trips the grid position") {
    val r = TimeSeries.resample(series(("a", 42L, 1.0)), "k", "ts", "v", MIN)
      .select(unix_micros(col("bucket_ts"))).head()
    r.getLong(0) shouldBe 42L * MIN
  }

  test("the fill runs over the aggregated grid, not the raw stream — one window, post-agg") {
    val df = TimeSeries.resample(
      series(("a", 0L, 1.0), ("a", 9L, 2.0)), "k", "ts", "v", MIN)
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    "Window".r.findAllIn(p).size shouldBe 1
    // the window's child chain contains the grid join over the
    // aggregate — i.e. aggregation happened below the window
    p should include("HashAggregate")
  }

  // ---- gapFill (calendar-grid twin; merged from TimeseriesSpec, r17) ----

  private def gapFixture = {
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

  test("gapFill: gap days materialize with n=0, forward fill carries the last sum") {
    val got = TimeSeries.gapFill(gapFixture, "k", "ts", "v")
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getDouble(4), r.getBoolean(5)))
    got.toSeq shouldBe Seq(
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

  test("gapFill plan: no cartesian; the fill is ONE window over the running frame") {
    val p = TimeSeries.gapFill(gapFixture, "k", "ts", "v")
      .queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    "RunningWindowFunction|Window".r.findAllIn(p).size should be >= 1
    p should include("Generate explode") // the grid synthesizes in-plan
  }

  test("gapFill: a key spanning more than maxBucketsPerKey raises WITH the key " +
    "(the resample guard, applied to the calendar grid — r16 verdict #2)") {
    // key 'runaway' spans ~4 years of days; cap at 100 buckets
    val df = Seq(
      ("ok", "2024-01-01 00:00:00", 1.0),
      ("ok", "2024-02-01 00:00:00", 2.0),
      ("runaway", "2020-01-01 00:00:00", 1.0),
      ("runaway", "2024-01-01 00:00:00", 2.0))
      .toDF("k", "ts_s", "v")
      .select(col("k"), col("ts_s").cast("timestamp").as("ts"), col("v"))
    val e = intercept[Exception] {
      TimeSeries.gapFill(df, "k", "ts", "v", maxBucketsPerKey = 100L)
        .collect()
    }
    e.getMessage should include("runaway")
    e.getMessage should include("buckets")
  }
}
