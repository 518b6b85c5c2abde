package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

/** Grid-decomposition invariants behind the iv1 oracle (a plain
  * BETWEEN join in DuckDB): boundary inclusivity, cross-cell matches,
  * no duplicate pairs, and the explosion guard. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def points = Seq(
    (1L, ts("2024-01-01 00:00:00")),
    (2L, ts("2024-01-01 00:05:00")),
    (3L, ts("2024-01-01 00:10:00")),
    (4L, ts("2024-01-01 01:00:00")))
    .toDF("pid", "pts")

  private def intervals = Seq(
    (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")), // hits 1,2,3
    (20L, ts("2024-01-01 00:59:00"), ts("2024-01-01 01:30:00")), // hits 4
    (30L, ts("2024-01-01 02:00:00"), ts("2024-01-01 02:30:00"))) // hits none
    .toDF("iid", "start_ts", "end_ts")

  private def pairs(grid: Long) =
    IntervalJoin.intervalJoin(points, "pts", intervals, "start_ts", "end_ts", grid)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted

  test("both boundaries inclusive; empty intervals empty; no duplicate pairs") {
    pairs(60L * 1000000) shouldBe Array((10L, 1L), (10L, 2L), (10L, 3L), (20L, 4L))
  }

  test("result is grid-invariant: tiny, matched, and huge grids agree") {
    val expect = pairs(60L * 1000000)
    pairs(7L * 1000000) shouldBe expect          // many cells per interval
    pairs(3600L * 1000000) shouldBe expect       // one cell swallows everything
    pairs(601L * 1000000 / 2) shouldBe expect    // misaligned odd grid
  }

  test("matches spark's own BNLJ range join on a random-ish fixture") {
    val ps = (0L until 300L).map(i => (i, new Timestamp(1700000000000L + i * 7919)))
      .toDF("pid", "pts")
    val is = (0L until 40L).map { i =>
      val s = 1700000000000L + i * 63211
      (i, new Timestamp(s), new Timestamp(s + 30000))
    }.toDF("iid", "start_ts", "end_ts")
    val grid = IntervalJoin.intervalJoin(ps, "pts", is, "start_ts", "end_ts", 20000000L)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val naive = ps.join(is, col("pts") >= col("start_ts") && col("pts") <= col("end_ts"))
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    naive.length should be > 0
    grid shouldBe naive
  }

  test("an interval spanning more cells than the cap fails loudly, not silently") {
    val wide = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-12-31 00:00:00")))
      .toDF("iid", "start_ts", "end_ts")
    val ex = intercept[Exception] {
      IntervalJoin.intervalJoin(points, "pts", wide, "start_ts", "end_ts",
        1000000L, maxCellsPerInterval = 1000).collect()
    }
    ex.getMessage should include("grid cells")
  }
}
