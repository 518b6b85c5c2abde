package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int = 10) =
    Graph.pagerank(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("rank mass is conserved exactly, dangling nodes included") {
    val r = ranks(Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"))) // d is a sink
    r.values.sum shouldBe 1.0 +- 1e-9
    r.keySet shouldBe Set("a", "b", "c", "d")
  }

  test("a symmetric cycle fixes at the exact uniform distribution", Slow) {
    val r = ranks(Seq(("a", "b"), ("b", "c"), ("c", "a")), iters = 25)
    r.values.foreach(_ shouldBe (1.0 / 3) +- 1e-12)
  }

  test("the hub out-ranks leaves and parallel edges weight contributions") {
    // star with backlinks: both leaves feed c, c splits back evenly
    val hub = ranks(Seq(("a", "c"), ("b", "c"), ("c", "a"), ("c", "b")))
    hub("c") should be > hub("a")
    hub("a") shouldBe hub("b") // symmetric leaves tie exactly
    // doubling an edge doubles its share of the source's contribution:
    // after one step b-c differs by exactly one extra damped (1/3)/3
    // share (the uniform dangling add-back cancels in the difference)
    val par = ranks(Seq(("a", "b"), ("a", "b"), ("a", "c")), iters = 1)
    (par("b") - par("c")) shouldBe (0.85 / 9) +- 1e-12
  }

  test("an all-dangling step redistributes uniformly (no mass leak)") {
    // single edge: b is a sink holding mass every iteration
    val r = ranks(Seq(("a", "b")), iters = 3)
    r.values.sum shouldBe 1.0 +- 1e-12
    r("b") should be > r("a")
  }

  test("iteration plans stay bounded: lineage is truncated per step", Slow) {
    val df = Graph.pagerank(
      Seq(("a", "b"), ("b", "a")).toDF("s", "d"), "s", "d", iterations = 8)
    // localCheckpoint per iteration keeps the final plan shallow — a
    // non-truncated plan would nest 8 join+agg rounds (hundreds of lines)
    df.queryExecution.executedPlan.toString.linesIterator.size should be < 40
  }

  test("invalid parameters fail loudly") {
    intercept[IllegalArgumentException] {
      Graph.pagerank(Seq(("a", "b")).toDF("s", "d"), "s", "d", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pagerank(Seq(("a", "b")).toDF("s", "d"), "s", "d", damping = 1.0)
    }
  }
}
