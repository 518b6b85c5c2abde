package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over plain edge DataFrames — the ranking
  * companion to the dup-graph clustering in [[Dedup]] (pointer-jump /
  * star connected components): where CC answers "which pages are the
  * same", PageRank answers "which pages matter", the standard signal
  * for crawl-frontier prioritization and quality weighting in a
  * web-scale training-data pipeline.
  *
  * Execution shape (power iteration, the Pregel-free DataFrame form):
  *  - vertices and out-degrees are derived once and CACHED; the edge
  *    list is cached pre-projected to (src, dst) — every iteration
  *    reuses the same shuffle-friendly layout;
  *  - one iteration = one equi-join (ranks ⋈ edges on src) + one
  *    aggregate (sum of contributions per dst): the two shuffles that
  *    ARE the data floor for distributed power iteration;
  *  - dangling mass (rank parked on zero-out-degree nodes) is a 1-row
  *    aggregate attached by crossJoin (the repo's bounded stat-
  *    attachment pattern) and redistributed uniformly — rank mass is
  *    conserved exactly at every step;
  *  - each iteration ends in `localCheckpoint` to truncate lineage:
  *    without it the plan doubles per iteration and Catalyst analysis
  *    time, not the data, becomes the bottleneck. On a real cluster
  *    with reliable-checkpoint requirements, swap for
  *    `checkpoint(dir)` — the operator takes the same shape.
  *
  * Iteration count is a parameter (default 10 ≈ the classic "ranks
  * stabilize to 3-4 digits" regime); convergence-threshold loops are a
  * driver-side `while` over the same step function.
  */
object Graph {

  /** PageRank over `edges` (any row = one directed link src→dst;
    * parallel edges count as parallel — dedupe upstream if unwanted).
    * Returns (id, rank) for every node appearing as a source or a
    * target; ranks sum to 1. */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).cache()
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outDeg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("out_deg"))
    // (id, out_deg) with 0 for sinks — the per-iteration join's stable side
    val degreed = vertices.join(outDeg, Seq("id"), "left")
      .select(col("id"), coalesce(col("out_deg"), lit(0L)).as("out_deg"))
      .cache()
    val n = degreed.count().toDouble
    require(n > 0, "empty edge list")

    var state = degreed.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    (1 to iterations).foreach { _ =>
      val contribs = state.filter(col("out_deg") > 0)
        .join(e, state("id") === e("src"))
        .select(col("dst").as("id"),
          (col("rank") / col("out_deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      val dangling = state.filter(col("out_deg") === 0)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dangling"))
      state = degreed
        .join(contribs, Seq("id"), "left")
        .crossJoin(dangling)
        .select(col("id"), col("out_deg"),
          (lit((1.0 - damping) / n) + lit(damping)
            * (coalesce(col("contrib"), lit(0.0)) + col("dangling") / n))
            .as("rank"))
        .localCheckpoint()
    }
    val out = state.select(col("id"), col("rank"))
    e.unpersist(); degreed.unpersist()
    out
  }
}
