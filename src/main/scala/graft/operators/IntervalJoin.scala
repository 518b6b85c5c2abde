package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join — `points.ts BETWEEN intervals.start AND
  * intervals.end` — as an EQUI-join, not the nested-loop plan Spark
  * gives the raw range predicate (a non-equi join condition has no
  * hashable key, so Catalyst falls back to BroadcastNestedLoop /
  * Cartesian: per-pair evaluation that dies at any real size).
  *
  * The standard grid decomposition: quantize time into `gridMicros`
  * cells; a point lives in exactly ONE cell, an interval covers
  * `len/grid + 1` consecutive cells (exploded). Every qualifying
  * (point, interval) pair meets in exactly one cell — the point's — so
  * the cell equi-join + exact BETWEEN residual filter is the complete
  * answer with NO post-join dedup. Both sides shuffle once, on the
  * cell key; neither needs to fit in memory.
  *
  * Pick `gridMicros` ≈ the typical interval length: larger grids cut
  * the interval explosion but widen each cell's false-candidate set
  * (filtered by the residual, but scanned); smaller grids do the
  * reverse. The explosion is guarded — an interval spanning more than
  * `maxCellsPerInterval` cells fails the job loudly (executor-side
  * `raise_error`, no extra pass over the data) rather than quietly
  * materializing millions of cell rows; raise the grid, not the cap.
  *
  * Skew note: a hot cell (event burst) concentrates one join key —
  * AQE's skew-join split handles it (enabled in GraftSession), the
  * residual filter stays row-local either way.
  */
object IntervalJoin {

  /** Inner-join `points` to `intervals` on ts ∈ [start, end], both
    * ends inclusive. Returns all columns of both frames (names must
    * not collide). Timestamps compare at microsecond precision.
    *
    * `broadcastIntervals = true` is the small-intervals fast path: the
    * exploded cell rows broadcast and the join becomes a
    * BroadcastHashJoin — the points side is NEVER shuffled at all
    * (plan-pinned), which at 100 TB is the difference between a
    * full-table exchange and a map-side probe. Use when the interval
    * set (× its cell expansion) fits an executor; the default shuffles
    * both sides on the cell key and scales to arbitrarily many
    * intervals. */
  def intervalJoin(points: DataFrame, tsCol: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   gridMicros: Long,
                   maxCellsPerInterval: Int = 1 << 16,
                   broadcastIntervals: Boolean = false): DataFrame = {
    require(gridMicros > 0, s"gridMicros must be positive: $gridMicros")
    val pCell = floor(unix_micros(col(tsCol)) / gridMicros)
    val cs = floor(unix_micros(col(startCol)) / gridMicros)
    val ce = floor(unix_micros(col(endCol)) / gridMicros)
    val guardedEnd = when(ce - cs < maxCellsPerInterval, ce)
      .otherwise(raise_error(concat(
        lit(s"interval spans more than $maxCellsPerInterval grid cells at " +
          s"gridMicros=$gridMicros — raise the grid: start="),
        col(startCol).cast("string"), lit(" end="), col(endCol).cast("string"))))
    val ip = points.withColumn("_cell", pCell)
    val ii0 = intervals.withColumn("_cell", explode(sequence(cs, guardedEnd)))
    val ii = if (broadcastIntervals) broadcast(ii0) else ii0
    ip.join(ii, Seq("_cell"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_cell")
  }
}
