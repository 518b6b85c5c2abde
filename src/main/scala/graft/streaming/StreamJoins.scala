package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (§2.10): the live twins of the batch
  * time-predicate joins in `graft.operators`.
  *
  * Spark's streaming symmetric hash join supports ONLY equi-joins (a
  * pure range condition is rejected at plan time: "Stream-stream join
  * without equality predicate is not supported"), so the SAME grid
  * decomposition that saves the batch
  * [[graft.operators.IntervalJoin]] from a nested-loop plan is what
  * makes the streaming form plannable at all: the quantized time cell
  * is the equality key the hash join needs, and the event-time range
  * in the residual condition is what lets the engine derive a
  * state-eviction horizon per side instead of buffering both streams
  * forever.
  */
object StreamJoins {

  /** Streaming point-in-interval join: `points.ts ∈ [start, end]`,
    * both ends inclusive, batch-identical to
    * [[graft.operators.IntervalJoin.intervalJoin]] over the same rows
    * (parity pinned in StreamingSpec).
    *
    * Same construction as the batch operator — points get their one
    * grid cell, intervals explode to their covered cells (stateless,
    * pre-join), every qualifying pair meets in exactly the point's
    * cell so the BETWEEN residual completes the answer with no dedup.
    *
    * `maxIntervalSec` is the state-bounding contract: the condition
    * `ts <= start + maxIntervalSec` is stated directly on the two
    * event-time columns, so (with both sides watermarked `late`)
    * point-side state evicts once the watermark passes
    * `ts + maxIntervalSec` and interval-side once it passes the match
    * window. An interval LONGER than the cap fails the job loudly via
    * a guarded end column (the raise-the-knob-don't-silently-drop
    * contract of the batch grid's `maxCellsPerInterval`) — so the cap
    * never silently truncates matches.
    *
    * Column names must not collide across the two frames (same rule as
    * the batch operator). */
  def streamingIntervalJoin(points: DataFrame, tsCol: String,
                            intervals: DataFrame, startCol: String,
                            endCol: String, gridMicros: Long,
                            maxIntervalSec: Long, late: String): DataFrame = {
    require(gridMicros > 0, s"gridMicros must be positive: $gridMicros")
    require(maxIntervalSec > 0, s"maxIntervalSec must be positive: $maxIntervalSec")
    val guarded = when(
      unix_micros(col(endCol)) - unix_micros(col(startCol)) <= maxIntervalSec * 1000000L,
      col(endCol))
      .otherwise(raise_error(concat(
        lit(s"interval longer than maxIntervalSec=$maxIntervalSec — raise the cap: start="),
        col(startCol).cast("string"), lit(" end="), col(endCol).cast("string"))))
    val p = points.withWatermark(tsCol, late)
      .withColumn("_cell", floor(unix_micros(col(tsCol)) / gridMicros))
    val i = intervals.withWatermark(startCol, late)
      .withColumn("_end_g", guarded)
      .withColumn("_cell", explode(sequence(
        floor(unix_micros(col(startCol)) / gridMicros),
        floor(unix_micros(col("_end_g")) / gridMicros))))
    p.join(i,
        p("_cell") === i("_cell") &&
          col(tsCol) >= col(startCol) && col(tsCol) <= col("_end_g") &&
          col(tsCol) <= col(startCol) + expr(s"INTERVAL $maxIntervalSec SECONDS"),
        "inner")
      .drop("_cell").drop("_end_g")
  }
}
