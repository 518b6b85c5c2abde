package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed
  * per-key time grid, materializing the EMPTY buckets (absent-as-row
  * semantics downstream models need), then forward-fill values across
  * the gaps.
  *
  * Reference lineage: the reference's timestamp-normalization pass
  * (ProjectCodeUsed/data.py — created/timestamp parsing) plus the
  * per-period aggregation idiom of its pandas post-processing
  * (readme.md:246-249 groupbys); the gap materialization itself is the
  * standard time-series extension of those (pandas `resample().ffill()`
  * shape), re-expressed as three declarative Spark stages.
  *
  * Scale shape — every stage is a standard distributed primitive:
  *  1. bucket aggregate: one partial-agged shuffle on (key, bucket) —
  *     map-side combine collapses the raw events before they move;
  *  2. grid synthesis: per-key min/max (one keyed agg) →
  *     `sequence()` + `explode` — the grid is generated IN the
  *     executors, rows ∝ Σ_key (span/step), never driver-side;
  *  3. forward fill: `last(value, ignoreNulls) OVER (PARTITION BY key
  *     ORDER BY bucket ROWS UNBOUNDED PRECEDING)` — one keyed window
  *     sort, the running-state frame (no whole-partition re-scan per
  *     row; Spark keeps the frame incremental for UNBOUNDED
  *     PRECEDING → CURRENT ROW).
  * Keys partition independently, so a 100 TB corpus gap-fills with
  * exactly two shuffles of the BUCKETED (already collapsed) rows; a
  * skewed key costs its own grid span, not the table's.
  *
  * Determinism: per-bucket sums round to 4 decimals BEFORE the
  * forward fill, so filled values propagate the exact same doubles
  * any other engine computes from the same buckets.
  */
object Timeseries {

  /** Gap-filled per-`keyCol` time series of `valueCol`, bucketed by
    * `date_trunc(unit, tsCol)` with one row per `step` between each
    * key's first and last bucket.
    *
    * Output: key, `bucket` (timestamp), `n` (events in bucket, 0 on
    * gaps), `v_sum` (4-dp rounded bucket sum, null on gaps),
    * `v_ffill` (last non-null v_sum at or before the bucket),
    * `is_gap`. `step` must match `unit` (e.g. unit="day",
    * step="interval 1 day") — it is the grid the SEQUENCE walks, while
    * unit is the truncation the events collapse to. */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              valueCol: String, unit: String = "day",
              step: String = "interval 1 day"): DataFrame = {
    val bucketed = events
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("_n"), round(sum(col(valueCol)), 4).as("v_sum"))
    val grid = bucketed
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("_lo"), max(col("bucket")).as("_hi"))
      .select(col(keyCol),
        explode(sequence(col("_lo"), col("_hi"), expr(step))).as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, Seq(keyCol, "bucket"), "left_outer")
      .select(col(keyCol), col("bucket"),
        coalesce(col("_n"), lit(0L)).as("n"), col("v_sum"),
        last(col("v_sum"), ignoreNulls = true).over(w).as("v_ffill"),
        col("_n").isNull.as("is_gap"))
  }
}
