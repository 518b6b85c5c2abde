package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample irregular events onto a fixed
  * per-key grid, then fill the gaps (forward-fill / zero / linear
  * interpolation) — the missing step between raw event streams and
  * window/as-of analytics that assume a dense axis (the reference's
  * timestamp handling stops at parsing, SURVEY §1.2; this is the
  * engine-extension form).
  *
  * Execution shape, sized for 100 TB:
  *  1. bucket = floor(event-time µs / interval) — a per-row projection;
  *  2. ONE hash aggregate on (key, bucket) collapses raw events to at
  *     most span/interval rows per key BEFORE anything else — the raw
  *     stream is never windowed;
  *  3. densify: each key's [min, max] bucket range is generated
  *     DISTRIBUTED via `sequence()` + explode from the per-key span row
  *     — no driver-side calendar, no global grid (a key observed for a
  *     day costs a day of buckets, not the table's full history);
  *  4. gaps left-join the observed aggregates back (same (key, bucket)
  *     hash layout the aggregate just produced);
  *  5. fill runs in ONE window pass per key ordered by bucket.
  *
  * The window partitions by key — fine when keys are many (the normal
  * metrics/series case); a single giant series should be range-chunked
  * upstream. `maxBucketsPerKey` bounds step 3's blowup LOUDLY: a key
  * whose observed span exceeds it (a unit-mixup bug, e.g. ms-as-µs)
  * fails the job with the key name instead of OOMing an executor.
  *
  * No extrapolation: each key's grid covers its own observed
  * [first, last] bucket, so forward-fill always has a seed and linear
  * interpolation always has both endpoints.
  */
object TimeSeries {

  sealed trait Fill
  /** Leave gap rows NULL. */
  case object NoFill extends Fill
  /** Carry the last observed value forward. */
  case object ForwardFill extends Fill
  /** Gap rows become 0.0 (count-like series). */
  case object ZeroFill extends Fill
  /** Linear interpolation between the neighboring observations. */
  case object LinearFill extends Fill

  /** Resample `df` to the per-key grid.
    *
    * @param agg aggregate for multiple events in one bucket, given the
    *            value column — e.g. `avg`, `sum`, `c => count(c)`.
    * Output: (key, bucket_ts timestamp, bucket long, value double,
    * observed boolean), one row per key × grid bucket.
    */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, intervalMicros: Long,
      agg: Column => Column = avg, fill: Fill = ForwardFill,
      maxBucketsPerKey: Long = 1L << 21): DataFrame = {
    require(intervalMicros > 0, s"intervalMicros must be > 0: $intervalMicros")
    val bucket = floor(unix_micros(col(tsCol)) / intervalMicros).cast("long")

    val observed = df
      .select(col(keyCol).as("key"), bucket.as("bucket"),
        col(valueCol).cast("double").as("__v"))
      .groupBy(col("key"), col("bucket"))
      .agg(agg(col("__v")).cast("double").as("value"))

    // per-key span; the guard raises WITH the offending key, per row,
    // executor-side — no driver collect. It is folded into the
    // sequence's upper bound (not a standalone column) so column
    // pruning can never optimize it away.
    val spans = observed.groupBy(col("key"))
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
    val guardedMax =
      when(col("__mx") - col("__mn") >= maxBucketsPerKey,
        raise_error(concat(lit("resample: key "), col("key").cast("string"),
          lit(s" spans more than $maxBucketsPerKey buckets — wrong " +
            "interval unit or runaway series"))).cast("long"))
        .otherwise(col("__mx"))

    val grid = spans
      .select(col("key"), explode(sequence(col("__mn"), guardedMax)).as("bucket"))

    val joined = grid.join(observed, Seq("key", "bucket"), "left")
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
    val filled = fill match {
      case NoFill      => joined.withColumn("__f", col("value"))
      case ZeroFill    => joined.withColumn("__f", coalesce(col("value"), lit(0.0)))
      case ForwardFill => joined.withColumn("__f",
        last(col("value"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      case LinearFill  =>
        val prevW = w.rowsBetween(Window.unboundedPreceding, 0)
        val nextW = w.rowsBetween(0, Window.unboundedFollowing)
        val obsB = when(col("value").isNotNull, col("bucket"))
        joined
          .withColumn("__pv", last(col("value"), ignoreNulls = true).over(prevW))
          .withColumn("__pb", last(obsB, ignoreNulls = true).over(prevW))
          .withColumn("__nv", first(col("value"), ignoreNulls = true).over(nextW))
          .withColumn("__nb", first(obsB, ignoreNulls = true).over(nextW))
          .withColumn("__f",
            when(col("value").isNotNull, col("value"))
              .when(col("__pv").isNull, col("__nv"))
              .when(col("__nv").isNull, col("__pv"))
              .otherwise(col("__pv") + (col("__nv") - col("__pv"))
                * (col("bucket") - col("__pb"))
                / (col("__nb") - col("__pb"))))
    }
    filled.select(col("key"),
      timestamp_micros(col("bucket") * intervalMicros).as("bucket_ts"),
      col("bucket"), col("__f").as("value"),
      col("value").isNotNull.as("observed"))
  }

  /** Gap-filled per-`keyCol` time series of `valueCol`, bucketed by
    * `date_trunc(unit, tsCol)` with one row per `step` between each
    * key's first and last bucket — the calendar-grid twin of
    * [[resample]] (same three-stage shape: bucket aggregate → in-plan
    * `sequence()`/explode grid → one running-frame window), keeping
    * timestamp buckets where resample keeps integer ones.
    *
    * Output: key, `bucket` (timestamp), `n` (events in bucket, 0 on
    * gaps), `v_sum` (4-dp rounded bucket sum, null on gaps — rounded
    * BEFORE the fill so filled values propagate the exact same doubles
    * any other engine computes from the same buckets), `v_ffill` (last
    * non-null v_sum at or before the bucket), `is_gap`. `step` must
    * match `unit` (e.g. unit="day", step="interval 1 day") — it is the
    * grid the SEQUENCE walks, while unit is the truncation the events
    * collapse to.
    *
    * Same `maxBucketsPerKey` guard as [[resample]] (r16 verdict #2 —
    * the standalone Timeseries.scala form lacked it): a key whose
    * span exceeds the bound raises executor-side WITH the key, folded
    * into the sequence's upper bound so pruning can't drop it. The
    * step length is measured in-plan (epoch + step), so the guard
    * tracks whatever interval the caller grids by. */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              valueCol: String, unit: String = "day",
              step: String = "interval 1 day",
              maxBucketsPerKey: Long = 1L << 21): DataFrame = {
    val bucketed = events
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("_n"), round(sum(col(valueCol)), 4).as("v_sum"))
    val stepMicros = unix_micros(timestamp_micros(lit(0L)) + expr(step))
    val guardedHi =
      when((unix_micros(col("_hi")) - unix_micros(col("_lo")))
          >= lit(maxBucketsPerKey) * stepMicros,
        raise_error(concat(lit("gapFill: key "), col(keyCol).cast("string"),
          lit(s" spans more than $maxBucketsPerKey buckets — wrong " +
            "unit/step or runaway series"))).cast("timestamp"))
        .otherwise(col("_hi"))
    val grid = bucketed
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("_lo"), max(col("bucket")).as("_hi"))
      .select(col(keyCol),
        explode(sequence(col("_lo"), guardedHi, expr(step))).as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, Seq(keyCol, "bucket"), "left_outer")
      .select(col(keyCol), col("bucket"),
        coalesce(col("_n"), lit(0L)).as("n"), col("v_sum"),
        last(col("v_sum"), ignoreNulls = true).over(w).as("v_ffill"),
        col("_n").isNull.as("is_gap"))
  }
}
