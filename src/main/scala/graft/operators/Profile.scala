package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the "what is actually in this table" report run
  * before a corpus enters the pipeline: per-column presence/null
  * counts and min/max, plus fixed-width value histograms. The
  * describe()-adjacent surface, but deterministic (no sampling) and
  * oracle-checkable.
  *
  * Scale posture: [[columnProfile]] computes every column's four
  * aggregates in ONE global agg — a single scan with map-side partial
  * aggregation and a 1-row result, regardless of column count (the
  * per-column rows are exploded from that one row driver-free).
  * Distinct counts are deliberately absent here: exact ones cost a
  * shuffle per column — use `approx_count_distinct` (HLL++, one pass,
  * the a2c query pins its error bound) when cardinality matters.
  * [[histogram]] is floor-division binning — groupBy over ≤ a few
  * hundred bin keys. */
object Profile {

  /** One row per profiled column: (col_name, n_present, n_nulls,
    * min_s, max_s) — min/max cast to string so heterogeneous column
    * types fit one report frame. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile of no columns")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col(s"${c}__n").as("n_present"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__min").as("min_s"),
        col(s"${c}__max").as("max_s"))): _*)).as("_p"))
      .select(col("_p.*"))
  }

  /** Fixed-width histogram of a numeric column: (bin, n) with
    * bin = floor(value / width); null values are dropped. */
  def histogram(df: DataFrame, valueCol: String, width: Long): DataFrame = {
    require(width > 0, s"width must be positive: $width")
    df.filter(col(valueCol).isNotNull)
      .groupBy(floor(col(valueCol) / width).as("bin"))
      .agg(count(lit(1)).as("n"))
  }
}
