package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join: for each left row, attach the
  * latest right row with `right.ts <= left.ts` within the same key —
  * the event-stream lookup (last view before a click, last quote
  * before a trade) that a plain equi-join can't express and a range
  * join would solve with an O(n·m) per-key expansion.
  *
  * Spark-first plan: NO join node at all. Both sides are tagged and
  * UNIONED, then ONE window pass per key — `last(value, ignoreNulls)`
  * over rows `(ts, side)`-ordered, unbounded-preceding — carries each
  * right row's payload forward to every left row until the next right
  * row supersedes it. Cost at any scale is a single hash-partition by
  * key + one sort, identical to the sort the matching windowed query
  * would pay anyway; there is no per-row probe, no broadcast, and no
  * skew-amplifying key expansion. DuckDB's `ASOF JOIN` (the oracle
  * for `j4_asof_join`) is the single-node statement of the same
  * semantics.
  *
  * Ordering contract: right rows sort BEFORE left rows at equal `ts`
  * (side 0 < 1), so a right row at exactly `left.ts` matches
  * (inclusive as-of, DuckDB `ON right.ts <= left.ts`). Ties among
  * right rows at the same `(key, ts)` resolve to the greatest
  * `tieCol` — a total order, so the result is deterministic.
  */
object AsOf {

  /** @param rightCols right payload columns carried onto each left row,
    *                   emitted as `<prefix><name>` (null when no right
    *                   row precedes the left row)
    * @param tieCol     right-side column that breaks exact-`ts` ties
    *                   (greatest wins); must be numeric/castable to long
    * @param toleranceMicros when set, matches older than this many
    *                   microseconds before `left.ts` are nulled out —
    *                   the bounded-staleness variant
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightCols: Seq[String], tieCol: String, prefix: String = "asof_",
               toleranceMicros: Option[Long] = None): DataFrame = {
    val leftPayload = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val carried = s"$prefix$ts" +: rightCols.map(c => s"$prefix$c")

    val lu = left.select(
      Seq(col(key), col(ts).as("_ts"), lit(1).as("_side"), lit(Long.MinValue).as("_tie")) ++
        leftPayload.map(col) ++
        Seq(lit(null).cast(right.schema(ts).dataType).as(s"$prefix$ts")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"$prefix$c")): _*)
    val ru = right.select(
      Seq(col(key), col(ts).as("_ts"), lit(0).as("_side"), col(tieCol).cast("long").as("_tie")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(ts).as(s"$prefix$ts")) ++
        rightCols.map(c => col(c).as(s"$prefix$c")): _*)

    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lu.unionByName(ru)
      .select(
        Seq(col(key), col("_ts").as(ts), col("_side")) ++
          leftPayload.map(col) ++
          carried.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("_side") === 1).drop("_side")

    toleranceMicros.fold(matched) { tol =>
      // Materialize staleness BEFORE rewriting any carried column —
      // nulling them one-by-one would null `<prefix>ts` first and make
      // every later column's staleness test vacuously false.
      val stale = coalesce(
        unix_micros(col(ts)) - unix_micros(col(s"$prefix$ts")) > tol, lit(false))
      carried.foldLeft(matched.withColumn("_stale", stale))((df, c) =>
        df.withColumn(c, when(col("_stale"), lit(null)).otherwise(col(c))))
        .drop("_stale")
    }
  }
}
