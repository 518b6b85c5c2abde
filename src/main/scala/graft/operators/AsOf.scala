package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Input row for [[AsOf.streamingAsof]]: `side` 0 = right (the lookup
  * stream, e.g. quotes), 1 = left (the probe stream, e.g. trades).
  * `tie` is the right-side tiebreaker at equal ts (greatest wins) and
  * doubles as the left row's id in the output. */
case class AsofIn(key: String, ts: java.sql.Timestamp, side: Int,
                  tie: Long, value: Double)

/** One matched left row: the latest right row with `ts <= left.ts`
  * (None when no right row precedes the left row). */
case class AsofOut(key: String, ts: java.sql.Timestamp, left_id: Long,
                   asof_ts: Option[java.sql.Timestamp],
                   asof_value: Option[Double])

/** Per-key buffers for [[AsOf.streamingAsof]]: rights/lefts still
  * inside the watermark horizon, as (µs, tie[, value]) tuples. */
case class AsofBufState(rights: Seq[(Long, Long, Double)],
                        lefts: Seq[(Long, Long)])

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

  /** STREAMING as-of — the same semantics as [[asofJoin]] run as a live
    * state machine (§2.10): both sides arrive on ONE watermarked stream
    * (tagged by `side`, the union shape the batch plan uses), keyed by
    * `key`, and a `flatMapGroupsWithState` pass buffers rows inside the
    * watermark horizon, emitting each left row exactly once — when the
    * watermark passes its event time, so every right row that could
    * legally precede it (`right.ts <= left.ts`) has either arrived or
    * is dropped-late by the same watermark. That makes the emitted
    * matches IDENTICAL to the batch `asofJoin` over the same rows
    * (parity pinned in StreamingSpec), including ties (greatest `tie`
    * at equal ts wins) and disorder within the watermark slack.
    *
    * State per key is bounded by the watermark horizon: pending lefts
    * drain as the watermark advances, and of the rights at-or-below
    * the watermark only the LATEST survives (it is the as-of baseline
    * for every future left; anything older can never be the most
    * recent prior again). An event-time timeout flushes keys that go
    * quiet — a key's pending lefts emit when ANY stream activity
    * advances the watermark, not only activity on that key. */
  def streamingAsof(events: Dataset[AsofIn], late: String): Dataset[AsofOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", late)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofBufState, AsofOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state) =>
          val st0 = state.getOption.getOrElse(AsofBufState(Nil, Nil))
          def us(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          def tsOf(u: Long): java.sql.Timestamp = {
            val t = new java.sql.Timestamp((u / 1000000L) * 1000L)
            t.setNanos(((u % 1000000L) * 1000L).toInt)
            t
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // Spark does NOT watermark-filter the input of
          // flatMapGroupsWithState (that's only automatic for aggs /
          // dedup / stream-stream joins) — drop beyond-watermark rows
          // HERE, explicitly: a late left would otherwise bind against
          // rights the eviction below already collapsed, emitting a
          // match batch execution would never produce. Dropping is the
          // same contract every watermarked operator advertises.
          val fresh = rows.toSeq.filter(r => us(r.ts) >= wmUs)
          val rights = (st0.rights ++ fresh.filter(_.side == 0)
            .map(r => (us(r.ts), r.tie, r.value))).sorted
          val lefts = (st0.lefts ++ fresh.filter(_.side == 1)
            .map(r => (us(r.ts), r.tie))).sorted
          // STRICTLY below the watermark: a left AT the watermark must
          // stay pending, because an equal-ts right is still admissible
          // input (the fresh filter above keeps ts >= wm) and could win
          // the tie — emitting now would break batch parity
          val (ripe, pending) = lefts.partition(_._1 < wmUs)
          val out = ripe.map { case (lts, lid) =>
            val m = rights.filter(_._1 <= lts).lastOption
            AsofOut(key, tsOf(lts), lid, m.map(r => tsOf(r._1)), m.map(_._3))
          }
          val (settled, live) = rights.partition(_._1 <= wmUs)
          val keptRights = settled.takeRight(1) ++ live
          if (keptRights.isEmpty && pending.isEmpty) {
            // nothing buffered and no baseline — a key fed only
            // dropped-late rows (or timed out before anything settled)
            // holds no information; drop its state slot entirely
            state.remove()
          } else {
            state.update(AsofBufState(keptRights, pending))
            // wake this key when the watermark passes its oldest pending
            // left, or — when no lefts are pending — its oldest LIVE
            // right, so a key that goes quiet still gets one more
            // invocation to collapse its in-horizon rights down to the
            // single settled baseline instead of retaining them forever
            // (ms resolution; +1 keeps the ts strictly ahead of the
            // current watermark as the API requires)
            pending.headOption.map(_._1).orElse(live.headOption.map(_._1))
              .foreach(us => state.setTimeoutTimestamp(us / 1000L + 1L))
          }
          out.iterator
      }
  }
}
