package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Ordered-funnel analytics: how far along a prescribed step sequence
  * (view → click → purchase, …) each entity progressed, by event time.
  * The sequence-matching operator class the windowed/sessionized
  * family (st1-st3, a16/a17 retention) doesn't cover: a stage counts
  * only when every EARLIER stage already matched at an earlier-or-equal
  * event time.
  *
  * Semantics — GREEDY EARLIEST MATCH, the classical funnel definition:
  * stage i matches at the minimum event time ≥ stage i−1's match time
  * (ties allowed: a click stamped the same instant as the qualifying
  * view counts). Greedy earliest is optimal for subsequence matching,
  * so this equals "does any monotone assignment of events to stages
  * exist" — and it is exactly the min-cascade a SQL engine writes
  * (stage i = MIN(ts) WHERE step=sᵢ AND ts ≥ stage_{i−1}.ts), which is
  * what the fn1 DuckDB oracle recomputes.
  *
  * Shape at scale: filter to funnel steps at the scan (everything else
  * dies before the exchange), ONE shuffle on the entity key, then a
  * per-entity executor-side walk inside a BOUNDED typed Aggregator
  * (the [[TopKByScore]] discipline): the per-entity buffer holds flat
  * primitive arrays of (epoch-µs, stage-position) and throws WITH the
  * offending entity the moment it would exceed `maxEventsPerEntity` —
  * so a pathological bot entity costs a loud, attributable failure at
  * the cap, never an executor OOM (review r18 #3: the earlier
  * collect_list + fold form materialized the full array before any
  * guard could run, bounding nothing). No driver state, no second
  * exchange ([[funnelCounts]] adds one global single-row agg).
  *
  * Equal-timestamp determinism: events sort by (ts, funnel position),
  * so at a tied instant earlier stages match first — the order that
  * makes same-instant progression count, matching the ≥ min-cascade.
  */
object Funnel {

  /** One funnel-step event as the aggregator's input row. `e` is the
    * entity rendered as a string — carried only so a cap breach can
    * name its offender from inside `reduce`, where the group key is
    * not otherwise visible. */
  private[operators] final case class FunnelEvent(e: String, us: Long, pos: Int)

  /** Amortized-growth buffer: `n` live entries in the array prefixes
    * (capacity doubles — a per-row `:+` would copy O(n²) for entities
    * near the cap). Capacity never exceeds the cap, which is the
    * memory bound the aggregator exists to enforce. */
  private[operators] final case class FunnelBuf(e: String, us: Array[Long],
                                                pos: Array[Int], n: Int)

  /** Bounded funnel-walk Aggregator: buffers an entity's (us, pos)
    * events up to the cap, then finishes with the sorted greedy
    * cascade directly — the fold that used to run as a higher-order
    * expression now runs as plain JVM code over primitive arrays. */
  private[operators] class FunnelReachAgg(nSteps: Int, gapMicros: Option[Long],
                                          cap: Int)
      extends Aggregator[FunnelEvent, FunnelBuf, Long] {

    override def zero: FunnelBuf =
      FunnelBuf(null, new Array[Long](0), new Array[Int](0), 0)

    private def grown(b: FunnelBuf, entity: String): FunnelBuf =
      if (b.n < b.us.length) b
      else if (b.n >= cap)
        throw new IllegalStateException(s"funnel: entity $entity has more " +
          s"than maxEventsPerEntity=$cap funnel-step events (a " +
          "pathological/bot entity concentrates its whole history on one " +
          "task; filter it out or raise the cap)")
      else {
        val c = math.min(cap, math.max(8, b.us.length * 2))
        FunnelBuf(entity, java.util.Arrays.copyOf(b.us, c),
          java.util.Arrays.copyOf(b.pos, c), b.n)
      }

    override def reduce(b0: FunnelBuf, v: FunnelEvent): FunnelBuf = {
      val b = grown(b0, v.e)
      b.us(b.n) = v.us
      b.pos(b.n) = v.pos
      FunnelBuf(v.e, b.us, b.pos, b.n + 1)
    }

    override def merge(a: FunnelBuf, b: FunnelBuf): FunnelBuf = {
      val who = Option(a.e).orElse(Option(b.e)).getOrElse("<unknown>")
      if (a.n + b.n > cap)
        throw new IllegalStateException(s"funnel: entity $who has more " +
          s"than maxEventsPerEntity=$cap funnel-step events across " +
          "partitions (a pathological/bot entity concentrates its whole " +
          "history on one task; filter it out or raise the cap)")
      val c = math.max(a.us.length, a.n + b.n)
      val out = FunnelBuf(who, java.util.Arrays.copyOf(a.us, c),
        java.util.Arrays.copyOf(a.pos, c), a.n + b.n)
      System.arraycopy(b.us, 0, out.us, a.n, b.n)
      System.arraycopy(b.pos, 0, out.pos, a.n, b.n)
      out
    }

    override def finish(b: FunnelBuf): Long = {
      // sort by (us, pos): at a tied instant earlier stages match first
      val order = Array.range(0, b.n)
        .sortBy(i => (b.us(i), b.pos(i)))
      var reached = 0L
      var lastUs = Long.MinValue
      var i = 0
      while (i < order.length && reached < nSteps) {
        val j = order(i)
        if (b.pos(j) == reached + 1 &&
          (reached == 0L || gapMicros.forall(g => b.us(j) <= lastUs + g))) {
          reached += 1
          lastUs = b.us(j)
        }
        i += 1
      }
      reached
    }

    override def bufferEncoder: Encoder[FunnelBuf] = Encoders.product[FunnelBuf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Per-entity furthest stage reached: (entity, reached) with
    * reached ∈ 1..steps.size — entities with no stage-1 match carry
    * reached = 0 and are included only if they had SOME funnel-step
    * event (entities with none are absent; both count as zero
    * downstream).
    *
    * `maxStepGapSeconds` adds the CONVERSION WINDOW every funnel tool
    * ships: stage i must match within the window after stage i−1's
    * match time (stage 1 is unconstrained). Still the greedy cascade —
    * anchored at stage i−1's EARLIEST match, exactly the windowed SQL
    * min-cascade (ts ≥ t_{i−1} AND ts ≤ t_{i−1} + gap), NOT the
    * maximal-assignment variant (a later anchor that would convert
    * where the earliest does not is deliberately not searched; that is
    * how the analytics tools define it, and it keeps the oracle a
    * cascade).
    *
    * `maxEventsPerEntity` is the boundedness guard (VERDICT r17 #8):
    * per-entity aggregation state is the entity's funnel-step event
    * count, and the bounded buffer raises WITH the offending entity
    * at the cap — BEFORE the state materializes past it (see the
    * object doc). */
  def stageReach(events: DataFrame, entityCol: String, tsCol: String,
                 stepCol: String, steps: Seq[String],
                 maxStepGapSeconds: Option[Long] = None,
                 maxEventsPerEntity: Int = 1000000): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"funnel steps must be distinct: $steps")
    require(maxStepGapSeconds.forall(_ > 0),
      s"maxStepGapSeconds must be positive: $maxStepGapSeconds")
    require(maxEventsPerEntity > 0,
      s"maxEventsPerEntity must be positive: $maxEventsPerEntity")
    val stepsArr = array(steps.map(lit): _*)
    val reach = udaf(new FunnelReachAgg(steps.size,
      maxStepGapSeconds.map(_ * 1000000L), maxEventsPerEntity),
      Encoders.product[FunnelEvent])
    events
      .filter(col(stepCol).isin(steps: _*))
      .select(col(entityCol).as("entity"),
        col(entityCol).cast("string").as("_e"),
        // event time as epoch micros: integer compares inside the walk
        // (and the +gap arithmetic) stay exact
        unix_micros(col(tsCol)).as("_us"),
        array_position(stepsArr, col(stepCol)).cast("int").as("_pos"))
      .groupBy(col("entity"))
      .agg(reach(col("_e"), col("_us"), col("_pos")).as("reached"))
  }

  /** The funnel report: one row per stage — (stage, step, n_entities
    * that reached it). Monotone non-increasing down the stages by
    * construction. One single-row global agg over [[stageReach]], then
    * a literal unpivot (no extra shuffle beyond the entity exchange). */
  def funnelCounts(events: DataFrame, entityCol: String, tsCol: String,
                   stepCol: String, steps: Seq[String],
                   maxStepGapSeconds: Option[Long] = None,
                   maxEventsPerEntity: Int = 1000000): DataFrame = {
    val reach = stageReach(events, entityCol, tsCol, stepCol, steps,
      maxStepGapSeconds, maxEventsPerEntity)
    val perStage = steps.indices.map(i =>
      coalesce(sum(when(col("reached") >= i + 1, 1L)), lit(0L)).as(s"_n$i"))
    reach.agg(perStage.head, perStage.tail: _*)
      .select(explode(array(steps.zipWithIndex.map { case (st, i) =>
        struct(lit(i + 1).as("stage"), lit(st).as("step"),
          col(s"_n$i").as("n_entities"))
      }: _*)).as("s"))
      .select(col("s.stage").as("stage"), col("s.step").as("step"),
        col("s.n_entities").as("n_entities"))
  }
}
