package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * per-entity executor-side walk — collect the entity's step events as
  * a sorted array and fold it with the higher-order `aggregate`, no
  * UDF, no driver state, no second exchange ([[funnelCounts]] adds one
  * global single-row agg). Per-entity state is its FUNNEL-STEP event
  * count — same boundedness contract as session windows (a pathological
  * entity with millions of funnel events concentrates on one task; the
  * funnel-step pre-filter is what keeps normal entities small).
  *
  * Equal-timestamp determinism: events sort by (ts, funnel position),
  * so at a tied instant earlier stages match first — the order that
  * makes same-instant progression count, matching the ≥ min-cascade.
  */
object Funnel {

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
    * `maxEventsPerEntity` is the boundedness guard (VERDICT r17 #8,
    * the [[TimeSeries]] span-guard discipline): per-entity state is
    * the entity's funnel-step event count, so one pathological bot
    * entity with millions of funnel events concentrates on a single
    * task. The guard raises executor-side WITH the offending entity
    * the moment its collected array exceeds the cap — a loud
    * wrong-input failure instead of an OOM'd task at corpus scale. */
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
    val n = steps.size
    // event time as epoch micros: integer compares inside the fold (and
    // the +gap arithmetic) stay exact and codegen-simple. The entity
    // cap rides the fold's SEED (the TimeSeries fold-into-the-bound
    // discipline: a standalone guard column could be pruned away):
    // it raises executor-side, per row, WITH the offending entity.
    def guardedZero(cap: Int) = struct(
      when(size(col("evs")) > cap,
        raise_error(concat(lit("funnel: entity "),
          col("entity").cast("string"), lit(" has "),
          size(col("evs")).cast("string"),
          lit(s" funnel-step events — exceeds maxEventsPerEntity=$cap " +
            "(a pathological/bot entity concentrates its whole history " +
            "on one task; filter it out or raise the cap)")))
          .cast("long"))
        .otherwise(lit(0L)).as("reached"),
      lit(Long.MinValue).as("us"))
    def inWindow(st: Column, e: Column): Column = maxStepGapSeconds match {
      case None => lit(true)
      case Some(gap) =>
        st.getField("reached") === 0L ||
          e.getField("us") <= st.getField("us") + gap * 1000000L
    }
    events
      .filter(col(stepCol).isin(steps: _*))
      .select(col(entityCol).as("entity"),
        struct(unix_micros(col(tsCol)).as("us"),
          array_position(stepsArr, col(stepCol)).as("pos")).as("ev"))
      .groupBy(col("entity"))
      .agg(array_sort(collect_list(col("ev"))).as("evs"))
      .select(col("entity"),
        aggregate(col("evs"), guardedZero(maxEventsPerEntity),
          (st, e) =>
            when(st.getField("reached") < n &&
                e.getField("pos") === st.getField("reached") + 1 &&
                inWindow(st, e),
              struct((st.getField("reached") + 1).as("reached"),
                e.getField("us").as("us")))
              .otherwise(st),
          _.getField("reached")).as("reached"))
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
