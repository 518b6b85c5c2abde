package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** AUTOMATIC QUERY REWRITE to materialized aggregates — the
  * incremental-view-maintenance READ side as a Catalyst optimizer rule
  * ([[graft.operators.MaterializedAgg]] is the write side): a query
  * that aggregates the BASE table with exactly a registered view's
  * grouping keys and only its covered algebraic measures is rewritten,
  * transparently, to read the (tiny) partial-aggregate table instead —
  * the classic warehouse feature where a dashboard's
  * `GROUP BY k → count/sum/min/max/avg` never touches the 100 TB fact
  * table because a per-ingest-batch rollup already holds the answer.
  *
  * REGISTRATION is session-dynamic ([[enable]]/[[disable]]): the rule
  * itself is injected once via [[GraftExtensions]] and no-ops at zero
  * cost while the registry is empty. Matching is deliberately STRICT —
  * a rewrite that fires too eagerly is a correctness bug factory:
  *
  *  - the aggregate's child must be a bare scan of the registered base
  *    path (optionally under a pure-attribute Project — column
  *    pruning's shape); ANY filter disables the rewrite (partial rows
  *    cannot answer filtered questions);
  *  - grouping must be exactly the registered key set;
  *  - every output is a group key, `count(1)`/`count(*)`,
  *    or `count/sum/min/max/avg(v)` of a registered value column —
  *    DISTINCT, agg filters, and decimal sums (whose result precision
  *    grows per re-aggregation, so the rewritten type would not match)
  *    all bail;
  *  - every rewritten column's type must equal the original's exactly.
  *
  * The replacement plan is [[graft.operators.MaterializedAgg.read]]'s
  * analyzed plan (snapshot-aware: manifests, retention, time-travel
  * all apply) under a Project that re-aliases its columns to the
  * ORIGINAL output exprIds — parents of the aggregate keep resolving
  * untouched. Exactness: count/min/max merge exactly; SUM/AVG of
  * floating-point re-associate across batch partials (the
  * MaterializedAgg exactness note) — feed integer units for
  * hash-stable sums. */
object MatAggRewrite {

  final case class Registration(aggPath: String, keys: Seq[String],
                                values: Seq[String])

  private val registry = TrieMap.empty[String, Registration]

  private def canonical(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Route matching base-table aggregates of `basePath` to the
    * materialized table at `aggPath` (built with these keys/values). */
  def enable(basePath: String, aggPath: String, keys: Seq[String],
             values: Seq[String]): Unit =
    registry.put(canonical(basePath), Registration(aggPath, keys, values))

  def disable(basePath: String): Unit = registry.remove(canonical(basePath))

  def clear(): Unit = registry.clear()

  private[graft] def registration(child: LogicalPlan): Option[Registration] = {
    val rel = child match {
      case l: LogicalRelation => Some(l)
      case Project(ps, l: LogicalRelation)
          if ps.forall(_.isInstanceOf[AttributeReference]) => Some(l)
      case _ => None
    }
    rel.flatMap(_.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.toSeq match {
          case Seq(root) => registry.get(canonical(root.toString))
          case _ => None // multi-root scans never match
        }
      case _ => None
    })
  }
}

class MatAggRewrite(session: SparkSession) extends Rule[LogicalPlan] {
  import MatAggRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        registration(child).flatMap(tryRewrite(agg, groupExprs, aggExprs, _))
          .getOrElse(agg)
    }

  /** None = any part of the query is outside the view's algebra; the
    * aggregate stands and scans the base table as written.
    *
    * Two grains rewrite. EXACT grain (grouping = the view's key set)
    * becomes a bare Project over the read plan. A SUBSET grain
    * (grouping ⊂ keys, the rollup-dashboard shape — including the
    * GLOBAL aggregate) re-aggregates the read plan's merged partials:
    * count → sum of counts (coalesced to 0 so a global count over an
    * empty table stays 0, not NULL), sum → sum of sums, min/max →
    * min/max of minima/maxima, avg → guarded sum-of-sums over
    * sum-of-counts — all algebraic, so the coarser answer is exact
    * wherever the fine one was. */
  private def tryRewrite(agg: Aggregate, groupExprs: Seq[Expression],
                         aggExprs: Seq[NamedExpression],
                         reg: Registration): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, Divide, EqualTo, If}
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val keyNames = groupExprs.map {
      case a: AttributeReference => a.name
      case _ => return None // computed grouping keys: not the view's grain
    }
    val exact = keyNames.toSet == reg.keys.toSet
    if (!exact && !keyNames.toSet.subsetOf(reg.keys.toSet)) return None
    val readPlan = graft.operators.MaterializedAgg
      .read(session, reg.aggPath).queryExecution.analyzed
    def outCol(name: String): Option[Attribute] =
      readPlan.output.find(_.name == name)
    def typed(src: NamedExpression)(e: Expression): Option[NamedExpression] =
      // type equality is the guard against silent re-agg widening
      if (e.dataType == src.dataType) Some(Alias(e, src.name)(exprId = src.exprId))
      else None
    def valueCol(e: Expression): Option[String] = e match {
      case a: AttributeReference
          if reg.values.contains(a.name) &&
            !a.dataType.isInstanceOf[DecimalType] => Some(a.name)
      case _ => None
    }
    def sumOf(col: String): Option[Expression] =
      outCol(col).map(a => Sum(a).toAggregateExpression())
    def sumCount(col: String): Option[Expression] =
      sumOf(col).map(s => Coalesce(Seq(s, Literal(0L, LongType))))
    // per original output: the exact-grain column read, or the
    // subset-grain re-aggregation over it
    def rewriteOne(src: NamedExpression): Option[NamedExpression] = src match {
      case a: AttributeReference if keyNames.contains(a.name) =>
        outCol(a.name).flatMap(typed(a))
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        def re(col: String, f: Attribute => Expression): Option[NamedExpression] =
          outCol(col).flatMap(a => typed(al)(
            if (exact) a else f(a)))
        ae.aggregateFunction match {
          case c: Count if c.children == Seq(Literal(1)) =>
            if (exact) outCol("n_rows").flatMap(typed(al))
            else sumCount("n_rows").flatMap(typed(al))
          case c: Count => c.children match {
            case Seq(e) => valueCol(e).flatMap { v =>
              if (exact) outCol(s"${v}_cnt").flatMap(typed(al))
              else sumCount(s"${v}_cnt").flatMap(typed(al))
            }
            case _ => None
          }
          case s: Sum => valueCol(s.child).flatMap(v =>
            re(s"${v}_sum", a => Sum(a).toAggregateExpression()))
          case m: Min => valueCol(m.child).flatMap(v =>
            re(s"${v}_min", a => Min(a).toAggregateExpression()))
          case m: Max => valueCol(m.child).flatMap(v =>
            re(s"${v}_max", a => Max(a).toAggregateExpression()))
          case a: Average => valueCol(a.child).flatMap { v =>
            if (exact) outCol(s"${v}_avg").flatMap(typed(al))
            else (sumOf(s"${v}_sum"), sumOf(s"${v}_cnt")) match {
              case (Some(ss), Some(sc)) =>
                // avg = Σsum / Σcnt, NULL when no non-null values — an
                // If guard, not bare division (ANSI div-by-zero)
                typed(al)(If(EqualTo(sc, Literal(0L, LongType)),
                  Literal(null, DoubleType),
                  Divide(Cast(ss, DoubleType), Cast(sc, DoubleType))))
              case _ => None
            }
          }
          case _ => None
        }
      case _ => None
    }
    val rewritten = aggExprs.map(rewriteOne)
    if (rewritten.exists(_.isEmpty)) None
    else if (exact) Some(Project(rewritten.map(_.get), readPlan))
    else {
      val newKeys = keyNames.flatMap(outCol)
      if (newKeys.length != keyNames.length) None
      else Some(Aggregate(newKeys, rewritten.map(_.get), readPlan))
    }
  }
}
