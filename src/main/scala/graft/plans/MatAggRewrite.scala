package graft.plans

import scala.collection.concurrent.TrieMap
import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Expression, NamedExpression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** AUTOMATIC QUERY REWRITE to materialized aggregates — the
  * incremental-view-maintenance READ side as a Catalyst optimizer rule
  * ([[graft.operators.MaterializedAgg]] is the write side): a query
  * that aggregates the BASE table with a registered view's grouping
  * keys (or a subset of them) and only its covered algebraic measures
  * is rewritten, transparently, to read the (tiny) partial-aggregate
  * table instead — the classic warehouse feature where a dashboard's
  * `GROUP BY k → count/sum/min/max/avg` never touches the 100 TB fact
  * table because a per-ingest-batch rollup already holds the answer.
  *
  * REGISTRATION is per-SparkSession ([[enable]]/[[disable]] — parallel
  * sessions cannot clobber or observe each other's registrations; the
  * map is weak-keyed so a dropped session drops its registry). The rule
  * itself is injected once via [[GraftExtensions]] and no-ops at zero
  * cost while the session's registry is empty or absent. Registrations
  * are keyed by the FULLY-QUALIFIED table URI (scheme + authority —
  * `s3a://bucketA/warehouse/t` and `file:/warehouse/t` are different
  * tables), matched against the scan's equally-qualified root paths.
  *
  * Matching is deliberately STRICT — a rewrite that fires too eagerly
  * is a correctness bug factory:
  *
  *  - the aggregate's child must be a scan of the registered base
  *    table (optionally under pure-attribute Projects — column
  *    pruning's shape) with at most KEY-ONLY deterministic filters: a
  *    predicate whose references are all registered KEY columns is
  *    subsumed by re-applying it to the partial rows (each partial row
  *    carries its full key tuple, so filtering partials by a key
  *    predicate is exactly filtering base rows by it); any predicate
  *    touching a value column, a non-registered column, or a subquery
  *    disables the rewrite;
  *  - grouping keys must be a subset of the registered key set (exact
  *    grain reads the rollup directly; a coarser grain — including the
  *    global aggregate — re-aggregates the partials);
  *  - every output is a group key, `count(1)`/`count(*)`,
  *    or `count/sum/min/max/avg(v)` of a registered value column —
  *    DISTINCT, agg filters, and decimal sums (whose result precision
  *    grows per re-aggregation, so the rewritten type would not match)
  *    all bail;
  *  - every rewritten column's type must equal the original's exactly.
  *
  * SNAPSHOT-GOVERNED base tables compose: [[graft.operators.Snapshot
  * .read]] resolves an enabled table to a multi-root
  * `parquet(<base>/batch_id=b1, …)` scan, and the rule recognizes that
  * shape — all roots parse as `batch_id=<id>` dirs under ONE
  * registered base — and fires ONLY when the scanned batch-id set
  * EQUALS the materialized table's own live batch-id set (its
  * manifest when snapshot-enabled, directory listing otherwise). Set
  * equality is the freshness contract, and it must be equality in both
  * directions: a base batch the rollup has not refreshed would serve a
  * STALE answer, and a refreshed batch the scan excludes (time-travel
  * `readAt`, base-side retention not yet mirrored) would inject
  * PHANTOM rows. The maintenance pattern that keeps the gate open is
  * id-mirroring: `MaterializedAgg.build` from the base's initial
  * (batch -1) content, then `appendBatch(batchRows, …, batchId = N)`
  * for each base batch N — exactly the `st9` streaming shape. Any
  * divergence (unrefreshed append, pinned read, one-sided retention or
  * compaction) stands down to the base scan — conservative, never
  * wrong. Bare-directory (non-governed) registrations carry no batch
  * structure to compare, so their freshness is the caller's contract:
  * refresh the rollup before the base changes, or disable first.
  *
  * Any failure while planning the replacement (materialized table
  * deleted, corrupt, unreachable) stands down to the base scan rather
  * than failing the query — a transparent optimization must never be a
  * query-breaking dependency on a side table.
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

  // Per-SESSION registries: identity-keyed and weak, so parallel
  // sessions (or parallel test suites) cannot clobber one another and
  // a discarded session never pins its registrations in the JVM.
  private val registries =
    new java.util.WeakHashMap[SparkSession, TrieMap[String, Registration]]()

  private def registryFor(s: SparkSession,
      create: Boolean): Option[TrieMap[String, Registration]] =
    registries.synchronized {
      Option(registries.get(s)).orElse {
        if (!create) None
        else {
          val r = TrieMap.empty[String, Registration]
          registries.put(s, r)
          Some(r)
        }
      }
    }

  /** Fully-qualified URI (scheme + authority + path) — the key under
    * which tables register and against which scan roots compare, so
    * same-pathed tables on different filesystems never collide. */
  private def canonical(s: SparkSession, p: String): String = {
    val path = new org.apache.hadoop.fs.Path(p)
    Try {
      // render scheme://authority/path explicitly: URI.toString prints
      // an ABSENT authority as `file:/x` but an EMPTY one as
      // `file:///x`, so the same qualified location can stringify two
      // ways depending on how the input was spelled
      val uri = path.getFileSystem(s.sessionState.newHadoopConf())
        .makeQualified(path).toUri
      s"${uri.getScheme}://${Option(uri.getAuthority).getOrElse("")}${uri.getPath}"
    }.getOrElse(path.toUri.toString)
  }

  /** Route matching base-table aggregates of `basePath` to the
    * materialized table at `aggPath` (built with these keys/values),
    * for queries planned by THIS session. Freshness: snapshot-governed
    * bases are gated per query by batch-set equality (class scaladoc);
    * a bare-directory base has no batch structure to compare, so the
    * caller owns keeping the rollup refreshed while registered. */
  def enable(s: SparkSession, basePath: String, aggPath: String,
             keys: Seq[String], values: Seq[String]): Unit =
    registryFor(s, create = true).get
      .put(canonical(s, basePath), Registration(aggPath, keys, values))

  def disable(s: SparkSession, basePath: String): Unit =
    registryFor(s, create = false).foreach(_.remove(canonical(s, basePath)))

  def clear(s: SparkSession): Unit =
    registryFor(s, create = false).foreach(_.clear())

  private val BatchDir = """batch_id=(-?\d+)""".r

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** Peel pure-attribute Projects and deterministic, subquery-free
    * Filters above the relation, collecting the filter conjuncts. */
  private def peel(p: LogicalPlan): Option[(LogicalRelation, Seq[Expression])] =
    p match {
      case l: LogicalRelation => Some((l, Nil))
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        peel(c)
      case Filter(cond, c)
          if cond.deterministic &&
            !cond.exists(_.isInstanceOf[PlanExpression[_]]) =>
        peel(c).map { case (l, cs) => (l, splitConj(cond) ++ cs) }
      case _ => None
    }

  /** Match `child` against this session's registrations: a bare scan
    * of a registered directory (scannedBatches = None), or a
    * [[graft.operators.Snapshot]] batch-resolved scan of one
    * (scannedBatches = the `batch_id=` ids of its roots). Collected
    * filter conjuncts ride along for key-subsumption screening. */
  private[graft] def matchChild(s: SparkSession, child: LogicalPlan)
      : Option[(Registration, Seq[Expression], Option[Set[Long]])] =
    registryFor(s, create = false).filter(_.nonEmpty).flatMap { reg =>
      peel(child).flatMap { case (rel, conds) =>
        rel.relation match {
          case fs: HadoopFsRelation =>
            val roots = fs.location.rootPaths.toSeq
            val bare = roots match {
              case Seq(root) => reg.get(canonical(s, root.toString))
                .map(r => (r, conds, None: Option[Set[Long]]))
              case _ => None
            }
            bare.orElse {
              val parsed = roots.map { r =>
                r.getName match {
                  case BatchDir(id) => Option(r.getParent)
                    .map(p => (canonical(s, p.toString), id.toLong))
                  case _ => None
                }
              }
              if (parsed.isEmpty || parsed.exists(_.isEmpty)) None
              else parsed.flatten.map(_._1).distinct match {
                case Seq(base) => reg.get(base)
                  .map(r => (r, conds, Some(parsed.flatten.map(_._2).toSet)))
                case _ => None // roots under different bases
              }
            }
          case _ => None
        }
      }
    }
}

class MatAggRewrite(session: SparkSession) extends Rule[LogicalPlan] {
  import MatAggRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registryFor(session, create = false).forall(_.isEmpty)) plan
    else plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        matchChild(session, child).flatMap { case (reg, conds, scanned) =>
          // a planning failure (agg table gone/corrupt) or a batch-set
          // mismatch stands down — never fails the query. The
          // freshness gate's filesystem IO is DEFERRED inside
          // tryRewrite, behind its pure shape checks (r16 advice): a
          // query that stands down on grain/filter shape costs no
          // manifest listing at optimization time.
          Try(tryRewrite(agg, groupExprs, aggExprs, conds, reg, scanned))
            .toOption.flatten
        }.getOrElse(agg)
    }

  /** Freshness gate for snapshot-governed bases: scanned batch ids
    * must EQUAL the materialized table's live ids (class scaladoc —
    * a missing id is staleness, an extra one is phantom rows). Bare
    * scans carry no batch set and pass by contract. */
  private def fresh(reg: Registration, scanned: Option[Set[Long]]): Boolean =
    scanned.forall(ids =>
      Try(graft.operators.Snapshot.liveBatches(session, reg.aggPath).toSet)
        .toOption.contains(ids))

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
    * wherever the fine one was. KEY-ONLY filters (references all in
    * the registered key set, types matching) re-apply to the partial
    * rows below either grain; anything else already failed matching. */
  private def tryRewrite(agg: Aggregate, groupExprs: Seq[Expression],
                         aggExprs: Seq[NamedExpression],
                         conds: Seq[Expression],
                         reg: Registration,
                         scanned: Option[Set[Long]]): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, Divide, EqualTo, If}
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val keyNames = groupExprs.map {
      case a: AttributeReference => a.name
      case _ => return None // computed grouping keys: not the view's grain
    }
    val exact = keyNames.toSet == reg.keys.toSet
    if (!exact && !keyNames.toSet.subsetOf(reg.keys.toSet)) return None
    // filters must reference registered KEY columns only
    if (!conds.forall(_.references.forall(a => reg.keys.contains(a.name))))
      return None
    // pure pre-screen of the aggregate shapes: the full rewrite needs
    // the agg table's schema, but UNSUPPORTED shapes (DISTINCT,
    // FILTER-clause aggs, functions outside the algebraic five) are
    // knowable without it and must not pay any IO to stand down
    val supportable = aggExprs.forall {
      case a: AttributeReference => keyNames.contains(a.name)
      case Alias(ae: AggregateExpression, _) =>
        !ae.isDistinct && ae.filter.isEmpty &&
          (ae.aggregateFunction match {
            case _: Count | _: Sum | _: Min | _: Max | _: Average => true
            case _ => false
          })
      case _ => false
    }
    if (!supportable) return None
    // only NOW — after every pure shape check — pay the freshness
    // gate's manifest/directory listing and the agg table's read
    // analysis (r16 advice: on a remote object store these added
    // per-query planning latency even for queries that stand down)
    if (!fresh(reg, scanned)) return None
    val readPlan = graft.operators.MaterializedAgg
      .read(session, reg.aggPath).queryExecution.analyzed
    def outCol(name: String): Option[Attribute] =
      readPlan.output.find(_.name == name)
    // remap a base-scan predicate onto the partial table's key
    // attributes — same name, same type, or stand down
    def remapCond(e: Expression): Option[Expression] = {
      var ok = true
      val out = e.transformUp {
        case a: AttributeReference =>
          outCol(a.name).filter(_.dataType == a.dataType) match {
            case Some(o) => o
            case None => ok = false; a
          }
      }
      if (ok) Some(out) else None
    }
    val remapped = conds.map(remapCond)
    if (remapped.exists(_.isEmpty)) return None
    val source: LogicalPlan =
      if (remapped.isEmpty) readPlan
      else Filter(remapped.flatten.reduce(And), readPlan)
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
    else if (exact) Some(Project(rewritten.map(_.get), source))
    else {
      val newKeys = keyNames.flatMap(outCol)
      if (newKeys.length != keyNames.length) None
      else Some(Aggregate(newKeys, rewritten.map(_.get), source))
    }
  }
}
