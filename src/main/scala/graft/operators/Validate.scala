package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table, compiled into
  * the minimal set of distributed jobs (the reference validates its
  * ingest by hand-written audit queries — `audit.py`'s per-field
  * counts and the "problem chars / lower_colon" tag tallies,
  * ProjectCodeUsed/audit.py — this is that idea as a reusable,
  * declarative operator).
  *
  * Compilation strategy, sized for 100 TB:
  *  - ALL row-local checks (not-null, range, accepted-values, regex,
  *    arbitrary predicate) fuse into ONE aggregate pass — one scan of
  *    the table regardless of how many checks are declared, each check
  *    a codegen'd `sum(when(violation, 1))` column. The wide 1-row agg
  *    result is then unpivoted to the per-check report rows (an Expand
  *    over ONE row — free).
  *  - `Unique` needs its own hash aggregate on the checked key (one
  *    shuffle of the key columns only, counted not materialized).
  *  - `ForeignKey` is one left-anti join of the child's DISTINCT keys
  *    against the parent's keys (both sides pruned to the key columns;
  *    SQL FK semantics — NULL child keys pass vacuously).
  *
  * The report is one row per check — bounded by #checks, never by data
  * size. Violation semantics: for every kind except `NotNull`, a NULL
  * value is a violation (an expectation on a column you didn't
  * null-check should not silently pass on missing data); declare the
  * weaker contract by pairing with an explicit filter if nulls are
  * expected.
  */
object Validate {

  sealed trait Check { def name: String }

  /** Column must be non-null. */
  final case class NotNull(name: String, col: String) extends Check

  /** lo <= col <= hi (inclusive both ends); NULL violates. */
  final case class InRange(name: String, col: String,
      lo: Double, hi: Double) extends Check

  /** Column value must be one of `values`; NULL violates. */
  final case class AcceptedValues(name: String, col: String,
      values: Seq[String]) extends Check

  /** Column must match the (Java) regex in full-find semantics
    * (`rlike`); NULL violates. */
  final case class MatchesRegex(name: String, col: String,
      pattern: String) extends Check

  /** Arbitrary boolean expectation; rows where it is false OR NULL
    * violate. */
  final case class Expect(name: String, expectation: Column) extends Check

  /** No two rows share a value tuple of `cols`. Violations = excess
    * duplicates (total rows − distinct tuples), so a clean table
    * reports 0 and each extra copy counts once. */
  final case class Unique(name: String, cols: Seq[String]) extends Check

  /** TABLE-level freshness: max(tsCol) must be at or after
    * `noOlderThan` (an explicit reference instant — never wall-clock,
    * which would make the suite nondeterministic). Violations: 1 when
    * stale or empty/all-null, else 0. */
  final case class Freshness(name: String, tsCol: String,
      noOlderThan: java.sql.Timestamp) extends Check

  /** Every non-null child key tuple exists in the parent. Violations =
    * DISTINCT orphaned child tuples (metadata-sized, not row-count-
    * sized: a billion rows pointing at one missing parent is ONE
    * broken relationship — and counting distinct keys keeps the anti
    * join's probe side deduplicated before the shuffle). */
  final case class ForeignKey(name: String, cols: Seq[String],
      parent: DataFrame, parentCols: Seq[String]) extends Check

  private def violation(c: Check): Column = c match {
    case NotNull(_, col0)        => col(col0).isNull
    case InRange(_, col0, lo, hi) =>
      !(col(col0) >= lo && col(col0) <= hi) || col(col0).isNull
    case AcceptedValues(_, col0, vs) =>
      !col(col0).isInCollection(vs) || col(col0).isNull
    case MatchesRegex(_, col0, p) =>
      !col(col0).rlike(p) || col(col0).isNull
    case Expect(_, e)            => !e || e.isNull
    case _ => throw new IllegalArgumentException(s"not row-local: $c")
  }

  private def kindOf(c: Check): String = c match {
    case _: NotNull        => "not_null"
    case _: InRange        => "in_range"
    case _: AcceptedValues => "accepted_values"
    case _: MatchesRegex   => "matches_regex"
    case _: Expect         => "expect"
    case _: Unique         => "unique"
    case _: ForeignKey     => "foreign_key"
    case _: Freshness      => "freshness"
  }

  /** Row-level annotation — the QUARANTINE-ROUTING form of the suite:
    * every ROW-LOCAL check evaluates inline (same fused, codegen'd
    * expressions as [[run]], zero extra scans or shuffles) and each
    * row gains `violations` (csv of failed check names, declaration
    * order) and `passed`. Callers split good/bad with a filter — in a
    * `foreachBatch` ingest loop, cache the annotated batch and write
    * both routes from the one evaluation. `Unique`/`ForeignKey` are
    * table-level facts, not row properties — declaring one here fails
    * loudly rather than silently skipping it. */
  def annotate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    val tableLevel = checks.collect {
      case c: Unique => c.name
      case c: ForeignKey => c.name
      case c: Freshness => c.name
    }
    require(tableLevel.isEmpty, "annotate takes row-local checks only; " +
      s"table-level: ${tableLevel.mkString(", ")}")
    val names = checks.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate check names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    val flags = checks.map(c => when(violation(c), lit(c.name)))
    df.withColumn("violations",
        concat_ws(",", flags: _*))
      .withColumn("passed", col("violations") === "")
  }

  /** Run all checks; returns the report
    * (check_name, kind, n_rows, n_violations, passed),
    * one row per check, ordered by check_name. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    val names = checks.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate check names: ${names.diff(names.distinct).distinct.mkString(", ")}")

    val spark = df.sparkSession
    import spark.implicits._
    val kinds = checks.map(c => (c.name, kindOf(c))).toDF("check_name", "kind")

    val rowLocal = checks.filter {
      case _: Unique | _: ForeignKey | _: Freshness => false
      case _                         => true
    }
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    if (rowLocal.nonEmpty) {
      // one fused scan: count(*) + one conditional sum per check.
      // coalesce: sum() over ZERO rows is NULL, and a NULL violation
      // count makes `passed` NULL too — an empty ingest batch must
      // report 0 violations / passed=true, not vanish from both sides
      // of a passed/!passed gate.
      val aggs = count(lit(1)).as("__n_rows") +: rowLocal.map(c =>
        coalesce(sum(when(violation(c), 1L).otherwise(0L)), lit(0L)).as(c.name))
      val wide = df.agg(aggs.head, aggs.tail: _*)
      parts += wide
        .unpivot(Array(col("__n_rows")), rowLocal.map(c => col(c.name)).toArray,
          "check_name", "n_violations")
        .select(col("check_name"), col("__n_rows").as("n_rows"),
          col("n_violations"))
    }

    checks.foreach {
      case Unique(name, cols0) =>
        val g = df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("__cnt"))
        parts += g.agg(
          coalesce(sum(col("__cnt")), lit(0L)).as("n_rows"),
          coalesce(sum(col("__cnt")) - count(lit(1)), lit(0L)).as("n_violations"))
          .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))
      case Freshness(name, tsCol0, t0) =>
        parts += df.agg(count(lit(1)).as("n_rows"),
            max(col(tsCol0)).as("__mx"))
          .select(lit(name).as("check_name"), col("n_rows"),
            when(col("__mx").isNull || col("__mx") < lit(t0), 1L)
              .otherwise(0L).as("n_violations"))
      case ForeignKey(name, cols0, parent, pCols) =>
        require(cols0.size == pCols.size, s"$name: key arity mismatch")
        val childKeys = df.select(cols0.map(col): _*)
          .na.drop("any").distinct()
        val parentKeys = parent.select(pCols.map(col): _*)
        val cond = cols0.zip(pCols).map { case (c, p) =>
          childKeys(c) === parentKeys(p)
        }.reduce(_ && _)
        val orphans = childKeys.join(parentKeys, cond, "left_anti")
        parts += df.agg(count(lit(1)).as("n_rows"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_violations")))
          .select(lit(name).as("check_name"), col("n_rows"),
            col("n_violations"))
      case _ => ()
    }

    parts.reduce(_ unionByName _)
      .join(broadcast(kinds), "check_name")
      .select(col("check_name"), col("kind"), col("n_rows"),
        col("n_violations"), (col("n_violations") === 0L).as("passed"))
      .orderBy("check_name")
  }
}
