package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the named query catalogs; names embed the
  * SURVEY.md §2 operator ids they cover (e.g. "a5_f1_classify_keys"
  * covers A5 and F1). EVERY query has a DuckDB oracle in `oracleSql`:
  * SQL-expressible queries get the equivalent SQL over the shared
  * parquet tables; heuristic/hash-based pipeline operators (MinHash,
  * SimHash, LSH, multimodal) run on planted deterministic fixtures
  * ([[graft.queries.PlantedFixtures]]) with hand-derived literal
  * VALUES oracles, and their statistical properties (LSH recall vs
  * exact brute force) are additionally gated in ScalaTest. The same
  * operators' sf-scale timing is benched via
  * [[graft.queries.ScaleWorkloads]] (Bench-only `sx*` entries).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The
    * reference's top-amenities pipeline (readme.md:246-249) shape. */
  def entry(spark: SparkSession): DataFrame =
    queries("o1_o2_top_groups")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.defs ++
      graft.queries.PipelineQueries.defs ++
      graft.queries.OsmQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.OsmQueries.oracles
}
