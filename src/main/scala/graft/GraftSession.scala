package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory — the ONLY place session config lives.
  * Verify.main and Bench.main both route through here so local and
  * driver runs use identical settings.
  *
  * Local-mode knobs mirror what a cluster deployment would set
  * per-executor:
  *
  *  - `shuffle.partitions` = cores (not 200): at sf0.1 a 32-way shuffle
  *    keeps every partition comfortably in memory; on a 1000-executor
  *    cluster the same code runs with AQE coalescing from a larger
  *    initial number, so we leave AQE on here too.
  *  - AQE enabled: runtime broadcast-join conversion + skew-join
  *    splitting are the 100 TB safety net for skewed keys.
  *  - UTC session timezone: required for DuckDB-oracle parity on
  *    timestamp columns.
  *
  * Note: `getOrCreate()` reuses any pre-existing session in the JVM
  * (master/static configs are then ignored). That is intentional for
  * the test suite (one shared session across specs); entrypoints run
  * in fresh JVMs (`fork := true`) so they always get these settings.
  */
object GraftSession {
  /** Core count: SPARK_GRAFT_CPUS (driver contract) > availableProcessors. */
  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  def local(cores: Int = defaultCores): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE re-plan (coalesce tiny shuffles, convert joins) INSIDE
      // plans that feed/read the DataFrame cache — off by default, which
      // leaves iterative cached loops (connectedComponents) running
      // every round's shuffles at the static partition count however
      // small the frontier gets
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The testdata writer stores `events.ts` as parquet
      // TIMESTAMP(NANOS), which Spark refuses to read by default
      // ([PARQUET_TYPE_ILLEGAL]). Read nanos as LongType; Tables
      // converts back to a proper TimestampType losslessly (the data
      // is microsecond-aligned).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Catalyst extensions: box-PIP→range-predicate optimizer rule +
      // the SQL-callable graft_pip function (graft.plans).
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // catalog tables (bucketed-join demos) live under the per-PROCESS
      // scratch root: a fixed /tmp path is a cross-JVM race — a fresh
      // JVM's in-memory catalog doesn't know the table but the old
      // run's directory exists, and saveAsTable dies with
      // LOCATION_ALREADY_EXISTS (same lesson as TempDirs itself)
      .config("spark.sql.warehouse.dir", TempDirs.path("warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
