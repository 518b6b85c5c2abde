package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory. Local-mode knobs mirror what a cluster
  * deployment would set per-executor:
  *
  *  - `shuffle.partitions` = cores (not 200): at sf0.1 a 32-way shuffle
  *    keeps every partition comfortably in memory; on a 1000-executor
  *    cluster the same code runs with AQE coalescing from a larger
  *    initial number, so we leave AQE on here too.
  *  - AQE enabled: runtime broadcast-join conversion + skew-join
  *    splitting are the 100 TB safety net for skewed keys.
  *  - UTC session timezone: required for DuckDB-oracle parity on
  *    timestamp columns.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
