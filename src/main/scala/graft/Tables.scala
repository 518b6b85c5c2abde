package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader over the driver-provided testdata layout
  * (`<sfDir>/<name>.parquet`, see TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] reads through here so the scan
  * path is uniform: plain `spark.read.parquet` keeps Catalyst's predicate
  * pushdown + column pruning intact (the scan node must show
  * `PushedFilters`/`ReadSchema` for whatever the query actually touches).
  * At 100 TB the same call reads a partitioned directory tree instead of
  * a single file — nothing else in the library changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
