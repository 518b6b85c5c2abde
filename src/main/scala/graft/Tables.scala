package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader over the driver-provided testdata layout
  * (`<sfDir>/<name>.parquet`, see TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] reads through here so the scan
  * path is uniform: plain `spark.read.parquet` keeps Catalyst's predicate
  * pushdown + column pruning intact (the scan node must show
  * `PushedFilters`/`ReadSchema` for whatever the query actually touches).
  * At 100 TB the same call reads a partitioned directory tree instead of
  * a single file — nothing else in the library changes.
  *
  * Note: `documents` and `embeddings` exist in every sf dir even though
  * TESTDATA.md's table list omits them (verified on disk; they back the
  * dedup/ANN/text-analysis queries).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS); with
    // spark.sql.legacy.parquet.nanosAsLong it arrives as LongType
    // nanos-since-epoch. Convert to TimestampType via integer division
    // (`div`, not `/` — a double round-trip would lose precision at
    // ~1.7e18). The testdata is µs-aligned so this is exact and
    // matches DuckDB's native TIMESTAMP_NS read bit-for-bit.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
