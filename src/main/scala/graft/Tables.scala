package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize `ts` to session-zoned TimestampType regardless of the
    * testdata's parquet physical encoding, which has changed across
    * driver rounds: TIMESTAMP(NANOS) (arrives as LongType nanos under
    * spark.sql.legacy.parquet.nanosAsLong), TIMESTAMP_NTZ
    * (isAdjustedToUTC=false µs), or TIMESTAMP_LTZ (already TimestampType).
    * Every time-typed operator downstream (`unix_micros`, watermarks,
    * `session_window`) requires TimestampType, so the conversion lives
    * here — one chokepoint instead of per-query guards.
    *
    * - LongType nanos: integer division (`div`, not `/` — a double
    *   round-trip loses precision at ~1.7e18); testdata is µs-aligned
    *   so exact, bit-for-bit with DuckDB's TIMESTAMP_NS read.
    * - TIMESTAMP_NTZ: `to_timestamp_ltz` re-interprets the wall-clock
    *   in the session zone; GraftSession pins the session to UTC, so
    *   the micros value is unchanged and DuckDB parity is exact.
    */
  def normalizeTs(df: DataFrame, col0: String = "ts"): DataFrame =
    df.schema(col0).dataType match {
      case LongType =>
        df.withColumn(col0, timestamp_micros(expr(s"$col0 div 1000")))
      case _: TimestampNTZType =>
        df.withColumn(col0, to_timestamp_ltz(col(col0)))
      case _ => df
    }
}
