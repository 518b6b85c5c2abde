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
    normalizeTimestamps(spark.read.parquet(s"$sfDir/$name.parquet"))
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
        df.withColumn(col0, timestamp_micros(expr(s"`$col0` div 1000")))
      case _: TimestampNTZType =>
        df.withColumn(col0, to_timestamp_ltz(col(col0)))
      case _ => df
    }

  /** [[normalizeTs]] generalized over the whole schema, applied to
    * EVERY table read (not just `events` by name): any TIMESTAMP_NTZ
    * column re-anchors to the (UTC-pinned) session zone, and any
    * LongType column NAMED like a timestamp (`ts`, `*_ts`, `ts_*` —
    * the nanosAsLong read makes TIMESTAMP(NANOS) indistinguishable
    * from a genuine long by Spark type alone, so a name contract is
    * the only safe trigger; `event_id` must never be "normalized")
    * converts from nanos. A future testdata round that adds a second
    * time column (e.g. `orders.order_ts`) flows through the same
    * chokepoint instead of silently missing it — TablesSpec pins the
    * multi-column case. */
  def normalizeTimestamps(df: DataFrame): DataFrame = {
    val tsNamed = (n: String) =>
      n == "ts" || n.endsWith("_ts") || n.startsWith("ts_")
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: TimestampNTZType => normalizeTs(d, f.name)
        case LongType if tsNamed(f.name) => normalizeTs(d, f.name)
        case _ => d
      }
    }
  }
}
