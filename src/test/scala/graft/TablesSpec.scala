package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical-type contract for the testdata's `events.ts`.
  *
  * The driver-generated parquet has shipped `ts` under three different
  * physical encodings across rounds — TIMESTAMP(NANOS) (which arrives
  * as LongType nanos under spark.sql.legacy.parquet.nanosAsLong),
  * TIMESTAMP_NTZ (isAdjustedToUTC=false µs), and TIMESTAMP_LTZ — and
  * each silent switch broke every time-typed operator downstream
  * (r9 lost iv1/j4/w3/st4 to the NTZ flip). This spec is the
  * regression net: [[Tables.normalizeTs]] must yield session-zoned
  * TimestampType with IDENTICAL micros for all three encodings, and
  * the bare `spark.read.parquet` passthrough must demonstrably NOT
  * satisfy that contract (so a future encoding change fails here
  * first, loudly, instead of inside four unrelated queries).
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2024-03-01T12:34:56.789012Z — µs-aligned like the testdata
  private val micros = 1709296496789012L

  /** Writes a 1-row events.parquet fixture with the given `ts`
    * encoding, loads it THROUGH Tables, returns (type, unix_micros). */
  private def roundTrip(tag: String, fixture: DataFrame): (DataType, Long) = {
    val dir = TempDirs.path(s"tables-spec/$tag")
    fixture.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Tables(spark, dir, "events")
    (out.schema("ts").dataType,
      out.select(unix_micros(col("ts")).as("us")).head().getLong(0))
  }

  test("INT64 nanos → TimestampType, µs-exact") {
    // a plain LongType column reads back exactly as TIMESTAMP(NANOS)
    // does under nanosAsLong: LongType nanos-since-epoch
    val (dt, got) = roundTrip("nanos", Seq(micros * 1000L).toDF("ts"))
    dt shouldBe TimestampType
    got shouldBe micros
  }

  test("TIMESTAMP_NTZ → TimestampType, µs-exact (session tz pinned UTC)") {
    val (dt, got) = roundTrip("ntz", Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    dt shouldBe TimestampType
    got shouldBe micros
  }

  test("TIMESTAMP_LTZ passes through, µs-exact") {
    val (dt, got) = roundTrip("ltz", Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts")))
    dt shouldBe TimestampType
    got shouldBe micros
  }

  test("testdata schema contract: the columns and types the operators assume") {
    // the other silent-breakage surface: a driver-side type flip in
    // documents/embeddings/events would strand dozens of queries the
    // way the r9 ts flip stranded four — pin the load-bearing columns
    val docs = Tables(spark, sf, "documents")
    docs.schema("doc_id").dataType shouldBe LongType
    docs.schema("text").dataType shouldBe StringType
    docs.schema("lang").dataType shouldBe StringType
    docs.schema("source").dataType shouldBe StringType
    docs.schema("n_chars").dataType shouldBe LongType
    val embs = Tables(spark, sf, "embeddings")
    embs.schema("vec_id").dataType shouldBe LongType
    // the native vector expressions codegen against float arrays
    embs.schema("embedding").dataType shouldBe ArrayType(FloatType, containsNull = true)
    val ev = Tables(spark, sf, "events")
    ev.schema("event_id").dataType shouldBe LongType
    ev.schema("ts").dataType shouldBe TimestampType
    ev.schema("user_id").dataType shouldBe LongType
    ev.schema("event_type").dataType shouldBe StringType
    ev.schema("value").dataType shouldBe DoubleType
    ev.schema("props").dataType shouldBe StringType
  }

  test("normalizeTimestamps covers EVERY time-typed column, not just events.ts by name") {
    // the r10 verdict's generality gap: a second timestamp column (e.g.
    // a future orders.order_ts) must flow through the same chokepoint.
    // Mixed encodings in one table: NTZ (by type), nanos-long (by the
    // ts-name contract), and a genuine long id that must NOT convert.
    val dir = TempDirs.path("tables-spec/multi")
    Seq((micros, micros * 1000L, 42L)).toDF("us", "order_ts", "order_id")
      .select(
        timestamp_micros(col("us")).cast(TimestampNTZType).as("created_at"),
        col("order_ts"), col("order_id"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Tables(spark, dir, "orders")
    out.schema("created_at").dataType shouldBe TimestampType
    out.schema("order_ts").dataType shouldBe TimestampType
    out.schema("order_id").dataType shouldBe LongType // untouched
    val row = out.select(
      unix_micros(col("created_at")), unix_micros(col("order_ts")),
      col("order_id")).head()
    row.getLong(0) shouldBe micros
    row.getLong(1) shouldBe micros
    row.getLong(2) shouldBe 42L
  }

  test("existing tables keep their non-ts long columns untouched") {
    // doc_id / event_id / n_chars are LongType and must never trip the
    // nanos heuristic; l_shipdate and o_orderdate (NTZ in the current
    // testdata) normalize to session-zoned TimestampType
    Tables(spark, sf, "lineitem").schema("l_shipdate").dataType shouldBe TimestampType
    Tables(spark, sf, "orders").schema("o_orderkey").dataType shouldBe LongType
    Tables(spark, sf, "orders").schema("o_orderdate").dataType shouldBe TimestampType
  }

  test("bare spark.read.parquet does NOT satisfy the contract (why Tables exists)") {
    val dir = TempDirs.path("tables-spec/bare")
    Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType shouldBe TimestampNTZType
  }
}
