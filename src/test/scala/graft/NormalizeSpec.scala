package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** NFC semantics the tx10 oracle (DuckDB nfc_normalize twin) doesn't
  * isolate: composition cases, the zero-copy fast path's value
  * identity, null propagation, idempotence, and SQL registration.
  * Unicode literals are written as escapes throughout — a decomposed
  * and a composed sequence render identically in an editor. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val Decomposed = "cafe\u0301" // e + combining acute, 5 chars
  private val Composed = "caf\u00e9"    // precomposed e-acute, 4 chars

  private def nfcOf(s: String): String =
    Seq(s).toDF("t").select(T.nfc(col("t"))).collect().head.getString(0)

  test("combining sequences compose: cafe+U+0301 becomes the 4-char precomposed form") {
    Decomposed.length shouldBe 5
    val out = nfcOf(Decomposed)
    out shouldBe Composed
    out.length shouldBe 4
  }

  test("already-NFC text passes through byte-identical (ASCII fast path)") {
    nfcOf("plain ascii text") shouldBe "plain ascii text"
    nfcOf(Composed) shouldBe Composed
  }

  test("NFC is idempotent and null-propagating") {
    val twice = Seq("a\u030ab\u0301").toDF("t") // a+combining-ring, b+combining-acute
      .select(T.nfc(T.nfc(col("t"))).as("two"), T.nfc(col("t")).as("one"))
      .collect().head
    twice.getString(0) shouldBe twice.getString(1)
    Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(T.nfc(col("t"))).collect().head.isNullAt(0) shouldBe true
  }

  test("equivalence for dedup: decomposed and precomposed hash identically after nfc") {
    Seq(Decomposed + " menu", Composed + " menu").toDF("t")
      .select(xxhash64(T.nfc(col("t"))).as("h")).distinct()
      .count() shouldBe 1L
  }

  test("cleanText strips controls, collapses spaces, trims; keeps tab and newline") {
    val out = Seq("  ab  c \t d\nef  ").toDF("t")
      .select(T.cleanText(col("t"))).collect().head.getString(0)
    out shouldBe "ab c \t d\nef"
  }

  test("graft_nfc is SQL-callable via the session extensions") {
    spark.sql("SELECT graft_nfc('cafe\u0301') AS n")
      .collect().head.getString(0) shouldBe Composed
  }
}
