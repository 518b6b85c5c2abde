package graft

import org.apache.spark.sql.functions._
import graft.operators.SpanDedup

/** Properties of the duplicate n-gram span dedup that the dd15 planted
  * oracle can't pin from one fixture: idempotence, the short-doc
  * guard, within-doc-only repeats, and stats consistency. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val shared = "the quick brown fox jumps over"
  private def fixture = Seq(
    (1L, s"alpha beta $shared gamma delta"),
    (2L, s"$shared epsilon zeta eta"),
    (3L, "one two three four five six seven"))
    .toDF("doc_id", "text")

  test("span removal is idempotent: a cleaned corpus has no duplicated windows", Slow) {
    val once = SpanDedup.spanDedup(fixture, "doc_id", "text", n = 5)
      .select(col("doc_id"), col("text"))
    val twice = SpanDedup.spanDedup(once, "doc_id", "text", n = 5)
    twice.agg(sum(col("n_dup_windows"))).first().getLong(0) shouldBe 0L
    twice.select(col("doc_id"), col("text")).collect().toSet shouldBe
      once.collect().toSet
  }

  test("docs shorter than n tokens produce no windows and survive untouched") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text")
    val out = SpanDedup.spanDedup(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
    out.map(_.getLong(2)).sum shouldBe 0L // n_dup_windows
    out.map(_.getString(4)) shouldBe Array("tiny doc", "tiny doc")
  }

  test("a window repeated only WITHIN one doc is not corpus-duplicated (minDocs=2)") {
    val docs = Seq(
      (1L, s"$shared filler tokens then again $shared"),
      (2L, "completely unrelated content with its own words here"))
      .toDF("doc_id", "text")
    SpanDedup.spanDedup(docs, "doc_id", "text", n = 5)
      .agg(sum(col("n_dup_windows"))).first().getLong(0) shouldBe 0L
  }

  test("spanDedupStats row equals the per-doc totals") {
    val per = SpanDedup.spanDedup(fixture, "doc_id", "text", n = 5).collect()
    val row = SpanDedup.spanDedupStats(fixture, "doc_id", "text", n = 5).first()
    row.getLong(0) shouldBe per.length.toLong
    row.getLong(1) shouldBe per.map(_.getLong(1)).sum
    row.getLong(2) shouldBe per.map(_.getLong(2)).sum
    row.getLong(3) shouldBe per.map(_.getLong(3)).sum
  }
}
