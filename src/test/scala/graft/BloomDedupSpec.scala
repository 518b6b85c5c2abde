package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomDedup

/** Statistical + guarantee gates for the Bloom membership dedup:
  * no false negatives ever (every true member drops), and the
  * measured false-positive rate stays near the configured fpp. */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0 until 2000).map(i => (i.toLong, s"corpus document number $i"))
    .toDF("doc_id", "text")
  private def fresh = (0 until 2000).map(i => (10000L + i, s"novel document payload $i"))
    .toDF("doc_id", "text")

  test("no false negatives: re-probing the corpus itself drops every row") {
    BloomDedup.bloomDedup(corpus, corpus, "text", expectedItems = 4000L)
      .count() shouldBe 0L
  }

  test("measured false-positive rate ≈ configured fpp (one-sided loss is bounded)") {
    val stats = BloomDedup.bloomDedupStats(fresh, corpus, "text",
      expectedItems = 4000L, fpp = 0.01).first()
    stats.getLong(0) shouldBe 2000L
    val measured = stats.getLong(1).toDouble / stats.getLong(0)
    measured should be <= 0.03 // 3× headroom over 1% on 2k probes
  }

  test("normalization: whitespace/case variants of a corpus doc are members") {
    val variants = Seq((1L, "  CORPUS   document NUMBER 7 "))
      .toDF("doc_id", "text")
    BloomDedup.bloomDedup(variants, corpus, "text", expectedItems = 4000L)
      .count() shouldBe 0L
  }
}
