package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityJoin
import graft.queries.PlantedFixtures

/** Completeness + exactness gates for the prefix-filtered set-
  * similarity join: parity with brute-force all-pairs (the quadratic
  * semantics reference) across thresholds, the planted-corpus truth,
  * and the no-cartesian plan posture the prefix filter exists for. */
class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(threshold: Double, k: Int = 3) =
    SimilarityJoin.jaccardJoin(PlantedFixtures.docs(spark), "doc_id", "text",
        threshold, k)
      .orderBy("id1", "id2")
      .as[(Long, Long, Double)].collect().toSeq

  private def brute(threshold: Double, k: Int = 3) =
    SimilarityJoin.bruteForcePairs(PlantedFixtures.docs(spark), "doc_id",
        "text", threshold, k)
      .orderBy("id1", "id2")
      .as[(Long, Long, Double)].collect().toSeq

  test("planted corpus at 0.5: exactly the hand-derived all-pairs truth") {
    pairs(0.5) shouldBe Seq(
      (1L, 2L, 0.931),  // 27/29
      (1L, 3L, 0.8065), // 25/31
      (2L, 3L, 0.75),   // 24/32
      (4L, 5L, 1.0),
      (6L, 7L, 0.52))   // 26/50 — the pair LSH at 0.7-tuned bands can miss
  }

  test("threshold 1.0: only the byte-identical pair survives") {
    pairs(1.0) shouldBe Seq((4L, 5L, 1.0))
  }

  test("completeness + exactness: parity with brute force across thresholds") {
    for (t <- Seq(0.3, 0.5, 0.7, 0.9)) {
      withClue(s"threshold $t: ") { pairs(t) shouldBe brute(t) }
    }
  }

  test("parity with brute force on a seeded random corpus (unigram shingles)") {
    val rnd = new scala.util.Random(42)
    val vocab = ('a' to 'z').map(_.toString)
    // 60 docs of 8-14 tokens from a 26-token vocab: dense overlap, so
    // every code path (size filter, prefix boundary, verify) is hit.
    val docs = (1 to 60).map { i =>
      val n = 8 + rnd.nextInt(7)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.6)) {
      val got = SimilarityJoin.jaccardJoin(docs, "doc_id", "text", t, k = 1)
        .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
      val want = SimilarityJoin.bruteForcePairs(docs, "doc_id", "text", t, k = 1)
        .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
      withClue(s"threshold $t: ") { got shouldBe want }
    }
  }

  test("short docs (< k tokens) pair on the whole-text shingle") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other words"))
      .toDF("doc_id", "text")
    SimilarityJoin.jaccardJoin(docs, "doc_id", "text", 0.5)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq shouldBe
      Seq((1L, 2L, 1.0))
  }

  test("plan posture: candidate generation is equi-joins — no cartesian") {
    // materialize = false keeps the logical plan inspectable (the
    // default eagerly checkpoints, which truncates it to an RDD scan)
    val plan = SimilarityJoin.jaccardJoin(PlantedFixtures.docs(spark),
        "doc_id", "text", 0.5, materialize = false)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    spark.sharedState.cacheManager.clearCache()
  }
}
