package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Sequence-packing gates beyond the hand-traced pk1/pk2 oracles:
  * invariants that must hold for ANY input (every doc lands in exactly
  * one bin; no bin exceeds the budget unless it holds a single
  * oversize doc), multi-shard reproducibility, and the oversize
  * flagging contract.
  */
class PackingSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    // deterministic pseudo-random token counts in [1, 400]
    (0 until n).map(i => (i.toLong, 1L + math.abs(i * 2654435761L % 400)))
      .toDF("doc_id", "n_tokens")
  }

  test("packing invariants: total assignment, budget respected, oversize flagged") {
    val budget = 512L
    val packed = Packing.packSequences(docs(5000), "doc_id", "n_tokens",
      budget, shards = 8).cache()
    try {
      packed.count() shouldBe 5000L
      packed.select(countDistinct(col("doc_id"))).collect()(0).getLong(0) shouldBe 5000L
      val bins = Packing.packingStats(packed, budget)
      // a bin over budget must be a single oversize doc
      bins.filter(col("fill") > budget &&
        !(col("n_docs") === 1 && col("has_oversize") === 1)).count() shouldBe 0L
      // with max doc 400 < 512, no bin is oversize here; every bin but
      // possibly each shard's last is more than half full (greedy
      // first-close can't leave two consecutive half-empty bins)
      bins.filter(col("fill") > budget).count() shouldBe 0L
    } finally packed.unpersist()
  }

  test("packing is reproducible for a fixed shard count") {
    val a = Packing.packSequences(docs(2000), "doc_id", "n_tokens", 512L, shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet
    val b = Packing.packSequences(docs(2000), "doc_id", "n_tokens", 512L, shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet
    a shouldBe b
  }

  test("oversize docs get a bin of their own and are flagged") {
    import spark.implicits._
    val d = Seq((1L, 50L), (2L, 1000L), (3L, 60L)).toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(d, "doc_id", "n_tokens", 128L, shards = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getInt(4)))
    packed shouldBe Array((1L, 0L, 0), (2L, 1L, 1), (3L, 2L, 0))
  }
}
