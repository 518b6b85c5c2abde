package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Classification and argmin invariants behind the cd1/cd2 oracles. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff: added/removed/changed classified; unchanged dropped") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val neu = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("doc_id", "text")
    val out = Curation.snapshotDiff(old, neu, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "removed", 3L -> "changed", 4L -> "added")
  }

  test("snapshotDiff: hash and direct-compare modes agree") {
    val old = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val neu = Seq((1L, "a2"), (3L, "c")).toDF("doc_id", "text")
    val h = Curation.snapshotDiff(old, neu, "doc_id", "text", byHash = true)
    val d = Curation.snapshotDiff(old, neu, "doc_id", "text", byHash = false)
    h.except(d).count() shouldBe 0L
    d.except(h).count() shouldBe 0L
  }

  test("canonicalPerCluster: lowest (priority, id) wins; id breaks priority ties") {
    val docs = Seq(
      (10L, 1L, 5), (10L, 2L, 1), (10L, 3L, 1), // cluster 10: prio tie 2-vs-3 → 2
      (20L, 9L, 7),                             // singleton survives as-is
      (30L, 4L, 2), (30L, 5L, 0))
      .toDF("cluster", "doc_id", "priority")
    val out = Curation.canonicalPerCluster(docs, "cluster", "doc_id", "priority")
      .orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    out shouldBe Array((10L, 2L, 1), (20L, 9L, 7), (30L, 5L, 0))
  }

  test("canonicalPerCluster composes with star-CC cluster output") {
    // dup pairs 1-2-3 chain + isolated 4: CC labels, then priority pick
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val clusters = graft.operators.Dedup.connectedComponentsStar(pairs)
    val labeled = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
      .join(clusters, Seq("doc_id"), "left_outer")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .withColumn("priority", when(col("doc_id") === 3, 0).otherwise(1))
    val out = Curation.canonicalPerCluster(labeled, "cluster", "doc_id", "priority")
      .orderBy("cluster").collect().map(r => r.getLong(1))
    // chain cluster keeps doc 3 (priority 0 beats min-id); 4 keeps itself
    out shouldBe Array(3L, 4L)
  }
}
