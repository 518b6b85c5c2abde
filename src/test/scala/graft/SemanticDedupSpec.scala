package graft

import org.apache.spark.sql.functions._
import graft.operators.SemanticDedup
import graft.functions.{VectorFunctions => V}
import graft.queries.PlantedFixtures

/** SemDeDup gates beyond the dd16 oracle: within-cluster recall equals
  * the all-pairs brute force on the planted fixture (clustering loses
  * nothing there), and the maxCluster cap degrades with accounting,
  * not silently. */
class SemanticDedupSpec extends SparkSpec {

  private val dim = PlantedFixtures.EmbFixtureDim

  test("cluster-bucketed pairs == brute-force all-pairs at the 0.95 gate") {
    val embs = PlantedFixtures.embs(spark)
    val a = embs.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = embs.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    val brute = a.crossJoin(b).filter(col("id1") < col("id2"))
      .withColumn("cosine", round(V.cosineSimilarityNative(col("v1"), col("v2")), 4))
      .filter(col("cosine") >= 0.95)
      .select("id1", "id2", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val clustered = SemanticDedup.semanticNearDups(embs, "vec_id", "embedding",
        dim, k = 4, threshold = 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    clustered shouldBe brute
  }

  test("maxCluster=1 skips every multi-member cell: zero pairs, loss accounted") {
    val embs = PlantedFixtures.embs(spark)
    SemanticDedup.semanticNearDups(embs, "vec_id", "embedding", dim,
      k = 4, threshold = 0.95, maxCluster = 1).count() shouldBe 0L
    val stats = SemanticDedup.skippedClusterStats(embs, "vec_id", "embedding",
      dim, k = 4, maxCluster = 1).first()
    // at least the {0,1,2} and {3,4} cells are multi-member
    stats.getLong(0) should be >= 2L
    stats.getLong(1) should be >= 5L
  }

  test("semanticDedup keeps min-id representatives and all non-dup vectors") {
    val kept = SemanticDedup.semanticDedup(PlantedFixtures.embs(spark),
        "vec_id", "embedding", dim, k = 4, threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(0L, 3L, 5L, 6L, 7L, 8L, 9L, 10L, 11L)
  }
}
