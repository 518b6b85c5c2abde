package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** SemDeDup-style semantic dedup: k-means-cluster the embeddings, then
  * near-dup prune WITHIN clusters only — the published recipe (SemDeDup,
  * Abbas et al. 2023) for pruning semantically redundant training docs
  * that embedding-LSH misses when near-dups straddle hash buckets.
  *
  * Relationship to the LSH path ([[Dedup.embeddingNearDups]]): LSH
  * buckets are data-independent (random hyperplanes), k-means cells are
  * data-adaptive — a tight semantic cluster lands in ONE cell by
  * construction, so recall inside a cluster is exact, and the recall
  * knob becomes cluster granularity `k` instead of bits×tables.
  *
  * Scale shape: training is [[Ann.trainIvfCells]] (centroids are the
  * only driver state); assignment is a pure column expression (the
  * centroid matrix ships as a codegen literal); candidate pairs come
  * from an equi-join on the cell id — a keyed shuffle, never all-pairs
  * across the corpus. Per-cell pairwise cost is (n/k)² — k is chosen so
  * the expected cell is small (the paper uses n/k ≈ 10⁴ at web scale),
  * and skewed cells are bounded by `maxCluster`: cells past the cap are
  * SKIPPED with accounting (the LSH family's maxBucket discipline —
  * loss is measured, not silent).
  */
object SemanticDedup {

  /** (id, _cell) assignment from freshly trained cells. */
  private def assigned(embs: DataFrame, idCol: String, vecCol: String,
                       dim: Int, k: Int, iters: Int): DataFrame = {
    val cents = Ann.trainIvfCells(embs, idCol, vecCol, dim, k, iters)
    embs.withColumn("_cell", Ann.nearestCell(col(vecCol), cents))
  }

  /** Within-cluster near-dup pairs (id1 < id2, cosine ≥ threshold,
    * cell): each side of the self-join carries only (id, vec, cell). */
  def semanticNearDups(embs: DataFrame, idCol: String, vecCol: String,
                       dim: Int, k: Int, threshold: Double, iters: Int = 3,
                       maxCluster: Int = 10000): DataFrame = {
    val withCell = assigned(embs, idCol, vecCol, dim, k, iters)
    val small = withCell
      .withColumn("_csz", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("_cell")))
      .filter(col("_csz") <= maxCluster)
    val a = small.select(col("_cell"), col(idCol).as("id1"), col(vecCol).as("_v1"))
    val b = small.select(col("_cell"), col(idCol).as("id2"), col(vecCol).as("_v2"))
    a.join(b, Seq("_cell"))
      .filter(col("id1") < col("id2"))
      .withColumn("cosine",
        round(V.cosineSimilarityNative(col("_v1"), col("_v2")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** Cells skipped by the `maxCluster` cap — (n_skipped_cells,
    * n_vectors_in_skipped_cells): the measured-loss accounting row. */
  def skippedClusterStats(embs: DataFrame, idCol: String, vecCol: String,
                          dim: Int, k: Int, iters: Int = 3,
                          maxCluster: Int = 10000): DataFrame =
    assigned(embs, idCol, vecCol, dim, k, iters)
      .groupBy(col("_cell")).agg(count(lit(1)).as("_csz"))
      .filter(col("_csz") > maxCluster)
      .agg(count(lit(1)).as("n_skipped_cells"),
        coalesce(sum(col("_csz")), lit(0L)).as("n_vectors_in_skipped_cells"))

  /** The pruned corpus: transitive dup groups (diameter-proof star CC
    * over the pair graph) collapse to their min-id representative;
    * vectors in no pair survive untouched. */
  def semanticDedup(embs: DataFrame, idCol: String, vecCol: String,
                    dim: Int, k: Int, threshold: Double, iters: Int = 3,
                    maxCluster: Int = 10000): DataFrame = {
    val pairs = semanticNearDups(embs, idCol, vecCol, dim, k, threshold,
      iters, maxCluster)
    val comps = Dedup.connectedComponentsStar(pairs.select("id1", "id2"))
    val drop = comps.filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as(idCol))
    embs.join(drop, Seq(idCol), "left_anti")
  }
}
