package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query vector is a
  *    one-row broadcast (never collected per-partition); the top-k is a
  *    `TakeOrderedAndProject` — each partition keeps k rows, only
  *    k·numPartitions rows ever move. This is the correct *baseline*
  *    even at scale when k is small: one scan, no index.
  *  - [[lshTopK]]: hyperplane-LSH bucketed search — the scale path. The
  *    query's signature (and its single-bit-flip multiprobes) select
  *    candidate buckets; only those buckets are scored. On a bucketed/
  *    partitioned table this prunes the scan itself.
  */
object Ann {

  /** Exact cosine top-k against a single query vector, supplied as a
    * one-row DataFrame (id, vec). */
  def bruteForceTopK(embs: DataFrame, idCol: String, vecCol: String,
                     query: DataFrame, queryVecCol: String, k: Int): DataFrame = {
    val q = broadcast(query.select(col(queryVecCol).as("_qvec")))
    embs.crossJoin(q)
      .withColumn("sim", V.cosineSimilarity(col(vecCol), col("_qvec")))
      .select(col(idCol), col("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /** LSH-bucketed ANN: score only vectors whose signature matches the
    * query signature or any single-bit flip of it (multiprobe radius 1).
    * Recall is tunable via `bits` (fewer bits → bigger buckets → higher
    * recall, more work). Cross-checked against brute force in AnnSpec.
    */
  def lshTopK(embs: DataFrame, idCol: String, vecCol: String, dim: Int,
              query: DataFrame, queryVecCol: String, k: Int,
              bits: Int = 8): DataFrame = {
    val withSig = embs.withColumn("_sig",
      V.hyperplaneSignature(col(vecCol), bits, dim))
    // query side: signature + radius-1 multiprobes, exploded to rows
    val probes = query
      .select(col(queryVecCol).as("_qvec"),
        V.hyperplaneSignature(col(queryVecCol), bits, dim).as("_qsig"))
      .select(col("_qvec"), explode(concat(
        array(col("_qsig")),
        transform(sequence(lit(0), lit(bits - 1)), i =>
          col("_qsig").bitwiseXOR(
            pow(lit(2.0), i).cast("long"))))).as("_probe"))
    withSig.join(broadcast(probes), col("_sig") === col("_probe"))
      .withColumn("sim", V.cosineSimilarity(col(vecCol), col("_qvec")))
      .select(col(idCol), col("sim"))
      .dropDuplicates(idCol)
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /** IVF-style coarse quantization using label/partition assignment:
    * group vectors by an existing coarse key (e.g. a cluster id column),
    * compute per-cell centroids, then restrict search to the nProbe
    * nearest cells. On a 100 TB table the cell id is the partition
    * column — the scan itself prunes. */
  def ivfTopK(embs: DataFrame, idCol: String, vecCol: String, cellCol: String,
              dim: Int, query: DataFrame, queryVecCol: String, k: Int,
              nProbe: Int = 2): DataFrame = {
    // centroids: elementwise mean per cell via the typed VectorAvg
    // Aggregator — ONE partial-aggregated pass; the posexplode
    // alternative would shuffle dim× the rows and need two aggs to
    // reassemble order (VectorAgg scaladoc).
    val vecAvg = org.apache.spark.sql.functions.udaf(new VectorAvg(dim))
    val cent = embs
      .groupBy(col(cellCol).as("_cell"))
      .agg(vecAvg(col(vecCol)).as("_centroid"))
    val q = broadcast(query.select(col(queryVecCol).as("_qvec")))
    val nearCells = cent.crossJoin(q)
      .withColumn("_csim", V.cosineSimilarity(col("_centroid"), col("_qvec")))
      .orderBy(desc("_csim")).limit(nProbe)
      .select("_cell")
    embs.join(broadcast(nearCells), col(cellCol) === col("_cell"))
      .crossJoin(q)
      .withColumn("sim", V.cosineSimilarity(col(vecCol), col("_qvec")))
      .select(col(idCol), col("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }
}
