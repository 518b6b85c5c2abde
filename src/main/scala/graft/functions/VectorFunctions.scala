package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `Array[Float]` embedding columns
  * (testdata `embeddings.embedding`, FLOAT[64]), as built-in
  * higher-order-function compositions (`zip_with` + `aggregate`) —
  * fully distributed, no UDF, no driver collect.
  *
  * All math is done in double precision regardless of the storage
  * type, so results are stable across storage layouts and match a
  * double-precision oracle.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** cos(a, b) = a·b / (‖a‖‖b‖); 0 for zero vectors. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Squared L2 distance. */
  def l2Squared(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Signed-random-projection (hyperplane) LSH signature: `bits` sign
    * bits packed into a Long. Hyperplane h_i components are derived
    * deterministically from xxhash64(seed, i, j) — no stored model, so
    * the same signature is computable on any executor for any vector,
    * which is what makes the bucket join work at scale.
    *
    * sign bit i = sign( Σ_j hash01(i,j) · v_j ), hash01 ∈ {-1, +1}.
    */
  def hyperplaneSignature(vec: Column, bits: Int, dim: Int, seed: Long = 42L): Column = {
    // Nested HOFs (runtime loops) rather than bits×dim unrolled
    // expression nodes — keeps the generated code small enough for
    // whole-stage codegen at any (bits, dim).
    val projs = transform(sequence(lit(0), lit(bits - 1)), i =>
      aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0), (acc, j) =>
        acc + when(pmod(xxhash64(lit(seed), i, j), lit(2)) === 0, lit(1.0))
          .otherwise(lit(-1.0)) *
          element_at(vec, (j + 1).cast("int")).cast("double")))
    // pack sign bits: Σ 2^i over i where proj_i >= 0
    aggregate(
      zip_with(projs, sequence(lit(0), lit(bits - 1)), (p, i) =>
        when(p >= 0, pow(lit(2.0), i).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }
}
