package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}
import graft.queries.PlantedFixtures

/** int8 quantization gates beyond the vq1 VALUES oracle: roundtrip
  * error bound, cosine scale-invariance on the int arrays, and the
  * zero-vector edge. */
class VectorQuantSpec extends SparkSpec {

  test("dequantize roundtrip error is bounded by scale/2 per element") {
    val q = V.quantizeInt8(PlantedFixtures.embs(spark), "embedding", "qv")
    val bad = q.select(
        zip_with(col("embedding"), V.dequantize(col("qv")),
          (orig, rec) => abs(orig.cast("double") - rec))
          .as("err"),
        col("qv.scale").cast("double").as("s"))
      .filter(exists(col("err"), e => e > col("s") / 2 + 1e-9))
    bad.count() shouldBe 0L
  }

  test("cosine on int arrays tracks float cosine (scale cancels)") {
    val q = V.quantizeInt8(PlantedFixtures.embs(spark), "embedding", "qv")
      .select(col("vec_id"), col("embedding"), col("qv.q").as("q"))
    val pairs = q.as("a").join(q.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(
        V.cosineSimilarity(col("a.embedding"), col("b.embedding")).as("cf"),
        V.cosineSimilarity(col("a.q"), col("b.q")).as("cq"))
      .collect()
    pairs.length shouldBe 66 // C(12,2)
    pairs.foreach { r =>
      r.getDouble(1) shouldBe (r.getDouble(0) +- 0.02)
    }
    // the planted scalar-multiple cluster stays EXACTLY cosine 1 in
    // int space (identical q arrays)
    val c01 = q.filter(col("vec_id") <= 1).select(col("q")).collect()
    c01(0).getSeq[Byte](0) shouldBe c01(1).getSeq[Byte](0)
  }

  test("dedup still finds the planted near-dups on int8-quantized storage") {
    // the 4× storage saving is only real if the downstream operators
    // keep working on the quantized arrays: near-dup pairs found on
    // the dequantized vectors must match the float-vector pass
    val deq = V.quantizeInt8(PlantedFixtures.embs(spark), "embedding", "qv")
      .select(col("vec_id"),
        V.dequantize(col("qv")).as("embedding"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.embeddingNearDups(df, "vec_id", "embedding",
        PlantedFixtures.EmbFixtureDim, threshold = 0.95, bits = 2)
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val floatPairs = pairs(PlantedFixtures.embs(spark)
      .select(col("vec_id"), col("embedding")))
    pairs(deq) shouldBe floatPairs
    floatPairs should contain((3L, 4L)) // the 0.9945 pair survives quantization
  }

  test("zero vector quantizes to scale 0 and reconstructs as zeros") {
    import spark.implicits._
    val z = Seq((0L, Seq.fill(4)(0.0f))).toDF("vec_id", "embedding")
    val r = V.quantizeInt8(z, "embedding", "qv")
      .select(col("qv.scale").cast("double"),
        V.dequantize(col("qv")).as("rec"))
      .collect()(0)
    r.getDouble(0) shouldBe 0.0
    r.getSeq[Double](1) shouldBe Seq(0.0, 0.0, 0.0, 0.0)
  }
}
