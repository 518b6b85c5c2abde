package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorAvg

/** VectorAvg Aggregator: correctness vs the posexplode formulation it
  * replaces, plus partial-aggregation behavior across partitions.
  */
class VectorAggSpec extends SparkSpec {

  test("elementwise mean matches the posexplode/avg formulation") {
    val embs = Tables(spark, sf, "embeddings")
    val dim = 64
    val vecAvg = udaf(new VectorAvg(dim))

    val viaAgg = embs.groupBy("label").agg(vecAvg(col("embedding")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val viaExplode = embs
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy("label", "i").agg(avg("v").as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        x => x.getField("m")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap

    viaAgg.keySet shouldBe viaExplode.keySet
    viaAgg.foreach { case (k, c) =>
      c.zip(viaExplode(k)).foreach { case (a, b) => a shouldBe b +- 1e-9 }
    }
  }

  test("merge across many partitions agrees with a single-partition run") {
    import spark.implicits._
    val dim = 4
    val vecAvg = udaf(new VectorAvg(dim))
    val rows = (1 to 1000).map(i =>
      ("g", Array(i.toFloat, 2f * i, -i.toFloat, 0.5f * i)))
    val many = rows.toDF("g", "v").repartition(16)
      .groupBy("g").agg(vecAvg(col("v"))).collect()(0).getSeq[Double](1)
    val one = rows.toDF("g", "v").coalesce(1)
      .groupBy("g").agg(vecAvg(col("v"))).collect()(0).getSeq[Double](1)
    many.zip(one).foreach { case (a, b) => a shouldBe b +- 1e-9 }
    many(0) shouldBe 500.5 +- 1e-9 // mean of 1..1000
  }
}
