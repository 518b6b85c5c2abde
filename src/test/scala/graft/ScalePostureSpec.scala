package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** The shuffle-shaping toolbox for 100 TB: salted joins for known-hot
  * keys, bucketed tables for co-located (exchange-free) joins, and
  * range-partitioned writes for pruning. Asserted on plans, not prose.
  */
class ScalePostureSpec extends SparkSpec {

  test("saltedJoin: result-identical to the plain join on skewed data") {
    import spark.implicits._
    // 90% of the big side hits one key — the classic skew shape
    val big = (0 until 20000).map { i =>
      (if (i % 10 == 0) s"k${i % 50}" else "HOT", i.toLong)
    }.toDF("k", "v")
    val small = (Seq("HOT") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("k", "info")

    val plain = big.join(small, "k").agg(
      count(lit(1)).as("n"), sum(col("v")).as("sv")).collect()(0)
    val salted = Skew.saltedJoin(big, small, "k", salts = 8).agg(
      count(lit(1)).as("n"), sum(col("v")).as("sv")).collect()(0)
    salted.getLong(0) shouldBe plain.getLong(0)
    salted.getLong(1) shouldBe plain.getLong(1)

    // the join key is (k, _salt) — the hot key spreads over 8 sub-keys
    val plan = Skew.saltedJoin(big, small, "k", salts = 8)
      .queryExecution.executedPlan.toString
    plan should include("_salt")
  }

  test("bucketed tables co-locate the join: no Exchange on either side") {
    val o = Tables(spark, sf, "orders")
    val l = Tables(spark, sf, "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist — clear them or CTAS refuses
    import org.apache.hadoop.fs.Path
    val wh = new Path("/tmp/graft-warehouse")
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("orders_b", "lineitem_b").foreach(t => fs.delete(new Path(wh, t), true))
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

    // disable broadcast so the join strategy itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) {
        plan should include("SortMergeJoin")
        // neither join input re-shuffles: bucket layout satisfies the
        // join's distribution requirement
        val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
          .split("HashAggregate").head
        joinSection should not include "Exchange hashpartitioning(o_orderkey"
        joinSection should not include "Exchange hashpartitioning(l_orderkey"
      }
      // and it still computes the right thing
      joined.collect().map(_.getLong(1)).sum shouldBe
        o.join(l, col("o_orderkey") === col("l_orderkey")).count()
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("range-partitioned sorted write: files carry disjoint key ranges for pruning") {
    val l = Tables(spark, sf, "lineitem")
    val dir = java.nio.file.Files.createTempDirectory("ranged").toString + "/l"
    l.repartitionByRange(4, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(dir)
    // row-group stats let a point-lookup skip most files: verify the
    // written files have non-overlapping orderkey ranges
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(dir)).map(_.getPath.toString)
      .filter(_.endsWith(".parquet"))
    files.length shouldBe 4
    val ranges = files.map { f =>
      val df = spark.read.parquet(f).agg(min("l_orderkey"), max("l_orderkey")).collect()(0)
      (df.getLong(0), df.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => hi should be <= lo2
      case _ =>
    }
  }
}
