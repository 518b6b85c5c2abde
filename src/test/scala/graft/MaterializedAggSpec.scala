package graft

import org.apache.spark.sql.functions._
import graft.operators.{MaterializedAgg, Snapshot}

class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String) =
    TempDirs.path(s"matagg-spec/$tag-${java.util.UUID.randomUUID()}")

  private val batch1 = Seq(
    ("a", Some(10L)), ("a", Some(2L)), ("b", None: Option[Long])
  ).toDF("k", "v")
  private val batch2 = Seq(
    ("a", Some(5L)), ("b", None: Option[Long]), ("c", Some(7L))
  ).toDF("k", "v")

  test("partial-merge rollup equals a direct aggregate of the union, including all-null groups") {
    val path = fresh("merge")
    MaterializedAgg.build(batch1, Seq("k"), Seq("v"), path)
    MaterializedAgg.appendBatch(batch2, Seq("k"), Seq("v"), path, 0L)
    val got = MaterializedAgg.read(spark, path).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)),
        Option(r.get(6))))
    got shouldBe Array(
      ("a", 3L, 3L, Some(17L), Some(2L), Some(10L), Some(17.0 / 3)),
      // b: two rows, zero non-null values → sum/min/max/avg all NULL
      ("b", 2L, 0L, None, None, None, None),
      ("c", 1L, 1L, Some(7L), Some(7L), Some(7L), Some(7.0)))
  }

  test("redelivered batch replaces itself — stored partials stay groups×batches") {
    val path = fresh("idem")
    MaterializedAgg.build(batch1, Seq("k"), Seq("v"), path)
    MaterializedAgg.appendBatch(batch2, Seq("k"), Seq("v"), path, 0L)
    val once = MaterializedAgg.read(spark, path).orderBy("k").collect()
    MaterializedAgg.appendBatch(batch2, Seq("k"), Seq("v"), path, 0L)
    MaterializedAgg.read(spark, path).orderBy("k").collect() shouldBe once
    // 2 groups in the build + 3 in batch 0 — never more
    spark.read.parquet(path).count() shouldBe 5L
  }

  test("snapshot composition: a pinned reader is unaffected by a later refresh", Slow) {
    val path = fresh("snap")
    MaterializedAgg.build(batch1, Seq("k"), Seq("v"), path)
    Snapshot.enable(spark, path)
    val v1 = Snapshot.latestVersion(spark, path).get
    MaterializedAgg.appendBatch(batch2, Seq("k"), Seq("v"), path, 0L)
    MaterializedAgg.read(spark, path).count() shouldBe 3L // a, b, c
    // the pinned manifest still resolves only the build batch
    Snapshot.readAt(spark, path, v1)
      .agg(sum(col("__rows"))).head().getLong(0) shouldBe 3L
  }

  test("a non-matagg table and colliding value names are rejected loudly") {
    val path = fresh("bad")
    Seq((1L, "x")).toDF("batch_id", "key").write.parquet(path)
    intercept[IllegalArgumentException] {
      MaterializedAgg.read(spark, path)
    }.getMessage should include("not a materialized-agg table")
    intercept[IllegalArgumentException] {
      MaterializedAgg.build(batch1.withColumnRenamed("v", "x__sum"),
        Seq("k"), Seq("x__sum"), fresh("collide"))
    }.getMessage should include("collide")
  }

  test("multi-key, multi-value tables roll up per tuple") {
    val path = fresh("multi")
    val df = Seq(("a", 1, 10L, 1.5), ("a", 1, 20L, 0.5), ("a", 2, 5L, 2.0))
      .toDF("k1", "k2", "v1", "v2")
    MaterializedAgg.build(df, Seq("k1", "k2"), Seq("v1", "v2"), path)
    val r = MaterializedAgg.read(spark, path)
      .filter(col("k2") === 1).head()
    r.getAs[Long]("n_rows") shouldBe 2L
    r.getAs[Long]("v1_sum") shouldBe 30L
    r.getAs[Double]("v2_avg") shouldBe 1.0
  }
}
