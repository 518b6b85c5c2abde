package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchTable

/** Sketch-table lifecycle properties the a13 tolerance oracle can't
  * isolate: exact small-cardinality estimates, append ≡ rebuild, and
  * idempotent batch replacement. */
class SketchTableSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range, key: String) = ids.map(i => (key, i.toLong))

  test("small cardinalities estimate exactly; estimates read only the sketch table") {
    val path = TempDirs.path("sketch-spec/exact")
    val df = (rows(0 until 40, "a") ++ rows(0 until 7, "b")).toDF("k", "v")
    SketchTable.build(df, "k", "v", path)
    val est = SketchTable.estimateDistinct(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // HLL is exact well below its sparse-mode capacity
    est shouldBe Map("a" -> 40L, "b" -> 7L)
  }

  test("append ≡ rebuild: union of per-batch sketches matches the one-shot build") {
    val a = rows(0 until 500, "k").toDF("k", "v")
    val b = rows(300 until 900, "k").toDF("k", "v") // overlap on purpose
    val split = TempDirs.path("sketch-spec/split")
    SketchTable.build(a, "k", "v", split)
    SketchTable.appendBatch(b, "k", "v", split, 0L)
    val whole = TempDirs.path("sketch-spec/whole")
    SketchTable.build(a.union(b), "k", "v", whole)
    val es = SketchTable.estimateDistinct(spark, split).head().getLong(1)
    val ew = SketchTable.estimateDistinct(spark, whole).head().getLong(1)
    // same inserted hash set → close register states; pin a tight band
    // (the truth is 900; the sketch's own rsd at lgK=12 is ~1.6%)
    math.abs(es - ew).toDouble should be <= math.max(ew * 0.02, 2.0)
    math.abs(ew - 900L).toDouble should be <= 900 * 0.05
  }

  test("re-appending a batch replaces its partition: estimates bit-identical, no upward bias") {
    val path = TempDirs.path("sketch-spec/idem")
    SketchTable.build(rows(0 until 200, "k").toDF("k", "v"), "k", "v", path)
    val batch = rows(200 until 400, "k").toDF("k", "v")
    SketchTable.appendBatch(batch, "k", "v", path, 3L)
    val e1 = SketchTable.estimateDistinct(spark, path).head().getLong(1)
    SketchTable.appendBatch(batch, "k", "v", path, 3L) // redelivery
    val e2 = SketchTable.estimateDistinct(spark, path).head().getLong(1)
    e2 shouldBe e1
    // and the table holds exactly one sketch row per (key, batch)
    spark.read.parquet(path).groupBy("key", "batch_id").count()
      .filter(col("count") > 1).count() shouldBe 0L
  }

  test("streaming maintenance: per-micro-batch sketches union to the exact history") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = TempDirs.path("sketch-spec/stream")
    val in = MemoryStream[(Timestamp, String, Long)]
    val q = graft.streaming.Windows.streamingSketchTable(
      in.toDF().toDF("ts", "k", "v"), "k", "v", path)
    try {
      def t(s: String) = Timestamp.valueOf(s)
      in.addData((t("2024-01-01 10:00:00"), "a", 1L), (t("2024-01-01 10:01:00"), "a", 2L))
      q.processAllAvailable()
      in.addData((t("2024-01-01 11:00:00"), "a", 2L), // dup across batches
        (t("2024-01-01 11:01:00"), "a", 3L), (t("2024-01-01 11:02:00"), "b", 9L))
      q.processAllAvailable()
      val est = SketchTable.estimateDistinct(spark, path)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // small cardinalities are exact; the cross-batch dup counts once
      est shouldBe Map("a" -> 3L, "b" -> 1L)
      // one sketch row per (key, micro-batch that saw the key)
      spark.read.parquet(path).count() shouldBe 3L
    } finally q.stop()
  }

  test("streaming posting-index maintenance: served queries equal a fresh build over the drained stream", Slow) {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Retrieval
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "apple banana zebra"), (2L, "apple plain text"),
      (3L, "apple apple banana"), (4L, "unrelated words here"))
    val idx = TempDirs.path("posting-stream/idx")
    // build must exist before appends (params + commit marker)
    Retrieval.buildPostingIndex(
      docs.take(1).toDF("doc_id", "text"), "doc_id", "text", idx, nBuckets = 4)
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = graft.streaming.Windows.streamingPostingIndex(
      in.toDF().toDF("ts", "doc_id", "text"), "doc_id", "text", idx)
    try {
      def t(s: String) = Timestamp.valueOf(s)
      in.addData(docs.slice(1, 3).map(d => (t("2024-01-01 10:00:00"), d._1, d._2)): _*)
      q.processAllAvailable()
      in.addData((t("2024-01-01 11:00:00"), docs(3)._1, docs(3)._2))
      q.processAllAvailable()
    } finally q.stop()
    val fresh = TempDirs.path("posting-stream/fresh")
    Retrieval.buildPostingIndex(docs.toDF("doc_id", "text"), "doc_id", "text",
      fresh, nBuckets = 4)
    val a = Retrieval.bm25TopKIndexed(spark, idx, "doc_id", Seq("apple", "banana"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = Retrieval.bm25TopKIndexed(spark, fresh, "doc_id", Seq("apple", "banana"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    a.map(_._1).toSeq shouldBe b.map(_._1).toSeq
    a.zip(b).foreach { case ((_, x), (_, y)) => x shouldBe y +- 1e-12 }
  }

  test("build batch id is reserved: appends must not collide with -1") {
    val path = TempDirs.path("sketch-spec/reserved")
    an[IllegalArgumentException] should be thrownBy
      SketchTable.appendBatch(rows(0 until 5, "k").toDF("k", "v"), "k", "v", path, -1L)
  }
}
