package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontaminate

/** Benchmark decontamination: planted-overlap semantics, bloom-screen
  * exactness (false positives never change the answer), normalization,
  * boundedness guard, and the broadcast plan shape. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // Corpus: doc 1 contains the benchmark answer verbatim mid-text; doc
  // 2 contains the SAME 8-gram (cross-doc contamination); docs 3-4 are
  // clean; doc 5 shares only a 7-gram prefix (below n) — clean at n=8.
  private val secret = "alpha bravo charlie delta echo foxtrot golf hotel"
  private def corpus = Seq(
    (1L, s"intro words $secret trailing tail"),
    (2L, s"$secret completely different continuation here"),
    (3L, "one two three four five six seven eight nine ten"),
    (4L, "the quick brown fox jumps over the lazy dog again"),
    (5L, "alpha bravo charlie delta echo foxtrot golf INDIA nine ten"))
    .toDF("doc_id", "text")

  private def evals = Seq(
    (100L, s"question stem $secret answer choice"),
    (101L, "totally unleaked benchmark row with its own wording"))
    .toDF("eval_id", "eval_text")

  test("contaminationReport flags exactly the docs sharing an n-gram") {
    val r = Decontaminate
      .contaminationReport(corpus, "doc_id", "text", evals, "eval_text", n = 8)
      .orderBy("doc_id").as[(Long, Long)].collect()
    // docs 1 and 2 each contain exactly the one shared 8-gram (their
    // surrounding words differ from the eval row's stem/choice words)
    r shouldBe Array((1L, 1L), (2L, 1L))
  }

  test("decontaminate keeps the clean docs, drops the contaminated, exact") {
    val kept = Decontaminate
      .decontaminate(corpus, "doc_id", "text", evals, "eval_text", n = 8)
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(3L, 4L, 5L)
  }

  test("bloom false positives never change the answer (fpp ~ 0.5)") {
    // An absurd fpp floods stage 2 with candidates; the exact confirm
    // join must still produce the identical report.
    val loose = Decontaminate
      .contaminationReport(corpus, "doc_id", "text", evals, "eval_text",
        n = 8, fpp = 0.5)
      .orderBy("doc_id").as[(Long, Long)].collect()
    loose shouldBe Array((1L, 1L), (2L, 1L))
  }

  test("matching is case/whitespace-normalized on both sides") {
    val shouting = Seq((9L, s"x y ${secret.toUpperCase}  z")).toDF("doc_id", "text")
    val r = Decontaminate
      .contaminatedIds(shouting, "doc_id", "text", evals, "eval_text", n = 8)
      .as[Long].collect()
    r shouldBe Array(9L)
  }

  test("short eval rows screen via the under-length-gram convention") {
    // A 3-token eval answer (< n) becomes one under-length gram; a doc
    // that IS exactly that 3-token sequence collides, per
    // Dedup.shingles' greatest(len-n+1, 1) rule.
    val shortEval = Seq((1L, "zulu yankee xray")).toDF("eval_id", "eval_text")
    val shortDocs = Seq((7L, "zulu yankee xray"), (8L, "zulu yankee whiskey"))
      .toDF("doc_id", "text")
    val r = Decontaminate
      .contaminatedIds(shortDocs, "doc_id", "text", shortEval, "eval_text", n = 8)
      .as[Long].collect()
    r shouldBe Array(7L)
  }

  test("evalLeakage counts distinct contaminated docs per eval row") {
    val r = Decontaminate
      .evalLeakage(corpus, "doc_id", "text", evals, "eval_id", "eval_text", n = 8)
      .orderBy("eval_id").as[(Long, Long)].collect()
    r shouldBe Array((100L, 2L)) // eval 101 never leaked -> absent
  }

  test("maxEvalNgrams guard fails loudly when the eval side is too big") {
    val e = intercept[IllegalArgumentException] {
      Decontaminate.contaminationReport(corpus, "doc_id", "text",
        evals, "eval_text", n = 8, maxEvalNgrams = 1L)
    }
    e.getMessage should include("maxEvalNgrams")
  }

  test("streaming twin: per-batch tagging matches the batch report") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val out = TempDirs.path("sink/decontam-spec")
    val in = MemoryStream[(Long, String)]
    val dq = graft.streaming.Windows.streamingDecontaminate(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text",
      evals, "eval_text", n = 8)(
      graft.streaming.Windows.idempotentParquetSink(out))
    try {
      in.addData(corpus.as[(Long, String)].collect().toSeq: _*)
      dq.query.processAllAvailable()
    } finally { dq.query.stop(); dq.unpersist() }
    val tagged = spark.read.parquet(out)
      .select("doc_id", "n_eval_hits").as[(Long, Long)].collect().sorted
    // contaminated docs carry the exact batch-path hit counts; clean 0
    val rep = Decontaminate
      .contaminationReport(corpus, "doc_id", "text", evals, "eval_text", n = 8)
      .as[(Long, Long)].collect().toMap
    tagged shouldBe corpus.as[(Long, String)].collect()
      .map { case (id, _) => (id, rep.getOrElse(id, 0L)) }.sorted
  }

  test("decontaminate → governed delete: contaminated ids erase COW; " +
    "only affected batches rewrite, clean batch files untouched") {
    import graft.operators.Snapshot
    import org.apache.hadoop.fs.Path
    val path = TempDirs.path(
      s"decontam/gov-${java.util.UUID.randomUUID()}")
    // batch 0 holds contaminated doc 1; batch 1 contaminated doc 4;
    // batch 2 is clean AND its id range [100,101] sits above the
    // doomed keys' bounds — zone maps must keep it out of the fold
    Seq((1L, "a b c d e f g h x1"), (2L, "m n o p q r s t u"))
      .toDF("doc_id", "text").write.parquet(s"$path/batch_id=0")
    Snapshot.enable(spark, path)
    Snapshot.stagedAppend(spark, path, 1L) {
      Seq((3L, "aa bb cc dd"), (4L, "z a b c d e f g h"))
        .toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$path/batch_id=1")
    }
    Snapshot.stagedAppend(spark, path, 2L) {
      Seq((100L, "zzcleana zzcleanb"), (101L, "zzcleanc zzcleand"))
        .toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$path/batch_id=2")
    }
    val evals = Seq("a b c d e f g h").toDF("eval_text")
    val gov = Snapshot.read(spark, path).select(col("doc_id"), col("text"))
    val bad = Decontaminate.contaminatedIds(
      gov, "doc_id", "text", evals, "eval_text", n = 8).persist()
    try {
      bad.as[Long].collect().sorted shouldBe Array(1L, 4L)
      val fs = new Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def cleanFiles = fs.listStatus(new Path(path, "batch_id=2"))
        .map(f => (f.getPath.toString, f.getModificationTime)).toSet
      val before = cleanFiles
      val st = Snapshot.deleteMatching(spark, path, bad, Seq("doc_id"))
      st.matched shouldBe 2L
      st.rewrittenBatches shouldBe Seq(0L, 1L) // batch 2 pruned
      cleanFiles shouldBe before // physically untouched
      Snapshot.read(spark, path).select("doc_id").as[Long]
        .collect().sorted shouldBe Array(2L, 3L, 100L, 101L)
    } finally bad.unpersist(blocking = false)
  }

  test("plan shape: confirm and removal joins broadcast (no shuffle join)") {
    val rep = Decontaminate
      .contaminationReport(corpus, "doc_id", "text", evals, "eval_text", n = 8)
    val p1 = rep.queryExecution.executedPlan.toString
    p1 should include("BroadcastHashJoin")
    p1 should not include "SortMergeJoin"
    val clean = Decontaminate
      .decontaminate(corpus, "doc_id", "text", evals, "eval_text", n = 8)
    val p2 = clean.queryExecution.executedPlan.toString
    p2 should include("LeftAnti")
    p2 should not include "SortMergeJoin"
  }
}
