package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance resampling: hand-derived planted arithmetic,
  * OOV handling, Gumbel reproducibility, the target-enrichment
  * property on the sf corpus, and the top-k plan shape. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target: one doc "a a b"; raw adds "c c c" (all-OOV).
  // vocab(k=2) = {a, b}; buckets = 3; Nt = 3, Nr = 6.
  // lr(a) = ln3 − ln6 − ln3 + ln9 = ln 1.5  → 405465 micro
  // lr(b) = ln2 − ln6 − ln2 + ln9 = ln 1.5  → 405465
  // lr(oov) = ln1 − ln6 − ln4 + ln9 = ln 0.375 → −980829
  private def target = Seq((1L, "a a b")).toDF("doc_id", "text")
  private def raw = Seq((1L, "a a b"), (2L, "c c c")).toDF("doc_id", "text")

  test("fit: hand-derived micro-grid log-ratios (add-one, K+1 buckets)") {
    val m = Dsir.fit(target, raw, "text", k = 2)
    m.featN shouldBe 1
    m.feats.sortBy(_._1) shouldBe Seq(
      (Dsir.Oov, -980829L), ("a", 405465L), ("b", 405465L))
  }

  test("fit: under-filled vocab smooths over ACTUAL buckets, not k+1") {
    // target "a a a" has ONE distinct token; k=5 must not inflate the
    // smoothing denominator to 6 — real buckets are {a, oov} = 2.
    // Nt=3, Nr=5:  lr(a)  = ln4 − ln5 − ln4 + ln7 = ln(7/5) → 336472
    //              lr(oov)= ln1 − ln5 − ln3 + ln7 = ln(7/15) → −762140
    val t = Seq((1L, "a a a")).toDF("doc_id", "text")
    val r = Seq((1L, "a a a"), (2L, "c c")).toDF("doc_id", "text")
    val m = Dsir.fit(t, r, "text", k = 5)
    m.feats.sortBy(_._1) shouldBe Seq(
      (Dsir.Oov, -762140L), ("a", 336472L))
  }

  test("score: exact integer sums; OOV tokens take the OOV ratio") {
    val m = Dsir.fit(target, raw, "text", k = 2)
    val s = Dsir.score(raw, "doc_id", "text", m)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    s shouldBe Array(
      (1L, 3L, 2 * 405465L + 405465L),  // a a b
      (2L, 3L, 3 * -980829L))           // c c c, all OOV
  }

  test("selectTopK picks the target-like doc; plan fuses sort+limit") {
    val m = Dsir.fit(target, raw, "text", k = 2)
    val top = Dsir.selectTopK(
      Dsir.score(raw, "doc_id", "text", m), "doc_id", n = 1)
    top.select("doc_id").as[Long].collect() shouldBe Array(1L)
    top.queryExecution.executedPlan.toString should
      include("TakeOrderedAndProject")
  }

  test("gumbelTopK: same seed → same sample; n respected; keys shift") {
    val m = Dsir.fit(target, raw, "text", k = 2)
    val scored = Dsir.score(raw, "doc_id", "text", m)
    def sample(seed: Long) =
      Dsir.gumbelTopK(scored, "doc_id", n = 1, seed = seed)
        .select("doc_id").as[Long].collect().toSeq
    sample(7L) shouldBe sample(7L)
    // key = logw + gumbel: doc 1's weight advantage (4.2M micro) dwarfs
    // any Gumbel draw from a 2-value hash, so the sample is stable
    sample(7L) shouldBe Seq(1L)
    sample(12345L) shouldBe Seq(1L)
  }

  test("bigram features (featN=2): hand-derived windows with repeats") {
    // target "a a b" → windows ["a a","a b"]; raw adds "c c c" →
    // ["c c","c c"]. vocab(k=2) = {a a, a b}; buckets 3; Nt=2, Nr=4.
    // lr(a a) = lr(a b) = ln2−ln5−ln2+ln7 = ln(7/5)  → 336472
    // lr(oov) = ln1−ln5−ln3+ln7 = ln(7/15)           → −762140
    val m = Dsir.fit(target, raw, "text", k = 2, featN = 2)
    m.featN shouldBe 2 // rides the model: fit/score n-gram mismatch unrepresentable
    m.feats.sortBy(_._1) shouldBe Seq(
      (Dsir.Oov, -762140L), ("a a", 336472L), ("a b", 336472L))
    val sc = Dsir.score(raw, "doc_id", "text", m)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    sc shouldBe Array((1L, 2L, 672944L), (2L, 2L, -1524280L))
  }

  test("target enrichment on the sf corpus: selected set skews to lang='en'") {
    val d = Tables(spark, sf, "documents")
    val model = Dsir.fit(d.filter(col("lang") === "en"), d, "text", k = 30)
    val sel = Dsir.selectTopK(
      Dsir.score(d, "doc_id", "text", model), "doc_id", n = 20)
      .join(d.select("doc_id", "lang"), "doc_id")
    val enFrac = sel.filter(col("lang") === "en").count().toDouble / 20
    val baseFrac = d.filter(col("lang") === "en").count().toDouble /
      d.count()
    enFrac should be > baseFrac
  }

  test("streaming twin: per-batch scoring matches the batch score") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val m = Dsir.fit(target, raw, "text", k = 2)
    val out = TempDirs.path("sink/dsir-spec")
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Windows.streamingDsirScore(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", m)(
      graft.streaming.Windows.idempotentParquetSink(out))
    try {
      in.addData(raw.as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_tokens", "logw_micro")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val batch = Dsir.score(raw, "doc_id", "text", m)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    streamed shouldBe batch
  }

  test("score plan: model joins broadcast; no shuffle join") {
    val m = Dsir.fit(target, raw, "text", k = 2)
    val p = Dsir.score(raw, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }
}
