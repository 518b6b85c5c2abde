package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dsir, QualityLr}

/** NB log-count-ratio quality classifier: hand-derived closed-form
  * weights, exact-integer margins, the gate, and null-label
  * semantics. The sf-scale training-run parity is the qc4/qc5 oracle
  * (DuckDB re-derives the whole closed form). */
class QualityLrSpec extends SparkSpec {
  import spark.implicits._

  // d1 (pos) "a a dup"; d2 "a b"; d3 "b b". k=2 → vocab = {a, dup}
  // (counts 2, 1); buckets B=3. cPos: a=2, dup=1; cNeg: a=1, oov=3;
  // tPos=3, tNeg=4; nPos=1, n=3.
  //   w(a)   = ln3 − ln6 − ln2 + ln7 = ln(21/12) → 559616
  //   w(dup) = ln2 − ln6 − ln1 + ln7 = ln(14/6)  → 847298
  //   w(oov) = ln1 − ln6 − ln4 + ln7 = ln(7/24)  → −1232144
  //   bias   = ln(1/2)                            → −693147
  private def docs = Seq(
    (1L, "a a dup"), (2L, "a b"), (3L, "b b")).toDF("doc_id", "text")
  private def lbl = array_contains(split(col("text"), " "), "dup")

  test("fit: hand-derived closed-form log-count-ratio weights") {
    val m = QualityLr.fit(docs, "doc_id", "text", lbl, k = 2)
    m.weights.sortBy(_._1) shouldBe Seq(
      (QualityLr.Bias, -693147L), (Dsir.Oov, -1232144L),
      ("a", 559616L), ("dup", 847298L))
  }

  test("score is the exact integer NB margin; gate flags margin > 0") {
    val m = QualityLr.fit(docs, "doc_id", "text", lbl, k = 2)
    QualityLr.score(docs, "doc_id", "text", m)
      .orderBy("doc_id").as[(Long, Long)].collect() shouldBe Array(
      (1L, 1273383L),   // 2·559616 + 847298 − 693147
      (2L, -1365675L),  // 559616 − 1232144 − 693147
      (3L, -3157435L))  // 2·(−1232144) − 693147
    QualityLr.gate(docs, "doc_id", "text", m)
      .select("doc_id").as[Long].collect() shouldBe Array(1L)
  }

  test("NULL label is the negative class, not a poisoned count") {
    val d = Seq((1L, "a a dup", "x"), (2L, "a b", null), (3L, "b b", null))
      .toDF("doc_id", "text", "tag")
    // label via the nullable tag column: NULL → negative, same model
    val m = QualityLr.fit(d, "doc_id", "text", col("tag") === "x", k = 2)
    m.weights.sortBy(_._1) shouldBe Seq(
      (QualityLr.Bias, -693147L), (Dsir.Oov, -1232144L),
      ("a", 559616L), ("dup", 847298L))
  }

  test("single-class corpora fail loudly") {
    val e = intercept[IllegalArgumentException] {
      QualityLr.fit(docs, "doc_id", "text", lit(true), k = 2)
    }
    e.getMessage should include("both classes")
  }

  test("calibrateThreshold: max recall subject to held-out precision; gateAt applies it") {
    val m = QualityLr.fit(docs, "doc_id", "text", lbl, k = 2)
    // held-out margins (exact, from the hand-derived weights):
    //   h1 "dup dup" pos → 1001449   h3 "a a a" NEG → 985701 (the
    //   high-margin false positive)  h2 "a dup" pos → 713767
    //   h4 "dup"     pos → 154151    h5 "b"     neg → −1925291
    // prefix precision walking margins down: 1.0, 0.5, 0.667, 0.75, 0.6
    val held = Seq((10L, "dup dup"), (11L, "a dup"), (12L, "a a a"),
      (13L, "dup"), (14L, "b")).toDF("doc_id", "text")
    // target 0.75: the LOWEST qualifying margin wins → max recall
    QualityLr.calibrateThreshold(held, "doc_id", "text", lbl, m,
      precisionTargetMicro = 750000L) shouldBe 154151L
    // target 0.8: only the top-1 prefix qualifies
    QualityLr.calibrateThreshold(held, "doc_id", "text", lbl, m,
      precisionTargetMicro = 800000L) shouldBe 1001449L
    // gateAt keeps margins ≥ threshold (inclusive)
    QualityLr.gateAt(held, "doc_id", "text", m, 154151L)
      .select("doc_id").as[Long].collect().sorted shouldBe
      Array(10L, 11L, 12L, 13L)
    // unreachable target fails loudly, never a silent fallback
    val onlyNeg = Seq((20L, "b b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      QualityLr.calibrateThreshold(onlyNeg, "doc_id", "text", lbl, m,
        precisionTargetMicro = 1000000L)
    }.getMessage should include("no margin threshold")
  }

  test("streaming twin: per-batch gating matches the batch margins") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val m = QualityLr.fit(docs, "doc_id", "text", lbl, k = 2)
    val out = TempDirs.path("sink/qlr-spec")
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Windows.streamingQualityGate(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", m)(
      graft.streaming.Windows.idempotentParquetSink(out))
    try {
      in.addData(docs.as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
      .select("doc_id", "margin_micro", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val batch = QualityLr.score(docs, "doc_id", "text", m)
      .withColumn("keep", col("margin_micro") > 0)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    streamed shouldBe batch
  }

  test("streaming twin at a CALIBRATED threshold: keep matches gateAt") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val m = QualityLr.fit(docs, "doc_id", "text", lbl, k = 2)
    // held-out calibration (see the calibrateThreshold case: 154151
    // keeps h1/h2/h3/h4, the 0.75-precision max-recall cut)
    val held = Seq((10L, "dup dup"), (11L, "a dup"), (12L, "a a a"),
      (13L, "dup"), (14L, "b")).toDF("doc_id", "text")
    val thr = QualityLr.calibrateThreshold(held, "doc_id", "text", lbl, m,
      precisionTargetMicro = 750000L)
    val out = TempDirs.path("sink/qlr-spec-cal")
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Windows.streamingQualityGate(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", m,
      thresholdMicro = Some(thr))(
      graft.streaming.Windows.idempotentParquetSink(out))
    try {
      in.addData(held.as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(out).filter(col("keep"))
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe QualityLr.gateAt(held, "doc_id", "text", m, thr)
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(10L, 11L, 12L, 13L)
  }

  test("plan shape: scoring joins broadcast; no shuffle join") {
    val m = QualityLr.fit(docs, "doc_id", "text", lbl, k = 2)
    val p = QualityLr.score(docs, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }
}
