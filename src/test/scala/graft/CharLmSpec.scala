package graft

import org.apache.spark.sql.functions._
import graft.operators.CharLm

/** Char-trigram LM perplexity: parity with an independent plain-Scala
  * reference on a hand-sized fixture, smoothing/unseen handling, the
  * no-window contract, and the plan shape (broadcast model, no
  * cartesian, no UDF). */
class CharLmSpec extends SparkSpec {
  import spark.implicits._

  // independent reference: same formula, straight-line Scala
  private def refPpl(corpus: Seq[String], doc: String): Option[Double] = {
    def wins(t: String) =
      if (t.length < 3) Seq.empty else (0 to t.length - 3).map(i => t.substring(i, i + 3))
    val c3 = corpus.flatMap(wins).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c2 = corpus.flatMap(wins).map(_.take(2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val ws = wins(doc)
    if (ws.isEmpty) None
    else {
      val micros = ws.map { w =>
        val p = (c3.getOrElse(w, 0L) + 1).toDouble /
          (c2.getOrElse(w.take(2), 0L) + CharLm.SmoothV).toDouble
        math.round(math.log(p) / math.log(2.0) * 1e6)
      }
      val mean = micros.sum.toDouble / (micros.size * 1e6)
      Some(BigDecimal(math.pow(2.0, -mean))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the log"),
    (3L, "a completely different phrasing here"),
    (4L, "zz"), // no trigram window
    (5L, "the cat sat on the mat")) // exact dup of 1: in-distribution

  test("perplexity matches the independent reference on every doc; " +
    "in-distribution text scores lower than out-of-distribution") {
    val docs = corpus.toDF("doc_id", "text")
    val model = CharLm.train(docs, "text")
    val got = CharLm.perplexity(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    for ((id, n, ppl) <- got) {
      val t = corpus.find(_._1 == id).get._2
      withClue(s"doc $id: ") {
        n shouldBe math.max(0, t.length - 2).toLong
        ppl shouldBe refPpl(corpus.map(_._2), t)
      }
    }
    // the repeated sentence is maximally in-distribution; the unique
    // phrasing is the outlier — the filtering signal points the right way
    val byId = got.map(g => g._1 -> g._3).toMap
    byId(1L).get should be < byId(3L).get
    // no-window doc: NULL ppl, zero windows — absence of evidence
    byId(4L) shouldBe None
  }

  test("unseen trigrams score under add-one smoothing, never NaN/zero") {
    val docs = corpus.toDF("doc_id", "text")
    val model = CharLm.train(docs.filter(col("doc_id") <= 2), "text")
    val out = CharLm.perplexity(Seq((9L, "qqqq never seen")).toDF("doc_id", "text"),
      "doc_id", "text", model).collect()(0)
    out.getLong(1) shouldBe 13L
    val ppl = out.getDouble(2)
    ppl.isNaN shouldBe false
    ppl should be > 1.0
  }

  test("plan: model broadcasts, no cartesian, no UDF — the scoring pass " +
    "is explode + two broadcast joins + one keyed agg") {
    val docs = corpus.toDF("doc_id", "text")
    val df = CharLm.perplexity(docs, "doc_id", "text", CharLm.train(docs, "text"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p.toLowerCase should not include "batchevalpython"
    df.queryExecution.analyzed.toString.toLowerCase should not include "scalaudf"
  }

  test("qc3 owns no cache: the scored-frame persist releases before the " +
    "report is handed back (VERDICT r17 #3 — repeated calls in a " +
    "long-lived session must not accumulate MEMORY_AND_DISK blocks)") {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val out = graft.queries.PipelineQueries.defs("qc3_ppl_buckets")(spark, sf)
    out.collect().length shouldBe 3
    spark.sparkContext.getPersistentRDDs shouldBe empty
  }
}
