package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixing

/** Source-mixing operator gates: hash-gate determinism and rate
  * accuracy for [[Mixing.sampleBySource]], the flattening arithmetic
  * for [[Mixing.temperatureRates]]. The exact-rate (0/1) behavior is
  * oracle-gated by sm1; these cover what a VALUES oracle can't — the
  * statistical middle and cross-run reproducibility.
  */
class MixingSpec extends SparkSpec {

  private def corpus(nWeb: Int, nBooks: Int, nCode: Int) = {
    import spark.implicits._
    ((0 until nWeb).map(i => (i.toLong, "web")) ++
      (0 until nBooks).map(i => (100000L + i, "books")) ++
      (0 until nCode).map(i => (200000L + i, "code")))
      .toDF("doc_id", "source")
  }

  test("sampleBySource: intermediate rates land near target and are deterministic") {
    val df = corpus(8000, 4000, 2000)
    val rates = Map("web" -> 0.25, "books" -> 0.5, "code" -> 1.0)
    val once = Mixing.sampleBySource(df, "doc_id", "source", rates)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    once("web").toDouble shouldBe (2000.0 +- 200.0)
    once("books").toDouble shouldBe (2000.0 +- 200.0)
    once("code") shouldBe 2000L
    // same salt → identical KEPT SET, not just counts
    val a = Mixing.sampleBySource(df, "doc_id", "source", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Mixing.sampleBySource(df, "doc_id", "source", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    a shouldBe b
    // different salt → a genuinely different (but same-sized-ish) draw
    val c = Mixing.sampleBySource(df, "doc_id", "source", rates, salt = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    c should not be a
  }

  test("temperatureRates: alpha=0 equalizes, alpha=1 changes nothing") {
    val df = corpus(8000, 4000, 2000)
    val r0 = Mixing.temperatureRates(df, "source", alpha = 0.0)
    // keep ∝ 1/n, anchored at the smallest source
    r0("code") shouldBe 1.0 +- 1e-9
    r0("books") shouldBe 0.5 +- 1e-9
    r0("web") shouldBe 0.25 +- 1e-9
    val kept = Mixing.sampleBySource(df, "doc_id", "source", r0)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    // flattened: all three sources near 2000
    kept.values.foreach(_ shouldBe (2000.0 +- 200.0))
    val r1 = Mixing.temperatureRates(df, "source", alpha = 1.0)
    r1.values.foreach(_ shouldBe 1.0 +- 1e-9)
  }

  test("sampleBySource: unknown source uses defaultRate; rates clamp") {
    val df = corpus(100, 0, 0)
    Mixing.sampleBySource(df, "doc_id", "source",
      Map("other" -> 1.0), defaultRate = 0.0).count() shouldBe 0L
    Mixing.sampleBySource(df, "doc_id", "source",
      Map("web" -> 2.5)).count() shouldBe 100L // clamps to 1.0
  }

  test("water-filling rates deliver the budget; capped rates stop at the shortfall") {
    // avail: a=1000, b=1000, c=100; weights 1/1/2 → desired 250/250/500
    // c saturates at 100; its unused 400 redistributes 200/200 → final
    // water-fill 450/450/100 of a 1000 budget (hand-derived)
    val avail = Map("a" -> 1000L, "b" -> 1000L, "c" -> 100L)
    val w = Map("a" -> 1.0, "b" -> 1.0, "c" -> 2.0)
    val wf = Mixing.waterFillRates(avail, w, budget = 1000L)
    wf("c") shouldBe 1.0
    wf("a") shouldBe 0.45 +- 1e-12
    wf("b") shouldBe 0.45 +- 1e-12
    // delivered tokens = budget exactly (in expectation)
    avail.map { case (s, a) => wf(s) * a }.sum shouldBe 1000.0 +- 1e-9
    // capped form keeps c's shortfall undelivered: 250+250+100 = 600
    val cp = Mixing.cappedTokenRates(avail, w, budget = 1000L)
    cp("c") shouldBe 1.0
    cp("a") shouldBe 0.25 +- 1e-12
    avail.map { case (s, a) => cp(s) * a }.sum shouldBe 600.0 +- 1e-9
    // no saturation (desired c = 160·2/4 = 80 < 100) → forms agree
    Mixing.waterFillRates(avail, w, 160L) shouldBe
      Mixing.cappedTokenRates(avail, w, 160L)
    // budget ≥ total available → everything kept (weighted sources)
    Mixing.waterFillRates(avail, w, 10000L).values.toSet shouldBe Set(1.0)
    // weightless source gets nothing under both forms
    val w2 = Map("a" -> 1.0)
    Mixing.waterFillRates(avail, w2, 500L)("b") shouldBe 0.0
    Mixing.cappedTokenRates(avail, w2, 500L)("c") shouldBe 0.0
  }

  test("token-budget sample: deterministic gate, saturated source kept whole") {
    import spark.implicits._
    val docs = ((0L until 200L).map(i => (i, "w " * 10, "big")) ++
      (200L until 210L).map(i => (i, "w " * 10, "small")))
      .toDF("doc_id", "text", "source")
      .withColumn("toks", lit(10L))
    // budget 1000 tokens, equal weights: small (100 avail) saturates,
    // water-fill sends the rest to big
    val plan = Mixing.tokenBudgetSample(docs, "doc_id", "source", "toks",
      Map("big" -> 1.0, "small" -> 1.0), budget = 1000L, seed = 3L)
    plan.rates("small") shouldBe 1.0
    plan.rates("big") shouldBe 0.45 +- 1e-12
    val kept = plan.sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept("small") shouldBe 10L // rate 1.0 keeps every row
    kept("big") should (be > 50L and be < 130L) // ~90 expected at 0.45
    // same seed → identical sample; different seed → decides anew
    val again = Mixing.tokenBudgetSample(docs, "doc_id", "source", "toks",
      Map("big" -> 1.0, "small" -> 1.0), budget = 1000L, seed = 3L)
    again.sampled.collect().map(_.getLong(0)).sorted shouldBe
      plan.sampled.collect().map(_.getLong(0)).sorted
  }

  test("token-budget sample: null source rows carry no budget and never crash") {
    import spark.implicits._
    val docs = Seq((1L, "a", Some(10L)), (2L, null.asInstanceOf[String], Some(10L)),
      (3L, "a", None))
      .toDF("doc_id", "source", "toks")
    val plan = Mixing.tokenBudgetSample(docs, "doc_id", "source", "toks",
      Map("a" -> 1.0), budget = 1000L)
    plan.avail shouldBe Map("a" -> 10L) // null source / null toks excluded
    plan.rates("a") shouldBe 1.0
    // the null-source row drops at the gate (rate 0); the null-TOKEN row
    // of source "a" drops too — it carries no metered budget, so keeping
    // it would overshoot the budget by unmetered tokens; doc 1 survives
    plan.sampled.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L)
  }

  test("unigram LM: vocab cut is deterministic, OOV penalized, empty doc null") {
    import spark.implicits._
    import graft.operators.UnigramLM
    val docs = Seq((1L, "a a b"), (2L, "a b c"), (3L, "z z"), (4L, "  "))
      .toDF("doc_id", "text")
    val m = UnigramLM.fit(docs, "text", vocabSize = 3)
    m.keySet shouldBe Set("a", "b", "z") // count desc, token asc tie-break
    m("a") shouldBe math.log(3.0 / 8.0) +- 1e-12
    val scores = docs.select(col("doc_id"),
        UnigramLM.score(col("text"), m, oovLogProb = -5.0).as("s"))
      .orderBy("doc_id").collect()
    // OOV 'c' drags doc 2 far below the in-vocab docs
    scores(1).getDouble(1) should be < scores(0).getDouble(1)
    scores(1).getDouble(1) should be < scores(2).getDouble(1)
    scores(3).isNullAt(1) shouldBe true // whitespace-only doc
    // fit twice → identical model (deterministic tie-break)
    UnigramLM.fit(docs, "text", vocabSize = 3) shouldBe m
  }
}
