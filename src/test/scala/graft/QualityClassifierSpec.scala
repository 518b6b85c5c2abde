package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier
import graft.plans.HashedBow
import graft.queries.PlantedFixtures

/** Quality classifier: held-out separation on the planted labeled
  * fixture, loss convergence, fused-score ≡ feature-dot parity,
  * partitioning determinism, and null/empty posture. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = PlantedFixtures.labeledDocs(spark)

  private def heldOutPreds(dim: Int = 128, iters: Int = 40): Map[Long, Int] =
    {
      val all = fixture
      val m = QualityClassifier.train(
        all.filter(col("doc_id") % 2 === 0).repartition(2),
        "text", "label", dim = dim, iters = iters)
      QualityClassifier.classify(all, "text", m)
        .select("doc_id", "pred").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    }

  test("trained on the even half, every doc (held-out odds included) classifies correctly", Slow) {
    val preds = heldOutPreds()
    preds.size shouldBe 24
    for ((id, p) <- preds)
      withClue(s"doc $id: ") { p shouldBe (if (id <= 12) 1 else 0) }
  }

  test("training loss decreases and the trained model separates with real margin", Slow) {
    val train = fixture.filter(col("doc_id") % 2 === 0).repartition(2)
    val (m, losses) = QualityClassifier.trainWithLoss(
      train, "text", "label", dim = 128, iters = 40)
    losses.head shouldBe (math.log(2.0) +- 1e-12) // untrained = coin flip
    losses.last should be < losses.head / 3.0
    // margins must dwarf float-order noise (~1e-15) for the label pin
    // to be sound; 0.1 is 14 orders of magnitude of headroom
    val probs = QualityClassifier.score(fixture, "text", m)
      .select("label", "quality_prob").collect()
    for (r <- probs) {
      val margin = math.abs(r.getDouble(1) - 0.5)
      withClue(s"label ${r.getInt(0)}: ") { margin should be > 0.1 }
    }
  }

  test("fused scoring expression equals dot-product over materialized features") {
    val m = QualityClassifier.train(
      fixture.repartition(2), "text", "label", dim = 64, iters = 20)
    val rows = QualityClassifier.score(fixture, "text", m)
      .select(col("doc_id"), QualityClassifier.features(col("text"), 64).as("x"),
        col("quality_prob"))
      .collect()
    for (r <- rows) {
      val x = r.getSeq[Double](1)
      val z = m.bias + x.zip(m.weights).map { case (a, b) => a * b }.sum
      val expected = 1.0 / (1.0 + math.exp(-z))
      r.getDouble(2) shouldBe (expected +- 1e-12)
    }
  }

  test("predicted labels are invariant to input partitioning", Slow) {
    val a = heldOutPreds()
    val all = fixture.repartition(7)
    val m = QualityClassifier.train(
      all.filter(col("doc_id") % 2 === 0).repartition(5),
      "text", "label", dim = 128, iters = 40)
    val b = QualityClassifier.classify(all, "text", m)
      .select("doc_id", "pred").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    b shouldBe a
  }

  test("null and empty text score the class prior and never crash") {
    val m = QualityClassifier.train(
      fixture.repartition(2), "text", "label", dim = 64, iters = 10)
    val edge = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "  \t \n "))
      .toDF("doc_id", "text")
    val prior = 1.0 / (1.0 + math.exp(-m.bias))
    val got = QualityClassifier.score(edge, "text", m)
      .select("quality_prob").collect().map(_.getDouble(0))
    all(got) shouldBe (prior +- 1e-12)
  }

  test("labels outside {0,1} or null are rejected before any gradient math") {
    val bad = Seq((1L, "some text", 5), (2L, "more text", 0)).toDF("doc_id", "text", "label")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.train(bad, "text", "label", dim = 16, iters = 1)
    }
    e.getMessage should include("must be 0/1")
    val withNull = Seq((1L, "a", Some(1)), (2L, "b", None))
      .toDF("doc_id", "text", "label")
    intercept[IllegalArgumentException] {
      QualityClassifier.train(withNull, "text", "label", dim = 16, iters = 1)
    }
  }

  test("token-bucket map is a pure stable function") {
    HashedBow.bucket("study", 128, 42) shouldBe HashedBow.bucket("study", 128, 42)
    HashedBow.featurize("a b a", 16, 42).sum shouldBe (1.0 +- 1e-12)
    HashedBow.featurize("  ", 16, 42).forall(_ == 0.0) shouldBe true
    // case-folding: tokens differing only by case share a bucket
    HashedBow.featurize("Study", 128, 42) shouldBe HashedBow.featurize("study", 128, 42)
    // bigram features average over ALL grams (n unigrams + n-1 bigrams)
    HashedBow.featurize("a b a", 64, 42, 2).sum shouldBe (1.0 +- 1e-12)
    // a single-token doc has no bigrams: orders agree
    HashedBow.featurize("solo", 64, 42, 2) shouldBe
      HashedBow.featurize("solo", 64, 42, 1)
  }

  test("bigrams separate word-order classes that unigram multisets cannot") {
    // every doc holds exactly the same unigram MULTISET (one alpha,
    // one beta) — the classes differ only in adjacency: label 1 docs
    // read 'alpha beta', label 0 docs 'beta alpha'. A unigram
    // model sees identical feature vectors for both classes, so its
    // loss is pinned at the ln(2) coin flip; the bigram model separates
    // perfectly on the exact same inputs.
    val docs = ((1L to 6L).map(i => (i, "alpha beta", 1)) ++
      (11L to 16L).map(i => (i, "beta alpha", 0)))
      .toDF("doc_id", "text", "label")
    val (uni, uniLoss) = QualityClassifier.trainWithLoss(
      docs, "text", "label", dim = 128, iters = 30, ngrams = 1)
    // identical features per class → gradient keeps p at 0.5 exactly
    uniLoss.last shouldBe (math.log(2.0) +- 1e-9)
    val (bi, biLoss) = QualityClassifier.trainWithLoss(
      docs, "text", "label", dim = 128, iters = 60, ngrams = 2)
    biLoss.last should be < math.log(2.0) / 3.0
    val preds = QualityClassifier.classify(docs, "text", bi)
      .select("doc_id", "pred").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, p) <- preds)
      withClue(s"doc $id: ") { p shouldBe (if (id <= 6) 1 else 0) }
    // the unigram model genuinely can't: both orderings score equal
    val uniProbs = QualityClassifier.score(docs, "text", uni)
      .select("quality_prob").collect().map(_.getDouble(0)).distinct
    uniProbs.length shouldBe 1
  }

  test("SQL surface: graft_quality_score with a model-spec literal equals the Column form") {
    val docs = ((1L to 6L).map(i => (i, "alpha beta", 1)) ++
      (11L to 16L).map(i => (i, "beta alpha", 0)))
      .toDF("doc_id", "text", "label")
    val m = QualityClassifier.train(docs, "text", "label",
      dim = 128, iters = 30, ngrams = 2)
    // spec round-trips the model exactly (Double.toString ↔ toDouble)
    val rt = QualityClassifier.parseModelSpec(m.spec)
    rt.bias shouldBe m.bias
    rt.seed shouldBe m.seed
    rt.ngrams shouldBe m.ngrams
    rt.weights.toSeq shouldBe m.weights.toSeq
    docs.union(Seq((99L, null.asInstanceOf[String], 0)).toDF("doc_id", "text", "label"))
      .createOrReplaceTempView("qc_sql_view")
    val viaSql = spark.sql(
      s"SELECT doc_id, graft_quality_score(text, '${m.spec}') AS p FROM qc_sql_view")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaColumn = spark.table("qc_sql_view")
      .select(col("doc_id"), m.prob(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    viaSql shouldBe viaColumn // bit-identical, nulls included
    intercept[Exception] {
      spark.sql("SELECT graft_quality_score(text, text) FROM qc_sql_view").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_quality_score(text, '42 1') FROM qc_sql_view").collect()
    }
  }
}
