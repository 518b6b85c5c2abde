package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, HardNegatives}

/** Hard-negative mining: planted cosine geometry, triplet composition,
  * the lossless-shortlist equivalence, lossy-shortlist recall, the
  * shortlist guard, and the broadcast plan shape. */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  private def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  // anchor 0 (label 0): positive twin 1 (cos 1.0), same-label 4
  // (cos .98); negatives 2 (label 1, cos ≈ .995) and 3 (label 1,
  // cos 0). id 5 is the only label-9 row — an anchor with no positive.
  private def embs = Seq(
    (0L, v(1, 0), 0), (1L, v(1, 0), 0), (2L, v(1, 0.1), 1),
    (3L, v(0, 1), 1), (4L, v(1, 0.2), 0), (5L, v(1, 1), 9))
    .toDF("vec_id", "embedding", "label")

  test("mineExact: hardest mismatched labels, best-first by (sim, id)") {
    val anchors = embs.filter(col("vec_id") === 0)
    val r = HardNegatives.mineExact(embs, "vec_id", "embedding", "label",
        anchors, "vec_id", "embedding", "label", k = 2)
      .select(col("anchor_id"), col("vec_id"), round(col("sim"), 3))
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    // mismatched-label candidates: 2 (cos 1/√1.01 ≈ .995), 5 (cos
    // 1/√2 ≈ .707), 3 (cos 0) → top-2 = {2, 5}; the label-0 twins
    // 1/4 never appear however similar
    r shouldBe Array((0L, 2L, 0.995), (0L, 5L, 0.707))
  }

  test("minePositives: same label only, self excluded") {
    val anchors = embs.filter(col("vec_id") === 0)
    val r = HardNegatives.minePositives(embs, "vec_id", "embedding",
        "label", anchors, "vec_id", "embedding", "label", k = 2)
      .select(col("anchor_id"), col("vec_id"), round(col("sim"), 3))
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    r shouldBe Array((0L, 1L, 1.0), (0L, 4L, 0.981))
  }

  test("triplets: hardest positive × ranked negatives; no-positive anchors drop") {
    val anchors = embs.filter(col("vec_id").isin(0L, 5L))
    val r = HardNegatives.triplets(embs, "vec_id", "embedding", "label",
        anchors, "vec_id", "embedding", "label", k = 2)
      .select(col("anchor_id"), col("pos_id"), col("neg_id"),
        col("neg_rank"))
      .as[(Long, Long, Long, Int)].collect()
    // anchor 5 has no second label-9 row -> no triplet; anchor 0 pairs
    // its exact twin with negatives ranked 2 (hardest) then 5
    r shouldBe Array((0L, 1L, 2L, 1), (0L, 1L, 5L, 2))
  }

  test("lossless shortlist (full probe + cover) equals mineExact") {
    val d = Tables(spark, sf, "embeddings")
    val anchors = d.filter(col("vec_id") % 20 === 0)
    val cents = Ann.trainIvfCells(d, "vec_id", "embedding",
      graft.queries.PipelineQueries.EmbDim, nCells = 4, iters = 3)
    val exact = HardNegatives.mineExact(d, "vec_id", "embedding", "label",
      anchors, "vec_id", "embedding", "label", k = 5)
    val short = HardNegatives.mineShortlisted(d, "vec_id", "embedding",
      "label", anchors, "vec_id", "embedding", "label", k = 5,
      dim = graft.queries.PipelineQueries.EmbDim, cents = cents,
      nProbe = 4, shortlist = 100000)
    val a = exact.select("anchor_id", "vec_id").as[(Long, Long)]
      .collect().sorted
    val b = short.select("anchor_id", "vec_id").as[(Long, Long)]
      .collect().sorted
    b shouldBe a
  }

  test("lossy shortlist keeps useful recall at serving settings") {
    val d = Tables(spark, sf, "embeddings")
    val anchors = d.filter(col("vec_id") % 20 === 0)
    val cents = Ann.trainIvfCells(d, "vec_id", "embedding",
      graft.queries.PipelineQueries.EmbDim, nCells = 4, iters = 3)
    val exact = HardNegatives.mineExact(d, "vec_id", "embedding", "label",
        anchors, "vec_id", "embedding", "label", k = 5)
      .select("anchor_id", "vec_id").as[(Long, Long)].collect().toSet
    val lossy = HardNegatives.mineShortlisted(d, "vec_id", "embedding",
        "label", anchors, "vec_id", "embedding", "label", k = 5,
        dim = graft.queries.PipelineQueries.EmbDim, cents = cents,
        nProbe = 2, shortlist = 50)
      .select("anchor_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & lossy).size.toDouble / exact.size
    recall should be >= 0.5
  }

  test("shortlist below k fails loudly") {
    val e = intercept[IllegalArgumentException] {
      HardNegatives.mineShortlisted(embs, "vec_id", "embedding", "label",
        embs, "vec_id", "embedding", "label", k = 5, dim = 2,
        cents = Seq(Seq(1.0, 0.0)), nProbe = 1, shortlist = 3)
    }
    e.getMessage should include("shortlist")
  }

  test("mineAuto: certificate escalation equals mineExact with no knobs") {
    val d = Tables(spark, sf, "embeddings")
    val anchors = d.filter(col("vec_id") % 20 === 0)
    val cents = Ann.trainIvfCells(d, "vec_id", "embedding",
      graft.queries.PipelineQueries.EmbDim, nCells = 4, iters = 3)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("anchor_id"), col("vec_id"), round(col("sim"), 6))
      .as[(Long, Long, Double)].collect().sorted
    val exact = rows(HardNegatives.mineExact(d, "vec_id", "embedding",
      "label", anchors, "vec_id", "embedding", "label", k = 5))
    // initProbe=1 stresses the escalation: most of the answer must
    // come from certificate-triggered phase-2 cells
    val auto = rows(HardNegatives.mineAuto(d, "vec_id", "embedding",
      "label", anchors, "vec_id", "embedding", "label", k = 5,
      cents = cents, initProbe = 1))
    auto shouldBe exact
  }

  test("mineAuto: certificate PRUNES far cells on clustered geometry") {
    // three tight clusters on the unit circle at 0°/30°/90°, one label
    // each; the anchor (label 0, at 0°) mines k=2 negatives — all in
    // the 30° cluster. The 90° cell's bound cos(90°−θ_C) ≈ 0.07 can
    // never beat s_k = cos(30°), so it is NEVER probed, and the answer
    // still equals the exact scan.
    def p(deg: Double, id: Long, lbl: Int) = {
      val r = math.toRadians(deg)
      (id, v(math.cos(r), math.sin(r)), lbl)
    }
    val data = Seq(
      p(0, 0, 0), p(2, 1, 0), p(-2, 2, 0),
      p(30, 10, 1), p(32, 11, 1), p(28, 12, 1),
      p(90, 20, 2), p(88, 21, 2), p(92, 22, 2))
      .toDF("vec_id", "embedding", "label")
    val c30 = math.toRadians(30)
    val cents = Seq(Seq(1.0, 0.0), Seq(math.cos(c30), math.sin(c30)),
      Seq(0.0, 1.0))
    val anchors = data.filter(col("vec_id") === 0)
    val (res, probed) = HardNegatives.mineAutoWithDiag(data, "vec_id",
      "embedding", "label", anchors, "vec_id", "embedding", "label",
      k = 2, cents = cents, initProbe = 2)
    res.select(col("anchor_id"), col("vec_id"), round(col("sim"), 3))
      .as[(Long, Long, Double)].collect().sortBy(_._2) shouldBe
      Array((0L, 10L, 0.866), (0L, 12L, 0.883))
    probed.count() shouldBe 2L // phase-1 cells only; 90° cell pruned
  }

  test("mineAuto: label starvation escalates to a full probe") {
    // anchor's own cell is pure label-0; the ONLY negative lives in
    // the far cell. Phase 1 (initProbe=1) finds nothing → sentinel
    // threshold → phase 2 probes everything → the negative surfaces.
    val data = Seq(
      (0L, v(1, 0), 0), (1L, v(0.99, 0.1), 0), (2L, v(0.98, 0.05), 0),
      (3L, v(0, 1), 1)).toDF("vec_id", "embedding", "label")
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val anchors = data.filter(col("vec_id") === 0)
    val (res, probed) = HardNegatives.mineAutoWithDiag(data, "vec_id",
      "embedding", "label", anchors, "vec_id", "embedding", "label",
      k = 2, cents = cents, initProbe = 1)
    res.select(col("anchor_id"), col("vec_id"), round(col("sim"), 3))
      .as[(Long, Long, Double)].collect() shouldBe Array((0L, 3L, 0.0))
    probed.count() shouldBe 2L // both cells paid — loudly, not silently
  }

  test("mineAutoBudgeted: probe cap cuts cells, incompleteness is REPORTED") {
    // four single-label cells on the unit circle; the anchor (label 0,
    // 0°) has negatives at 40°/70°/90°. Phase 1 (initProbe=1) probes
    // the own cell and starves → every other cell qualifies. At
    // maxProbeFrac=0.5 the per-anchor budget is floor(0.5·4)−1 = 1
    // phase-2 cell, so only the best-bound 40° cell is probed: the
    // result holds just that negative and the anchor is reported
    // UNCERTIFIED — never a silent full scan, never a silent miss.
    def p(deg: Double, id: Long, lbl: Int) = {
      val r = math.toRadians(deg)
      (id, v(math.cos(r), math.sin(r)), lbl)
    }
    val data = Seq(p(0, 0, 0), p(2, 1, 0),
      p(40, 10, 1), p(70, 20, 1), p(90, 30, 1))
      .toDF("vec_id", "embedding", "label")
    val cents = Seq(0.0, 40.0, 70.0, 90.0).map { deg =>
      val r = math.toRadians(deg); Seq(math.cos(r), math.sin(r))
    }
    val anchors = data.filter(col("vec_id") === 0)
    val (res, status) = HardNegatives.mineAutoBudgeted(data, "vec_id",
      "embedding", "label", anchors, "vec_id", "embedding", "label",
      k = 2, cents = cents, initProbe = 1, maxProbeFrac = 0.5)
    res.select(col("anchor_id"), col("vec_id"), round(col("sim"), 3))
      .as[(Long, Long, Double)].collect() shouldBe Array((0L, 10L, 0.766))
    status.as[(Long, Boolean)].collect() shouldBe Array((0L, false))
    // full budget degenerates to the exact path, every anchor certified
    val (resFull, statusFull) = HardNegatives.mineAutoBudgeted(data,
      "vec_id", "embedding", "label", anchors, "vec_id", "embedding",
      "label", k = 2, cents = cents, initProbe = 1, maxProbeFrac = 1.0)
    resFull.select(col("anchor_id"), col("vec_id"), round(col("sim"), 3))
      .as[(Long, Long, Double)].collect().sortBy(_._2) shouldBe
      Array((0L, 10L, 0.766), (0L, 20L, 0.342))
    statusFull.as[(Long, Boolean)].collect() shouldBe Array((0L, true))
  }

  test("triplets: ONE corpus scan serves both polarities (plan pin)") {
    // corpus from parquet, anchors in-memory — every "Scan parquet" in
    // the plan IS a corpus scan. The two-mineWith form scanned twice.
    val d = Tables(spark, sf, "embeddings")
    val anchors = embs.filter(col("vec_id") === 0)
    val p = HardNegatives.triplets(d, "vec_id", "embedding", "label",
        anchors, "vec_id", "embedding", "label", k = 2)
      .queryExecution.executedPlan.toString
    "Scan parquet".r.findAllIn(p).size shouldBe 1
  }

  test("triplets: NULL-label corpus rows are dropped, not crashed on") {
    // an unlabeled row makes the polarity predicate NULL; before the
    // isNotNull guard, NULL || (id =!= aid) = true let it through and
    // the primitive-Boolean deserializer threw at runtime
    val withNull = Seq(
      (0L, v(1, 0), Some(0)), (1L, v(1, 0), Some(0)),
      (2L, v(1, 0.1), Some(1)), (6L, v(1, 0.05), None))
      .toDF("vec_id", "embedding", "label")
    val anchors = withNull.filter(col("vec_id") === 0)
    val r = HardNegatives.triplets(withNull, "vec_id", "embedding",
        "label", anchors, "vec_id", "embedding", "label", k = 3)
      .select(col("anchor_id"), col("pos_id"), col("neg_id"))
      .as[(Long, Long, Long)].collect()
    // id 6 (cos ≈ .9988, would out-rank 2 if it survived) must be
    // absent from BOTH polarities
    r shouldBe Array((0L, 1L, 2L))
  }

  test("TwoPoleTopK: full-buffer reject returns the SAME Buf2 (zero alloc)") {
    import graft.operators.{PolarScored, TwoPoleTopK}
    val agg = new TwoPoleTopK(posK = 1, negK = 1)
    var b = agg.zero
    b = agg.reduce(b, PolarScored(0L, 1L, 0.9, pos = true))
    b = agg.reduce(b, PolarScored(0L, 2L, 0.8, pos = false))
    // prime the worst-index caches (first full-buffer touch computes
    // them, allocating once); then rejects must be reference-equal
    b = agg.reduce(b, PolarScored(0L, 3L, 0.1, pos = true))
    b = agg.reduce(b, PolarScored(0L, 4L, 0.1, pos = false))
    val afterPosReject = agg.reduce(b, PolarScored(0L, 5L, 0.2, pos = true))
    assert(afterPosReject eq b)
    val afterNegReject = agg.reduce(b, PolarScored(0L, 6L, 0.2, pos = false))
    assert(afterNegReject eq b)
  }

  test("plan shape: anchor side broadcasts; no shuffle join in mineExact") {
    val anchors = embs.filter(col("vec_id") === 0)
    val p = HardNegatives.mineExact(embs, "vec_id", "embedding", "label",
        anchors, "vec_id", "embedding", "label", k = 2)
      .queryExecution.executedPlan.toString
    p should include("Broadcast")
    p should not include "SortMergeJoin"
  }
}
