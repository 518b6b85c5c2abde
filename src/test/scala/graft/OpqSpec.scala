package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Opq, Pq}

/** OPQ rotation tests: orthogonality of the trained rotation, exact
  * identity-convergence on the lossless axis-aligned fixture (the
  * `ann10_opq_topk` oracle's premise), and the real ADC-recall lift on
  * a planted ANISOTROPIC fixture — the geometry OPQ exists for, and
  * the one the bench corpus's measured-isotropic embeddings cannot
  * show (Opq scaladoc). */
class OpqSpec extends SparkSpec {

  private def orthogonalityError(r: Array[Array[Double]]): Double = {
    val d = r.length
    var worst = 0.0
    for (i <- 0 until d; j <- 0 until d) {
      var s = 0.0
      var t = 0
      while (t < d) { s += r(i)(t) * r(j)(t); t += 1 }
      val expect = if (i == j) 1.0 else 0.0
      worst = math.max(worst, math.abs(s - expect))
    }
    worst
  }

  /** Planted anisotropic corpus: x = (u, 0.6·v, u, 0.6·v) for u, v on
    * an 8×8 grid (+ a deterministic sub-ulp-free jitter to keep
    * rankings strict). Axis-aligned PQ with m=2 must spend each
    * subspace's k=8 codes on a 2-D 64-combination grid; a rotation
    * that maps the (x0+x2)/√2 and (x1+x3)/√2 directions into SEPARATE
    * subspaces makes each subspace effectively 1-D with exactly 8
    * levels — the cross-subspace correlation OPQ's eigen-allocation
    * init + Procrustes alternation is built to find. The 0.6 scale on
    * v matters: it makes the covariance spectrum DECAY (λu ≠ λv), the
    * geometry real model embeddings have. With λu = λv the top
    * eigenspace is degenerate, the parametric optimum is non-unique
    * (any basis of the u-v plane is an eigenbasis), and eigen-init
    * legitimately lands on a u/v-mixing rotation — OPQ's published
    * guarantees don't cover a perfectly flat spectrum, and the spec
    * shouldn't demand what the method doesn't promise. */
  private def anisotropic() = {
    import spark.implicits._
    val rows = for (u <- 0 until 8; v <- 0 until 8) yield {
      val id = (u * 8 + v).toLong
      val ju = u + 0.013 * ((id * 7) % 5)
      val jv = 0.6 * (v + 0.017 * ((id * 11) % 3))
      (id, Seq(ju, jv, ju, jv).map(_.toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("trained rotation is orthogonal; identity fixture converges to identity", Slow) {
    // lossless fixture (ann9's): exact quantization → M = Σ x·xᵀ is
    // symmetric PSD → Procrustes returns (numerically) the identity
    val embs = graft.queries.PlantedFixtures.pqVectors(spark)
    val model = Opq.train(embs, "embedding",
      graft.queries.PlantedFixtures.PqFixtureDim, m = 2, k = 4,
      lloydIters = 2, opqIters = 2)
    orthogonalityError(model.rotation) should be < 1e-9
    val d = model.rotation.length
    for (i <- 0 until d; j <- 0 until d)
      model.rotation(i)(j) shouldBe (if (i == j) 1.0 else 0.0) +- 1e-9
    // and the OPQ scores equal plain-PQ scores on this fixture
    val q = Seq(1.0, 0.0, 5.0, 0.0)
    val opq = Opq.topK(embs, "vec_id", "embedding", q, 8, model)
      .collect().map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e4))
    val pq = Pq.pqTopK(embs, "vec_id", "embedding",
        graft.queries.PlantedFixtures.PqFixtureDim, q, 8, m = 2, kCodes = 4,
        iters = 2)
      .collect().map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e4))
    opq.toSeq shouldBe pq.toSeq
  }

  test("guards: query-dim mismatch throws; null / wrong-dim rows are filtered from training") {
    import spark.implicits._
    val dim = graft.queries.PlantedFixtures.PqFixtureDim
    val dirty = graft.queries.PlantedFixtures.pqVectors(spark).unionByName(
      Seq((100L, null.asInstanceOf[Seq[Float]]), (101L, Seq(1.0f, 2.0f)))
        .toDF("vec_id", "embedding"))
    // training ignores the malformed rows: identical model to the clean fixture
    val clean = Opq.train(graft.queries.PlantedFixtures.pqVectors(spark),
      "embedding", dim, m = 2, k = 4, lloydIters = 2, opqIters = 2)
    val model = Opq.train(dirty, "embedding", dim, m = 2, k = 4,
      lloydIters = 2, opqIters = 2)
    model.rotation.map(_.toSeq).toSeq shouldBe clean.rotation.map(_.toSeq).toSeq
    model.cb.books.map(_.map(_.toSeq).toSeq).toSeq shouldBe
      clean.cb.books.map(_.map(_.toSeq).toSeq).toSeq
    intercept[IllegalArgumentException] {
      Opq.topK(dirty, "vec_id", "embedding", Seq(1.0, 0.0), 5, model)
    }
    // malformed rows encode NULL through the rotate→encode path and
    // never rank
    val got = Opq.topK(dirty, "vec_id", "embedding",
      Seq(1.0, 0.0, 5.0, 0.0), 16, model).collect().map(_.getLong(0)).toSet
    got.intersect(Set(100L, 101L)) shouldBe Set.empty
  }

  test("model spec round-trips exactly and queries identically") {
    val embs = graft.queries.PlantedFixtures.pqVectors(spark)
    val model = Opq.train(embs, "embedding",
      graft.queries.PlantedFixtures.PqFixtureDim, m = 2, k = 4,
      lloydIters = 2, opqIters = 2)
    val rt = Opq.fromSpec(Opq.spec(model))
    rt.rotation.map(_.toSeq).toSeq shouldBe model.rotation.map(_.toSeq).toSeq
    rt.cb.books.map(_.map(_.toSeq).toSeq).toSeq shouldBe
      model.cb.books.map(_.map(_.toSeq).toSeq).toSeq
    intercept[IllegalArgumentException] { Opq.fromSpec("pqv1;4;2;4;x") }
    val q = Seq(1.0, 0.0, 5.0, 0.0)
    Opq.topK(embs, "vec_id", "embedding", q, 8, rt)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq shouldBe
      Opq.topK(embs, "vec_id", "embedding", q, 8, model)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("anisotropic fixture: OPQ rotation lifts raw-ADC agreement over axis-aligned PQ", Slow) {
    val embs = anisotropic().cache()
    val dim = 4
    val q = embs.filter(col("vec_id") === 27) // u=3, v=3 — interior point
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = ids(Ann.bruteForceTopK(embs, "vec_id", "embedding",
      embs.filter(col("vec_id") === 27).select(col("embedding").as("qv")),
      "qv", 10)).toSet
    val pqCb = Pq.train(embs, "embedding", dim, m = 2, k = 8, iters = 4)
    val pqTop = ids(Pq.topK(embs, "vec_id", "embedding", q, 10, pqCb)).toSet
    val model = Opq.train(embs, "embedding", dim, m = 2, k = 8,
      lloydIters = 4, opqIters = 6)
    orthogonalityError(model.rotation) should be < 1e-9
    val opqTop = ids(Opq.topK(embs, "vec_id", "embedding", q, 10, model)).toSet
    val pqRecall = (exact & pqTop).size / 10.0
    val opqRecall = (exact & opqTop).size / 10.0
    withClue(s"pqRecall=$pqRecall opqRecall=$opqRecall: ") {
      opqRecall should be >= pqRecall
      opqRecall should be >= 0.8
    }
    embs.unpersist(blocking = false)
  }
}
