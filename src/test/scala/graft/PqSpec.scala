package graft

import org.apache.spark.sql.functions._
import graft.operators.Pq
import graft.queries.PlantedFixtures

/** Product quantization: exact codebook recovery on the integer
  * fixture, lossless encode→ADC equal to true cosine double-for-
  * double, null/shape postures, and the contract guards. The top-k
  * against a DuckDB exact-cosine oracle is ann9's job; recall at sf
  * scale is the pq_recall_at_10 bench gauge. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = PlantedFixtures.PqFixtureDim

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na > 0 && nb > 0) dot / (na * nb) else 0.0
  }

  test("training recovers the planted integer subvalue sets exactly") {
    val cb = Pq.train(PlantedFixtures.pqVectors(spark), "embedding",
      dim, m = 2, k = 4, iters = 2)
    cb.m shouldBe 2
    cb.k shouldBe 4
    cb.books(0).map(_.toSeq).toSet shouldBe PlantedFixtures.PqSubvaluesA.toSet
    cb.books(1).map(_.toSeq).toSet shouldBe PlantedFixtures.PqSubvaluesB.toSet
    // deterministic: retraining yields the identical codebooks
    val again = Pq.train(PlantedFixtures.pqVectors(spark), "embedding",
      dim, m = 2, k = 4, iters = 2)
    again.books.map(_.map(_.toSeq).toSeq).toSeq shouldBe
      cb.books.map(_.map(_.toSeq).toSeq).toSeq
  }

  test("lossless fixture: ADC cosine equals the true cosine, double for double") {
    val embs = PlantedFixtures.pqVectors(spark)
    val cb = Pq.train(embs, "embedding", dim, m = 2, k = 4, iters = 2)
    val q = Seq(1.0, 0.0, 5.0, 0.0) // vec_id 0's vector
    val got = embs.select(col("vec_id"),
        Pq.adcCosine(Pq.encode(col("embedding"), cb), q, cb).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val truth = (for (a <- 0 until 4; b <- 0 until 4) yield
      (a * 4 + b).toLong -> cosine(
        PlantedFixtures.PqSubvaluesA(a) ++ PlantedFixtures.PqSubvaluesB(b), q))
      .toMap
    got.keySet shouldBe truth.keySet
    for ((id, sim) <- got)
      withClue(s"vec $id: ") { sim shouldBe truth(id) } // EXACT, no tolerance
  }

  test("codes are m bytes; encode handles null / short / padded-codebook inputs") {
    val embs = PlantedFixtures.pqVectors(spark)
    val cb = Pq.train(embs, "embedding", dim, m = 2, k = 4, iters = 1)
    val codes = embs.select(Pq.encode(col("embedding"), cb).as("c"))
      .collect().map(_.getAs[Array[Byte]](0))
    all(codes.map(_.length)) shouldBe 2
    codes.map(_.toSeq).distinct.length shouldBe 16 // 4×4 combinations
    // null and wrong-dim vectors encode as NULL, never a garbage code
    val edge = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, None))
      .toDF("id", "embedding")
    val nulls = edge.select(Pq.encode(col("embedding"), cb).as("c")).collect()
    nulls.foreach(_.isNullAt(0) shouldBe true)
    // fewer distinct subvectors than k: pads by cycling, still encodes
    val tiny = Seq((1L, Seq(1.0f, 0.0f, 5.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 7.0f))).toDF("id", "embedding")
    val cb2 = Pq.train(tiny, "embedding", dim, m = 2, k = 4, iters = 1)
    cb2.k shouldBe 4
    val sims = tiny.select(
        Pq.adcCosine(Pq.encode(col("embedding"), cb2),
          Seq(1.0, 0.0, 5.0, 0.0), cb2).as("s"))
      .collect().map(_.getDouble(0))
    // lossless on 2 points; self-cosine is 1.0 up to the sqrt(x)·sqrt(x)
    // ULP (26/(√26·√26) ≠ exactly 1 in double)
    sims.head shouldBe 1.0 +- 1e-12
  }

  test("contract guards: dim split, code width, query dim, foreign codes") {
    val embs = PlantedFixtures.pqVectors(spark)
    intercept[IllegalArgumentException] {
      Pq.train(embs, "embedding", dim, m = 3, k = 4) // 4 % 3 != 0
    }
    intercept[IllegalArgumentException] {
      Pq.train(embs, "embedding", dim, m = 2, k = 300) // > byte range
    }
    val cb = Pq.train(embs, "embedding", dim, m = 2, k = 4, iters = 1)
    intercept[IllegalArgumentException] {
      Pq.adcCosine(col("c"), Seq(1.0, 2.0), cb) // query dim mismatch
    }
    // a code of the wrong width (different model) scores NULL, loudly
    // absent rather than silently mis-ranked
    val foreign = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("c")
    foreign.select(Pq.adcCosine(col("c"), Seq(1.0, 0.0, 5.0, 0.0), cb).as("s"))
      .collect().head.isNullAt(0) shouldBe true
  }

  test("maxTrainRows: bounded training set is deterministic; encoding still covers every row") {
    // 64 distinct vectors, train on a hash-gated ~16: the 100 TB knob —
    // codebooks fit on the sample, encode covers the full corpus
    val corpus = (0 until 64).map(i =>
        (i.toLong, Seq(i % 8, i / 8, (i * 3) % 8, (i * 5) % 8).map(_.toFloat)))
      .toDF("vec_id", "embedding")
    val sampled = Pq.trainingSet(corpus, "embedding", dim, 16L)
    val nSampled = sampled.count()
    nSampled should be > 0L
    nSampled should be < 64L
    // gate is a hash of the vector itself: same rows every call
    sampled.collect().map(_.getSeq[Double](0)).toSet shouldBe
      Pq.trainingSet(corpus, "embedding", dim, 16L)
        .collect().map(_.getSeq[Double](0)).toSet
    val cb = Pq.train(corpus, "embedding", dim, m = 2, k = 4, iters = 2,
      maxTrainRows = 16L)
    val again = Pq.train(corpus, "embedding", dim, m = 2, k = 4, iters = 2,
      maxTrainRows = 16L)
    again.books.map(_.map(_.toSeq).toSeq).toSeq shouldBe
      cb.books.map(_.map(_.toSeq).toSeq).toSeq
    // every corpus row encodes (codes are total over the corpus even
    // though training saw a fraction of it)
    val codes = corpus.select(Pq.encode(col("embedding"), cb).as("c")).collect()
    codes.foreach(_.isNullAt(0) shouldBe false)
    codes.map(_.getAs[Array[Byte]](0).length).toSet shouldBe Set(2)
    // maxTrainRows >= n is the identity gate: codebooks equal the full run
    val full = Pq.train(corpus, "embedding", dim, m = 2, k = 4, iters = 2)
    val capped = Pq.train(corpus, "embedding", dim, m = 2, k = 4, iters = 2,
      maxTrainRows = 1000L)
    capped.books.map(_.map(_.toSeq).toSeq).toSeq shouldBe
      full.books.map(_.map(_.toSeq).toSeq).toSeq
  }

  test("shortlist-and-rerank returns exact-cosine order and scores") {
    val embs = PlantedFixtures.pqVectors(spark)
    val cb = Pq.train(embs, "embedding", dim, m = 2, k = 4, iters = 2)
    val q = Seq(1.0, 0.0, 5.0, 0.0)
    val got = Pq.topKReranked(embs, "vec_id", "embedding", q, 5, cb,
        shortlist = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val truth = (for (a <- 0 until 4; b <- 0 until 4) yield
      ((a * 4 + b).toLong, cosine(
        PlantedFixtures.PqSubvaluesA(a) ++ PlantedFixtures.PqSubvaluesB(b), q)))
      .sortBy { case (id, s) => (-s, id) }.take(5)
    got.map(_._1).toSeq shouldBe truth.map(_._1)
    // rerank scores are EXACT cosine (float-vector arithmetic), within
    // the float32 storage of the fixture column
    got.zip(truth).foreach { case ((_, g), (_, t)) => g shouldBe (t +- 1e-6) }
    intercept[IllegalArgumentException] {
      Pq.topKReranked(embs, "vec_id", "embedding", q, 5, cb, shortlist = 3)
    }
  }

  test("codebook spec round-trips exactly; encoded table ranks from the codes column alone") {
    val embs = PlantedFixtures.pqVectors(spark)
    val cb = Pq.train(embs, "embedding", dim, m = 2, k = 4, iters = 2)
    // registry-storable spec: double-for-double round trip
    val rt = Pq.fromSpec(Pq.spec(cb))
    rt.dim shouldBe cb.dim
    rt.books.map(_.map(_.toSeq).toSeq).toSeq shouldBe
      cb.books.map(_.map(_.toSeq).toSeq).toSeq
    intercept[IllegalArgumentException] { Pq.fromSpec("not-a-spec") }
    // pre-encoded table: the ranking pass's parquet scan must read the
    // m-byte pq_code column and NOT the float vector (column pruning —
    // the I/O claim of the ADC cost story)
    val tbl = graft.TempDirs.path("pq-codes/spec-test")
    Pq.writeEncodedTable(embs, "vec_id", "embedding", cb, tbl)
    val enc = spark.read.parquet(tbl)
    val q = Seq(1.0, 0.0, 5.0, 0.0)
    val rankPlan = Pq.topKEncoded(enc, "vec_id", q, 8, cb)
      .queryExecution.executedPlan.toString
    rankPlan should include("pq_code")
    rankPlan should not include "embedding"
    // rerank over the encoded table equals the on-the-fly rerank path
    val got = Pq.topKEncodedReranked(enc, "vec_id", "embedding", q, 5, cb,
        shortlist = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = Pq.topKReranked(embs, "vec_id", "embedding", q, 5, cb,
        shortlist = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    got shouldBe direct
  }

  test("decode reconstructs centroids; cosine against the reconstruction equals ADC") {
    val embs = PlantedFixtures.pqVectors(spark)
    val cb = Pq.train(embs, "embedding", dim, m = 2, k = 4, iters = 2)
    val q = Seq(1.0, 0.0, 5.0, 0.0)
    val qlit = array(q.map(lit): _*)
    val rows = embs.select(col("vec_id"),
        Pq.adcCosine(Pq.encode(col("embedding"), cb), q, cb).as("adc"),
        graft.functions.VectorFunctions.cosineSimilarityNative(
          Pq.decode(Pq.encode(col("embedding"), cb), cb), qlit).as("via_decode"))
      .collect()
    rows.foreach { r =>
      r.getDouble(2) shouldBe r.getDouble(1) +- 1e-12 // assoc-order ULPs only
    }
    // wrong-width and foreign codes decode to NULL, never garbage
    val edge = Seq(Tuple1(Array[Byte](1, 2, 3)), Tuple1(Array[Byte](7, 0)))
      .toDF("c")
    edge.select(Pq.decode(col("c"), cb).as("d")).collect()
      .foreach(_.isNullAt(0) shouldBe true) // wrong width / code >= k
  }

  test("graft_pq_encode / graft_pq_decode are SQL-callable with a pasted spec") {
    val embs = PlantedFixtures.pqVectors(spark)
    val cb = Pq.train(embs, "embedding", dim, m = 2, k = 4, iters = 2)
    val spec = Pq.spec(cb)
    embs.createOrReplaceTempView("pq_sql_fixture")
    // SQL round trip equals the Column forms value-for-value; cosine
    // against the SQL-decoded reconstruction is the ADC quantity
    val sql = spark.sql(
      s"""SELECT vec_id,
             graft_pq_encode(embedding, '$spec') AS c,
             graft_cosine(graft_pq_decode(graft_pq_encode(embedding, '$spec'),
                          '$spec'),
                          array(1.0D, 0.0D, 5.0D, 0.0D)) AS sim
          FROM pq_sql_fixture""")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).toMap
    val col = embs.select(org.apache.spark.sql.functions.col("vec_id"),
        Pq.encode(org.apache.spark.sql.functions.col("embedding"), cb).as("c"),
        Pq.adcCosine(Pq.encode(
          org.apache.spark.sql.functions.col("embedding"), cb),
          Seq(1.0, 0.0, 5.0, 0.0), cb).as("sim"))
      .collect().map(r => (r.getLong(0),
        r.getAs[Array[Byte]](1).toSeq, r.getDouble(2)))
    col.foreach { case (id, code, adc) =>
      sql(id)._1 shouldBe code
      sql(id)._2 shouldBe adc +- 1e-12
    }
    // a malformed pasted spec fails at PLAN time, loudly
    intercept[Exception] {
      spark.sql("SELECT graft_pq_encode(array(1.0D), 'nope')").collect()
    }.getMessage should include("pq")
  }

  test("topK ranks by ADC and matches brute-force on the lossless fixture") {
    val embs = PlantedFixtures.pqVectors(spark)
    val cb = Pq.train(embs, "embedding", dim, m = 2, k = 4, iters = 2)
    val q = Seq(1.0, 0.0, 5.0, 0.0)
    val pq = Pq.topK(embs, "vec_id", "embedding", q, 5, cb)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val brute = (for (a <- 0 until 4; b <- 0 until 4) yield
      ((a * 4 + b).toLong, cosine(
        PlantedFixtures.PqSubvaluesA(a) ++ PlantedFixtures.PqSubvaluesB(b), q)))
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    pq shouldBe brute
  }

  test("rerankShortlist floors at k past the sort fence (r16 advice): a huge " +
    "k degrades to the documented full sort, never a require crash") {
    import graft.operators.Pq
    val thr =
      org.apache.spark.sql.internal.SQLConf.get.topKSortFallbackThreshold
    // normal regime: 10·k and corpus-fraction terms, capped under thr
    Pq.rerankShortlist(1000L, 10) shouldBe 100
    Pq.rerankShortlist(1000000L, 10) should be < thr
    // k at/above the fence: result must still be >= k (topKReranked
    // requires shortlist >= k; the plan degrades to a full sort, which
    // is the documented tradeoff — not an exception)
    Pq.rerankShortlist(1000000L, thr) should be >= thr
    Pq.rerankShortlist(100L, thr + 5) shouldBe thr + 5
  }
}
