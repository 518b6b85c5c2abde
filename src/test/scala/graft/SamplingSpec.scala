package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Properties the sp1-sp3 oracles (full-formula DuckDB twins on the sf
  * corpus) don't isolate: the partition/permutation invariants, the
  * determinism contract, and the weighted-inclusion skew. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("id")

  test("assignSplits: every row exactly one split; fractions land near target") {
    val out = Sampling.assignSplits(ids(10000), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 42)
    out.count() shouldBe 10000L
    val bySplit = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySplit.keySet shouldBe Set("train", "val", "test")
    bySplit.values.sum shouldBe 10000L
    // hash uniformity: within ±3% of target on 10k ids
    bySplit("train").toDouble should be(8000.0 +- 300.0)
    bySplit("val").toDouble should be(1000.0 +- 300.0)
  }

  test("assignSplits: deterministic per id and seed; seed moves rows") {
    val a = Sampling.assignSplits(ids(500), "id", Seq("a" -> 0.5, "b" -> 0.5), 1)
    val b = Sampling.assignSplits(ids(500), "id", Seq("a" -> 0.5, "b" -> 0.5), 1)
    a.except(b).count() shouldBe 0L
    val c = Sampling.assignSplits(ids(500), "id", Seq("a" -> 0.5, "b" -> 0.5), 2)
    a.except(c).count() should be > 0L
  }

  test("epochShuffle: a true permutation — dense 1..n_s positions per shard, all ids once") {
    val out = Sampling.epochShuffle(ids(1000), "id", epoch = 3, nShards = 7).cache()
    out.count() shouldBe 1000L
    out.select("id").distinct().count() shouldBe 1000L
    // positions are dense 1..count within every shard
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("nd"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("nd") =!= col("n"))
    bad.count() shouldBe 0L
    out.unpersist()
  }

  test("epochShuffle: epochs reorder; same epoch replays exactly") {
    val e1 = Sampling.epochShuffle(ids(300), "id", 1, 4)
    val e1b = Sampling.epochShuffle(ids(300), "id", 1, 4)
    e1.except(e1b).count() shouldBe 0L
    val e2 = Sampling.epochShuffle(ids(300), "id", 2, 4)
    e1.except(e2).count() should be > 0L
  }

  test("weightedTopK: a planted heavy weight is always sampled; sample is deterministic") {
    val rows = (0L until 200L).map(i => (i, if (i == 77L) 1e6 else 1.0))
      .toDF("id", "w")
    val s1 = Sampling.weightedTopK(rows, "id", "w", 10, seed = 5).collect()
    // u^(1/w) → 1 as w → ∞: the heavy row's key dominates
    s1.head.getLong(0) shouldBe 77L
    val s2 = Sampling.weightedTopK(rows, "id", "w", 10, seed = 5).collect()
    s1.map(_.getLong(0)) shouldBe s2.map(_.getLong(0))
  }

  test("weightedTopK: inclusion skews toward weight across seeds") {
    // ids 0-49 weight 10, ids 50-99 weight 1; over 20 seeds the heavy
    // half must dominate the samples
    val rows = (0L until 100L).map(i => (i, if (i < 50) 10.0 else 1.0)).toDF("id", "w")
    val heavy = (1 to 20).map { seed =>
      Sampling.weightedTopK(rows, "id", "w", 10, seed.toLong)
        .filter(col("id") < 50).count()
    }.sum
    heavy.toDouble should be > 140.0 // 200 draws, ≥70% heavy (expect ~90%)
  }

  test("weightedTopK: zero and negative weights are clamped, never divide by zero") {
    val rows = Seq((1L, 0.0), (2L, -5.0), (3L, 2.0)).toDF("id", "w")
    val out = Sampling.weightedTopK(rows, "id", "w", 3).collect()
    out.length shouldBe 3
    out.foreach(r => r.getDouble(2) should (be >= 0.0 and be <= 1.0))
  }

  test("stratifiedSample: per-stratum rates; unlisted strata follow defaultFraction") {
    val rows = (0L until 8000L).map(i => (i, s"s${i % 4}")).toDF("id", "g")
    val kept = Sampling.stratifiedSample(rows, "id", "g",
      Map("s0" -> 0.5, "s1" -> 0.1), seed = 3).cache()
    val byG = kept.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byG.keySet shouldBe Set("s0", "s1") // s2/s3 dropped (default 0)
    byG("s0").toDouble should be(1000.0 +- 120.0)
    byG("s1").toDouble should be(200.0 +- 80.0)
    kept.unpersist()
    val all = Sampling.stratifiedSample(rows, "id", "g",
      Map("s0" -> 0.5), seed = 3, defaultFraction = 1.0)
    all.filter(col("g") =!= "s0").count() shouldBe 6000L
  }

  test("stratifiedSample: nested — a lower rate keeps a strict subset of a higher rate") {
    val rows = (0L until 3000L).map(i => (i, "x")).toDF("id", "g")
    val small = Sampling.stratifiedSample(rows, "id", "g", Map("x" -> 0.1), seed = 7)
    val big = Sampling.stratifiedSample(rows, "id", "g", Map("x" -> 0.3), seed = 7)
    small.except(big).count() shouldBe 0L
    big.count() should be > small.count()
  }

  test("stratifiedSample: deterministic replay; decorrelated from assignSplits") {
    val rows = (0L until 4000L).map(i => (i, "x")).toDF("id", "g")
    val a = Sampling.stratifiedSample(rows, "id", "g", Map("x" -> 0.25), seed = 11)
    val b = Sampling.stratifiedSample(rows, "id", "g", Map("x" -> 0.25), seed = 11)
    a.except(b).count() shouldBe 0L
    // sampling under one seed must not skew a split under another: the
    // sampled subset's split rates stay near 80/20 across SEVERAL seed
    // pairs, including adjacent seeds (the affine-hash failure mode put
    // 100% of a seed-11 sample into a seed-42 split's train bucket)
    for ((sampleSeed, splitSeed) <- Seq((11L, 42L), (0L, 1L), (7L, 13L), (42L, 43L))) {
      val samp = Sampling.stratifiedSample(rows, "id", "g",
        Map("x" -> 0.25), seed = sampleSeed)
      val split = Sampling.assignSplits(samp, "id", Seq("t" -> 0.8, "v" -> 0.2), splitSeed)
        .groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      withClue(s"sampleSeed=$sampleSeed splitSeed=$splitSeed: ") {
        val frac = split.getOrElse("t", 0L).toDouble /
          (split.getOrElse("t", 0L) + split.getOrElse("v", 0L))
        frac should be(0.8 +- 0.05)
      }
    }
  }

  test("exactStratifiedSample: exact sizes, whole small strata, nested in k") {
    val rows = ((0L until 500L).map((_, "big")) ++ (900L until 910L).map((_, "tiny")))
      .toDF("id", "g")
    val s20 = Sampling.exactStratifiedSample(rows, "id", "g", k = 20, seed = 5)
    val byG = s20.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byG shouldBe Map("big" -> 20L, "tiny" -> 10L) // tiny stratum returns whole
    // nested: the k=10 sample is a strict subset of the k=20 sample
    val s10 = Sampling.exactStratifiedSample(rows, "id", "g", k = 10, seed = 5)
    s10.except(s20).count() shouldBe 0L
    // deterministic replay under a different partitioning
    val replay = Sampling.exactStratifiedSample(rows.repartition(11), "id", "g", 20, 5)
    replay.except(s20).count() shouldBe 0L
    s20.except(replay).count() shouldBe 0L
  }

  test("idHash: pinned reference values (cross-engine formula contract)") {
    // hand-computed from the published formula (mixSeed + two
    // multiply/xor-shift rounds); any drift here silently invalidates
    // every persisted split/sample AND the sp1-sp4 DuckDB oracles
    val cases = Seq(
      (0L, 0L, 4168323263L), (1L, 0L, 271693540L),
      (123456789L, 42L, 1653181436L), (2147483647L, 7L, 2249109825L),
      (999L, 13L, 2863743695L),
      (2147483648L, 0L, 4168323263L)) // 31-bit fold: id and id+2^31 collide
    for ((id, seed, want) <- cases) {
      val got = Seq(id).toDF("id")
        .select(Sampling.idHash(col("id"), seed).as("h")).head().getLong(0)
      withClue(s"idHash($id, $seed): ") { got shouldBe want }
    }
  }

  test("splitCutoffs exposes the exact integer boundaries assignSplits uses") {
    val cuts = Sampling.splitCutoffs(Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    cuts.head shouldBe (0.8 * (1L << 32).toDouble).toLong
    cuts shouldBe cuts.sorted
    // float summation may land a hair under 2^32; the otherwise-arm absorbs it
    cuts.last should (be <= (1L << 32) and be >= (1L << 32) - 2)
  }

  test("SQL surface: graft_id_hash equals the Column-form gate hash") {
    import spark.implicits._
    (0L until 50L).toDF("id").createOrReplaceTempView("idhash_sql_view")
    val viaSql = spark.sql(
      "SELECT id, graft_id_hash(id, 7) AS h FROM idhash_sql_view")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = (0L until 50L).toDF("id")
      .select(col("id"), Sampling.idHash(col("id"), 7L).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaSql shouldBe viaCol
    // non-literal seed must fail at analysis, not hash with garbage
    intercept[Exception] {
      spark.sql("SELECT graft_id_hash(id, id) FROM idhash_sql_view").collect()
    }
  }
}
