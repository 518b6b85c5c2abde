package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** FuzzyJoin's one claim is RECALL-COMPLETENESS: the
  * deletion-neighborhood block may generate false candidates (killed
  * by the exact levenshtein verify) but can never lose a true pair —
  * so the whole spec is parity against the quadratic brute force,
  * on fixtures built to break the lossy blockings it replaced
  * (first-character edits, length-boundary edits, transposition-ish
  * double edits). */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairSet(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  /** Seeded random short strings over a 4-letter alphabet — small
    * alphabet on purpose: it maximizes accidental near-duplicates, so
    * the parity check exercises dense pair neighborhoods, not just the
    * planted ones. */
  private def randomFixture(n: Int, seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = (1L to n.toLong).map { id =>
      val len = 1 + rnd.nextInt(8)
      (id, (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    }
    rows.toDF("id", "name")
  }

  test("selfJoin matches brute force exactly on a randomized fixture (k=1 and k=2)") {
    val df = randomFixture(120, seed = 20260814L)
    Seq(1, 2).foreach { k =>
      val got = pairSet(FuzzyJoin.selfJoin(df, "id", "name", maxDist = k))
      val want = pairSet(FuzzyJoin.bruteForcePairs(df, "id", "name", maxDist = k))
      got shouldBe want
      want should not be empty // the fixture must actually exercise pairs
    }
  }

  test("pairs whose edit touches position 0 are found (the block the demo missed)") {
    val df = Seq(
      (1L, "Smith"), (2L, "mith"),   // deletion AT position 0
      (3L, "amith"),                 // substitution at position 0
      (4L, "XSmith"),                // insertion BEFORE position 0
      (5L, "Smyth"),                 // interior substitution
      (6L, "Jones")).toDF("id", "name")
    val got = pairSet(FuzzyJoin.selfJoin(df, "id", "name", maxDist = 1))
    got should contain allOf ((1L, 2L, 1), (2L, 3L, 1), (1L, 4L, 1), (1L, 5L, 1))
    got shouldBe pairSet(FuzzyJoin.bruteForcePairs(df, "id", "name", maxDist = 1))
  }

  test("null strings never pair; empty strings participate") {
    val df = Seq((1L, ""), (2L, "a"), (3L, null.asInstanceOf[String]),
      (4L, "b")).toDF("id", "name")
    val got = pairSet(FuzzyJoin.selfJoin(df, "id", "name", maxDist = 1))
    got shouldBe Set((1L, 2L, 1), (1L, 4L, 1), (2L, 4L, 1))
  }

  test("two-table join matches brute force and keeps many-to-many matches") {
    val dirty = randomFixture(60, seed = 7L)
    val canon = randomFixture(40, seed = 8L)
      .select(col("id").as("cid"), col("name").as("cname"))
    val got = FuzzyJoin.join(dirty, "id", "name", canon, "cid", "cname",
      maxDist = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = dirty.select(col("id"), col("name"))
      .crossJoin(canon)
      .withColumn("dist", levenshtein(col("name"), col("cname")))
      .filter(col("dist") <= 1 && col("name").isNotNull &&
        col("cname").isNotNull)
      .select("id", "cid", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got shouldBe want
    want should not be empty
  }

  test("selfJoinWithStats accounts for the candidate fraction it verified") {
    val df = randomFixture(200, seed = 99L)
    val (pairs, stats) = FuzzyJoin.selfJoinWithStats(df, "id", "name",
      maxDist = 1)
    val s = stats.head()
    s.getAs[Long]("n_rows") shouldBe 200L
    s.getAs[Long]("n_pairs") shouldBe pairs.count()
    // the point of blocking: the verified fraction of the quadratic
    // pair space is a small minority, never ~1.0 (all-pairs)
    val frac = s.getAs[Double]("candidate_frac")
    frac should be > 0.0
    frac should be < 0.5
  }

  test("guards fail loudly: maxDist cap, long strings, and no cache leak on failure") {
    val df = Seq((1L, "x" * 300)).toDF("id", "name")
    intercept[IllegalArgumentException] {
      FuzzyJoin.selfJoin(df, "id", "name", maxDist = 3)
    }.getMessage should include("maxDist")
    // start the leak check from an empty cache: a leftover block from
    // an EARLIER test can be reaped by the ContextCleaner mid-test,
    // making an exact before/after equality flaky (r15 one-off fail)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    intercept[IllegalArgumentException] {
      FuzzyJoin.selfJoin(df, "id", "name", maxDist = 2)
    }.getMessage should include("maxLen")
    intercept[IllegalArgumentException] {
      FuzzyJoin.join(df, "id", "name", df, "id", "name", maxDist = 2)
    }.getMessage should include("maxLen")
    // the guard threw AFTER the inputs were persisted: every exit path
    // must unpersist (ADVICE r13 cached-partition leak)
    spark.sparkContext.getPersistentRDDs.size shouldBe 0
  }

  test("prepared dictionary: probe parity with join; dict guard eager; probe maxLen guard in-plan") {
    val dict = Seq((1L, "Main Street"), (2L, "Smith")).toDF("dict_id", "name")
    // dictionary-side guard fires at PREPARE time (eager, before any
    // stream starts) and leaks no cache
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    intercept[IllegalArgumentException] {
      FuzzyJoin.prepare(Seq((9L, "x" * 300)).toDF("dict_id", "name"),
        "dict_id", "name", maxDist = 2)
    }.getMessage should include("maxLen")
    spark.sparkContext.getPersistentRDDs.size shouldBe 0
    val prep = FuzzyJoin.prepare(dict, "dict_id", "name", maxDist = 2)
    try {
      val left = Seq((10L, "Main Steet"), (11L, "mith"), (12L, "zzz zzz"))
        .toDF("row_id", "dirty")
      val viaPrep = FuzzyJoin.joinPrepared(left, "row_id", "dirty", prep)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val direct = FuzzyJoin.join(left, "row_id", "dirty",
          dict, "dict_id", "name", maxDist = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      viaPrep shouldBe direct
      viaPrep shouldBe Set((10L, 1L, 1), (11L, 2L, 1))
      // PROBE-side maxLen guard rides IN-PLAN (raise_error): it fails
      // the micro-batch at materialization, loudly naming the limit —
      // there is no driver-side pre-scan of a stream's batch
      val bad = Seq((13L, "y" * 300)).toDF("row_id", "dirty")
      val e = intercept[Exception] {
        FuzzyJoin.joinPrepared(bad, "row_id", "dirty", prep).collect()
      }
      e.getMessage should include("maxLen")
    } finally prep.unpersist()
  }
}
