package graft

import org.apache.spark.sql.functions._
import graft.operators.{MaterializedAgg, Snapshot}
import graft.plans.MatAggRewrite

/** The materialized-aggregate QUERY REWRITE: a registered base table's
  * exact-grain aggregate must transparently read the partial table
  * (scan-path pinned), produce identical values, and stand down for
  * every shape outside the view's algebra — including a snapshot-
  * governed base whose scanned batch set diverges from the rollup's
  * refreshed set (the freshness gate). */
class MatAggRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    df.collect() // finalize AQE
    scans(df.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toUri.getPath))
  }

  test("registered exact-grain aggregate reads the partial table; values identical") {
    val base = graft.TempDirs.path("matagg-rewrite/base")
    val aggT = graft.TempDirs.path("matagg-rewrite/agg")
    // integer values → exact sums under re-association; one null value
    // row pins count(v) vs count(1) divergence through the rewrite
    val rows = Seq(("a", Some(10L)), ("a", Some(4L)), ("a", None),
      ("b", Some(7L)), ("b", Some(1L)))
    rows.toDF("k", "v").write.mode("overwrite").parquet(base)
    val baseDf = spark.read.parquet(base)
    MaterializedAgg.build(baseDf, Seq("k"), Seq("v"), aggT)
    def q = spark.read.parquet(base).groupBy("k")
      .agg(count(lit(1)).as("n"), count(col("v")).as("vc"),
        sum("v").as("vs"), min("v").as("vmin"), max("v").as("vmax"),
        avg("v").as("vavg"))
      .orderBy("k")
    val direct = q.collect().map(_.toSeq)
    MatAggRewrite.enable(spark, base, aggT, Seq("k"), Seq("v"))
    try {
      val viaView = q
      viaView.collect().map(_.toSeq) shouldBe direct
      // the SCAN is the partial table, not the base
      val paths = scanPaths(viaView)
      paths.exists(_.contains("matagg-rewrite/agg")) shouldBe true
      paths.exists(_.contains("matagg-rewrite/base")) shouldBe false
      // an incremental refresh is visible through the SAME query shape
      Seq(("b", Some(100L))).toDF("k", "v")
        .write.mode("overwrite").parquet(s"$base/_extra_ignored") // not part of base scan
      MaterializedAgg.appendBatch(Seq(("b", Some(100L))).toDF("k", "v"),
        Seq("k"), Seq("v"), aggT, batchId = 0L)
      q.filter(col("k") === "b").collect() // still compiles & runs
    } finally MatAggRewrite.disable(spark, base)
    // disabled: the same query scans the base again
    scanPaths(q).exists(_.contains("matagg-rewrite/base")) shouldBe true
  }

  test("subset-grain rollup and the global aggregate re-aggregate the partials") {
    val base = graft.TempDirs.path("matagg-rewrite/base3")
    val aggT = graft.TempDirs.path("matagg-rewrite/agg3")
    // two keys, integer values (exact re-association), a null value,
    // and a (k1,k2) group whose v is all-null — the avg guard's case
    val rows = Seq(("a", "x", Some(10L)), ("a", "x", Some(2L)),
      ("a", "y", None), ("b", "x", Some(5L)), ("b", "y", Some(3L)))
    rows.toDF("k1", "k2", "v").write.mode("overwrite").parquet(base)
    MaterializedAgg.build(spark.read.parquet(base), Seq("k1", "k2"),
      Seq("v"), aggT)
    MatAggRewrite.enable(spark, base, aggT, Seq("k1", "k2"), Seq("v"))
    try {
      def q(keys: String*) = {
        val g = spark.read.parquet(base).groupBy(keys.map(col): _*)
        g.agg(count(lit(1)).as("n"), count(col("v")).as("vc"),
          sum("v").as("vs"), min("v").as("vmin"), max("v").as("vmax"),
          avg("v").as("vavg"))
      }
      for (keys <- Seq(Seq("k1"), Seq("k2"), Seq("k1", "k2"))) {
        val df = if (keys.isEmpty) q() else q(keys: _*).orderBy(keys.map(col): _*)
        val viaView = df.collect().map(_.toSeq)
        MatAggRewrite.disable(spark, base)
        val direct = try df.collect().map(_.toSeq)
        finally MatAggRewrite.enable(spark, base, aggT, Seq("k1", "k2"), Seq("v"))
        withClue(s"grain $keys: ") { viaView shouldBe direct }
        withClue(s"grain $keys scans: ") {
          scanPaths(df).exists(_.contains("matagg-rewrite/agg3")) shouldBe true
        }
      }
      // the GLOBAL aggregate (no grouping) also rewrites
      val global = q()
      val gv = global.collect().map(_.toSeq)
      MatAggRewrite.disable(spark, base)
      val gd = try q().collect().map(_.toSeq)
      finally MatAggRewrite.enable(spark, base, aggT, Seq("k1", "k2"), Seq("v"))
      gv shouldBe gd
      scanPaths(global).exists(_.contains("matagg-rewrite/agg3")) shouldBe true
    } finally MatAggRewrite.disable(spark, base)
  }

  test("key-only filters subsume into the rewrite; value filters stand down") {
    val base = graft.TempDirs.path("matagg-rewrite/base4")
    val aggT = graft.TempDirs.path("matagg-rewrite/agg4")
    val rows = Seq(("a", "x", Some(10L)), ("a", "y", Some(2L)),
      ("a", "y", None), ("b", "x", Some(5L)), ("b", "y", Some(3L)),
      ("c", "x", Some(9L)))
    rows.toDF("k1", "k2", "v").write.mode("overwrite").parquet(base)
    MaterializedAgg.build(spark.read.parquet(base), Seq("k1", "k2"),
      Seq("v"), aggT)
    MatAggRewrite.enable(spark, base, aggT, Seq("k1", "k2"), Seq("v"))
    try {
      // the dashboard shapes: filter on a grouped key (exact + subset
      // grain), filter on a NON-grouped key at subset grain, compound
      // key-only conjunction — every one reads the partial table
      val shapes = Seq(
        spark.read.parquet(base).filter(col("k1") === "a")
          .groupBy("k1", "k2").agg(count(lit(1)).as("n"), sum("v").as("vs")),
        spark.read.parquet(base).filter(col("k1") === "a")
          .groupBy("k1").agg(sum("v").as("vs"), avg("v").as("va")),
        spark.read.parquet(base).filter(col("k2") === "y")
          .groupBy("k1").agg(count(lit(1)).as("n"), min("v").as("vmin")),
        spark.read.parquet(base)
          .filter(col("k1") =!= "c" && col("k2").isin("x", "y"))
          .groupBy("k2").agg(max("v").as("vmax"), count(col("v")).as("vc")))
      for ((df, i) <- shapes.zipWithIndex) {
        val ordered = df.orderBy(df.columns.map(col).toIndexedSeq: _*)
        val viaView = ordered.collect().map(_.toSeq)
        MatAggRewrite.disable(spark, base)
        val direct = try ordered.collect().map(_.toSeq)
        finally MatAggRewrite.enable(spark, base, aggT, Seq("k1", "k2"), Seq("v"))
        withClue(s"shape $i values: ") { viaView shouldBe direct }
        withClue(s"shape $i scans: ") {
          scanPaths(ordered).exists(_.contains("agg4")) shouldBe true
        }
      }
      // the subsumed filter keeps PUSHING: after the rewrite it reaches
      // the PARTIAL table's parquet scan (PushedFilters), so at scale
      // the rollup read is row-group-pruned exactly like a hand-written
      // query against the agg table would be
      val pushed = spark.read.parquet(base).filter(col("k1") === "a")
        .groupBy("k1").agg(sum("v").as("vs"))
      pushed.collect()
      val scans = {
        import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        def go(p: SparkPlan): Seq[FileSourceScanExec] = p match {
          case a: AdaptiveSparkPlanExec => go(a.executedPlan)
          case s: QueryStageExec => go(s.plan)
          case f: FileSourceScanExec => Seq(f)
          case other => other.children.flatMap(go)
        }
        go(pushed.queryExecution.executedPlan)
      }
      val aggScan = scans.find(
        _.relation.location.rootPaths.exists(_.toString.contains("agg4")))
      aggScan should not be empty
      aggScan.get.metadata("PushedFilters") should include("EqualTo(k1,a)")
      // value-column predicate: partials cannot answer → base scan
      scanPaths(spark.read.parquet(base).filter(col("v") > 2)
          .groupBy("k1").agg(sum("v")))
        .exists(_.contains("base4")) shouldBe true
      // non-deterministic predicate: never subsumed (>= 0.5 — the
      // optimizer itself removes a provably-true rand(…) >= 0.0, and a
      // filterless match firing is then correct)
      scanPaths(spark.read.parquet(base).filter(rand(7) >= 0.5)
          .groupBy("k1").agg(sum("v")))
        .exists(_.contains("base4")) shouldBe true
    } finally MatAggRewrite.disable(spark, base)
  }

  test("snapshot-governed base: fires only while the scanned batch set equals the refreshed set") {
    val id = java.util.UUID.randomUUID()
    val base = graft.TempDirs.path(s"matagg-rewrite/gov-base-$id")
    val aggT = graft.TempDirs.path(s"matagg-rewrite/gov-agg-$id")
    def batch(rows: (String, Long)*) = rows.toDF("k", "v")
    batch(("a", 1L), ("b", 2L)).write.mode("overwrite")
      .parquet(s"$base/batch_id=-1")
    Snapshot.enable(spark, base)
    val v0 = Snapshot.latestVersion(spark, base).get
    Snapshot.stagedAppend(spark, base, 0L) {
      batch(("a", 10L)).write.mode("overwrite").parquet(s"$base/batch_id=0")
    }
    MaterializedAgg.build(batch(("a", 1L), ("b", 2L)), Seq("k"), Seq("v"), aggT)
    MaterializedAgg.appendBatch(batch(("a", 10L)), Seq("k"), Seq("v"), aggT, 0L)
    MatAggRewrite.enable(spark, base, aggT, Seq("k"), Seq("v"))
    try {
      def q = Snapshot.read(spark, base).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("vs")).orderBy("k")
      // fresh: scanned {-1, 0} == refreshed {-1, 0} → fires, values match
      scanPaths(q).exists(_.contains("gov-agg")) shouldBe true
      MatAggRewrite.disable(spark, base)
      val direct = try q.collect().map(_.toSeq)
      finally MatAggRewrite.enable(spark, base, aggT, Seq("k"), Seq("v"))
      q.collect().map(_.toSeq) shouldBe direct
      // STALE: base batch 1 appended, rollup not refreshed → stand down
      Snapshot.stagedAppend(spark, base, 1L) {
        batch(("b", 100L)).write.mode("overwrite").parquet(s"$base/batch_id=1")
      }
      scanPaths(q).exists(_.contains("gov-agg")) shouldBe false
      scanPaths(q).exists(_.contains("gov-base")) shouldBe true
      // TIME TRAVEL: a pinned read of the pre-append version scans a
      // batch set ≠ the refreshed set once batch 1 IS refreshed
      MaterializedAgg.appendBatch(batch(("b", 100L)), Seq("k"), Seq("v"),
        aggT, 1L)
      scanPaths(q).exists(_.contains("gov-agg")) shouldBe true // re-fired
      val pinned = Snapshot.readAt(spark, base, v0).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("vs")).orderBy("k")
      scanPaths(pinned).exists(_.contains("gov-agg")) shouldBe false
      scanPaths(pinned).exists(_.contains("gov-base")) shouldBe true
    } finally MatAggRewrite.disable(spark, base)
  }

  test("shapes outside the view's algebra stand down and scan the base") {
    val base = graft.TempDirs.path("matagg-rewrite/base2")
    val aggT = graft.TempDirs.path("matagg-rewrite/agg2")
    Seq(("a", 1L, 2L), ("b", 3L, 4L)).toDF("k", "v", "w")
      .write.mode("overwrite").parquet(base)
    MaterializedAgg.build(spark.read.parquet(base), Seq("k"), Seq("v"), aggT)
    MatAggRewrite.enable(spark, base, aggT, Seq("k"), Seq("v"))
    try {
      def basePathsOf(df: org.apache.spark.sql.DataFrame) = scanPaths(df)
      // a VALUE filter before the aggregate (key filters subsume now)
      basePathsOf(spark.read.parquet(base).filter(col("v") > 1)
          .groupBy("k").agg(sum("v")))
        .exists(_.contains("base2")) shouldBe true
      // DISTINCT aggregation
      basePathsOf(spark.read.parquet(base).groupBy("k")
          .agg(countDistinct("v")))
        .exists(_.contains("base2")) shouldBe true
      // an uncovered value column
      basePathsOf(spark.read.parquet(base).groupBy("k").agg(sum("w")))
        .exists(_.contains("base2")) shouldBe true
      // grouping at a different grain
      basePathsOf(spark.read.parquet(base).groupBy("k", "w").agg(sum("v")))
        .exists(_.contains("base2")) shouldBe true
      // matching shape still rewrites in the same session state
      basePathsOf(spark.read.parquet(base).groupBy("k").agg(sum("v")))
        .exists(_.contains("agg2")) shouldBe true
    } finally MatAggRewrite.disable(spark, base)
  }

  test("registry is per-session; a broken agg table stands down instead of failing") {
    val base = graft.TempDirs.path("matagg-rewrite/base5")
    val aggT = graft.TempDirs.path("matagg-rewrite/agg5")
    Seq(("a", 1L), ("b", 3L)).toDF("k", "v")
      .write.mode("overwrite").parquet(base)
    MaterializedAgg.build(spark.read.parquet(base), Seq("k"), Seq("v"), aggT)
    val other = spark.newSession()
    MatAggRewrite.enable(spark, base, aggT, Seq("k"), Seq("v"))
    try {
      def q(s: org.apache.spark.sql.SparkSession) =
        s.read.parquet(base).groupBy("k").agg(sum("v").as("vs")).orderBy("k")
      // registered session rewrites; the OTHER session must not see it
      scanPaths(q(spark)).exists(_.contains("agg5")) shouldBe true
      scanPaths(q(other)).exists(_.contains("base5")) shouldBe true
      scanPaths(q(other)).exists(_.contains("agg5")) shouldBe false
      // disable in the other session must not clobber this session's
      MatAggRewrite.disable(other, base)
      scanPaths(q(spark)).exists(_.contains("agg5")) shouldBe true
      // a registration pointing at a missing table: the query still
      // answers from the base scan (Try stand-down), never throws
      MatAggRewrite.enable(spark, base,
        graft.TempDirs.path("matagg-rewrite/nonexistent-agg"),
        Seq("k"), Seq("v"))
      val df = q(spark)
      df.collect().map(_.toSeq) shouldBe Seq(Seq("a", 1L), Seq("b", 3L))
      scanPaths(df).exists(_.contains("base5")) shouldBe true
    } finally MatAggRewrite.disable(spark, base)
  }

  test("fire matrix under filters is a PINNED contract: DISTINCT under a key " +
    "filter stands down; avg at subset grain under a filter fires (r16 #5)") {
    val base = graft.TempDirs.path("matagg-rewrite/base5")
    val aggT = graft.TempDirs.path("matagg-rewrite/agg5")
    Seq(("a", "x", 10L), ("a", "y", 2L), ("b", "x", 5L), ("b", "y", 3L))
      .toDF("k1", "k2", "v").write.mode("overwrite").parquet(base)
    MaterializedAgg.build(spark.read.parquet(base), Seq("k1", "k2"),
      Seq("v"), aggT)
    MatAggRewrite.enable(spark, base, aggT, Seq("k1", "k2"), Seq("v"))
    try {
      // DISTINCT under a key-only filter: the filter alone is
      // subsumable, but partials cannot answer DISTINCT — REQUIRED to
      // stand down to the base scan (and be right)
      val d = spark.read.parquet(base).filter(col("k1") === "a")
        .groupBy("k1").agg(countDistinct("v").as("dv"))
      scanPaths(d).exists(_.contains("base5")) shouldBe true
      scanPaths(d).exists(_.contains("agg5")) shouldBe false
      d.collect().map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
        Seq(("a", 2L))
      // avg at SUBSET grain under a key filter: REQUIRED to fire —
      // guarded Σsum/Σcnt over the filtered partials, values exact
      val a = spark.read.parquet(base).filter(col("k2") === "y")
        .groupBy("k1").agg(avg("v").as("va")).orderBy("k1")
      scanPaths(a).exists(_.contains("agg5")) shouldBe true
      scanPaths(a).exists(_.contains("base5")) shouldBe false
      a.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq shouldBe
        Seq(("a", 2.0), ("b", 3.0))
    } finally MatAggRewrite.disable(spark, base)
  }

  test("COW delete invalidates a fired min/max: stand down until resync, " +
    "then fire with the post-delete answer (r16 stretch #7)") {
    val id = java.util.UUID.randomUUID()
    val base = graft.TempDirs.path(s"matagg-rewrite/cow-base-$id")
    val aggT = graft.TempDirs.path(s"matagg-rewrite/cow-agg-$id")
    def batch(rows: (String, Long)*) = rows.toDF("k", "v")
    // batch -1 carries key a's GLOBAL MIN (1): the dangerous partial
    batch(("a", 1L), ("b", 50L)).write.mode("overwrite")
      .parquet(s"$base/batch_id=-1")
    Snapshot.enable(spark, base)
    Snapshot.stagedAppend(spark, base, 0L) {
      batch(("a", 10L), ("b", 7L)).write.mode("overwrite")
        .parquet(s"$base/batch_id=0")
    }
    MaterializedAgg.build(batch(("a", 1L), ("b", 50L)), Seq("k"), Seq("v"), aggT)
    MaterializedAgg.appendBatch(batch(("a", 10L), ("b", 7L)), Seq("k"),
      Seq("v"), aggT, 0L)
    MatAggRewrite.enable(spark, base, aggT, Seq("k"), Seq("v"))
    try {
      def q = Snapshot.read(spark, base).groupBy("k")
        .agg(min("v").as("vmin"), max("v").as("vmax")).orderBy("k")
      // armed: fires with min(a)=1
      scanPaths(q).exists(_.contains("cow-agg")) shouldBe true
      q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
        Seq(("a", 1L), ("b", 7L))
      // COW DELETE the row carrying the min: the fold rewrites base
      // history into new batch ids, so the freshness gate MUST stand
      // down — a fired rewrite would still serve the deleted min(a)=1
      Snapshot.deleteWhere(spark, base, col("v") === 1L)
      scanPaths(q).exists(_.contains("cow-agg")) shouldBe false
      scanPaths(q).exists(_.contains("cow-base")) shouldBe true
      q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
        Seq(("a", 10L), ("b", 7L))
      // resync rebuilds partials for the fold ids; the gate re-arms
      // and the fired answer is the POST-DELETE one
      MaterializedAgg.resyncWithBase(spark, base, aggT, Seq("k"), Seq("v"))
      Snapshot.liveBatches(spark, aggT).toSet shouldBe
        Snapshot.liveBatches(spark, base).toSet
      scanPaths(q).exists(_.contains("cow-agg")) shouldBe true
      q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
        Seq(("a", 10L), ("b", 7L))
    } finally MatAggRewrite.disable(spark, base)
  }
}
