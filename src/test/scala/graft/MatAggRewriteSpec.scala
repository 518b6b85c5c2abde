package graft

import org.apache.spark.sql.functions._
import graft.operators.MaterializedAgg
import graft.plans.MatAggRewrite

/** The materialized-aggregate QUERY REWRITE: a registered base table's
  * exact-grain aggregate must transparently read the partial table
  * (scan-path pinned), produce identical values, and stand down for
  * every shape outside the view's algebra. */
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
    MatAggRewrite.enable(base, aggT, Seq("k"), Seq("v"))
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
    } finally MatAggRewrite.disable(base)
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
    MatAggRewrite.enable(base, aggT, Seq("k1", "k2"), Seq("v"))
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
        MatAggRewrite.disable(base)
        val direct = try df.collect().map(_.toSeq)
        finally MatAggRewrite.enable(base, aggT, Seq("k1", "k2"), Seq("v"))
        withClue(s"grain $keys: ") { viaView shouldBe direct }
        withClue(s"grain $keys scans: ") {
          scanPaths(df).exists(_.contains("matagg-rewrite/agg3")) shouldBe true
        }
      }
      // the GLOBAL aggregate (no grouping) also rewrites
      val global = q()
      val gv = global.collect().map(_.toSeq)
      MatAggRewrite.disable(base)
      val gd = try q().collect().map(_.toSeq)
      finally MatAggRewrite.enable(base, aggT, Seq("k1", "k2"), Seq("v"))
      gv shouldBe gd
      scanPaths(global).exists(_.contains("matagg-rewrite/agg3")) shouldBe true
    } finally MatAggRewrite.disable(base)
  }

  test("shapes outside the view's algebra stand down and scan the base") {
    val base = graft.TempDirs.path("matagg-rewrite/base2")
    val aggT = graft.TempDirs.path("matagg-rewrite/agg2")
    Seq(("a", 1L, 2L), ("b", 3L, 4L)).toDF("k", "v", "w")
      .write.mode("overwrite").parquet(base)
    MaterializedAgg.build(spark.read.parquet(base), Seq("k"), Seq("v"), aggT)
    MatAggRewrite.enable(base, aggT, Seq("k"), Seq("v"))
    try {
      def basePathsOf(df: org.apache.spark.sql.DataFrame) = scanPaths(df)
      // a FILTER before the aggregate
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
    } finally MatAggRewrite.disable(base)
  }
}
