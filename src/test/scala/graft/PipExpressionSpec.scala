package graft

import org.apache.spark.sql.functions._
import graft.functions.{GeoFunctions => G}

/** The custom-Catalyst chain: native PointInPolygonExpr (codegen) +
  * BoxPipRewrite (optimizer rule) + graft_pip (SQL function via
  * SparkSessionExtensions). The headline assert: a box-PIP filter over
  * parquet ends up IN the scan's PushedFilters — the UDF form never
  * can.
  */
class PipExpressionSpec extends SparkSpec {

  private val waBox = Array((-120.0, 46.0), (-117.045, 46.0), (-117.045, 49.0),
    (-120.0, 49.0), (-120.0, 46.0))
  private val ell = Array((0.0, 0.0), (1.0, 0.0), (1.0, 0.5), (0.5, 0.5),
    (0.5, 1.0), (0.0, 1.0), (0.0, 0.0))

  private lazy val geoParquet: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("geo").toString + "/pts"
    (0 until 5000).map { i =>
      (i.toLong, 45.0 + (i % 97) * 0.05, -121.0 + (i % 83) * 0.07)
    }.toDF("id", "lat", "lon").write.mode("overwrite").parquet(dir)
    dir
  }

  test("box ring: the optimizer rewrites PIP to range predicates pushed to the scan") {
    val df = spark.read.parquet(geoParquet)
      .filter(G.pointInPolygonNative(col("lon"), col("lat"), waBox))
    val plan = df.queryExecution.executedPlan.toString
    withClue(plan.linesIterator.filter(_.contains("Filter")).mkString("\n")) {
      // pushed to the scan (the PushedFilters list renders truncated,
      // so pin the head plus the full predicate set via DataFilters)
      plan should include("PushedFilters: [IsNotNull(lon), IsNotNull(lat), GreaterThanOrEqual(lon,-120.0)")
      plan should include(">= -120.0")
      plan should include("<= -117.045")
      plan should include(">= 46.0")
      plan should include("<= 49.0")
      plan should not include "graft_pip" // fully rewritten away
    }
    // and the rewrite is semantics-preserving vs closed-interval math
    val expected = spark.read.parquet(geoParquet)
      .filter(col("lon") >= -120.0 && col("lon") <= -117.045 &&
        col("lat") >= 46.0 && col("lat") <= 49.0).count()
    df.count() shouldBe expected
  }

  test("non-box ring: expression survives, codegen evaluates, matches the UDF") {
    import spark.implicits._
    // write to parquet so ConvertToLocalRelation can't fold the filter
    // away at optimization time — we want the executor codegen path
    val dir = java.nio.file.Files.createTempDirectory("ell").toString + "/pts"
    (0 until 2000).map(i => (i * 0.00061, (i * 37 % 2000) * 0.00061))
      .toDF("x", "y").write.mode("overwrite").parquet(dir)
    val pts = spark.read.parquet(dir)
    val filtered = pts.filter(G.pointInPolygonNative(col("x"), col("y"), ell))
    val native = filtered.count()
    val viaUdf = pts.filter(G.pointInPolygon(ell)(col("x"), col("y"))).count()
    native shouldBe viaUdf
    native should be > 0L
    // the plan keeps the native expression (no rewrite for non-boxes)
    filtered.queryExecution.optimizedPlan.toString should include("graft_pip")
  }

  test("graft_pip is SQL-callable through the session extension") {
    import spark.implicits._
    Seq((-118.0, 47.0), (-115.0, 47.0)).toDF("lon", "lat")
      .createOrReplaceTempView("pip_pts")
    val rows = spark.sql(
      """SELECT lon, graft_pip(lon, lat,
        |  -120.0, 46.0, -117.045, 46.0, -117.045, 49.0, -120.0, 49.0, -120.0, 46.0) AS in_wa
        |FROM pip_pts ORDER BY lon""".stripMargin).collect()
    rows(0).getBoolean(1) shouldBe true  // -118 inside
    rows(1).getBoolean(1) shouldBe false // -115 outside
  }

  test("boundary points: expression and rewrite agree (closed intervals)") {
    import spark.implicits._
    // points exactly ON every edge/corner of the box
    val pts = Seq((-120.0, 46.0), (-117.045, 49.0), (-120.0, 47.5),
      (-118.0, 46.0), (-118.0, 49.0), (-117.045, 47.0)).toDF("lon", "lat")
    val native = pts.withColumn("in",
      G.pointInPolygonNative(col("lon"), col("lat"), waBox)).collect()
    native.foreach(r => withClue(s"(${r.getDouble(0)},${r.getDouble(1)}): ") {
      r.getBoolean(2) shouldBe true
    })
  }
}
