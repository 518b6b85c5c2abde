package graft

import org.apache.spark.sql.functions._
import graft.functions.{GeoFunctions => G}

/** Geo layer tests: haversine anchors, $near semantics, ray-cast PIP
  * vs the box rewrite, and the reference's conservation invariant shape
  * (readme.md:516-522: WA nodes + ID nodes == all nodes).
  */
class GeoFunctionsSpec extends SparkSpec {

  private def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    import spark.implicits._
    Seq(1).toDF("x")
      .select(G.haversineMeters(lit(lat1), lit(lon1), lit(lat2), lit(lon2)))
      .collect()(0).getDouble(0)
  }

  test("haversine anchors, symmetry, identity") {
    // 1 degree of longitude at the equator = pi*R/180
    hav(0, 0, 0, 1) shouldBe (math.Pi * G.EarthRadiusMeters / 180) +- 1.0
    // Spokane (47.6588,-117.4260) to Coeur d'Alene (47.6777,-116.7805):
    // ~48.4 km (the reference's two cities, map_area_info.txt)
    hav(47.6588, -117.4260, 47.6777, -116.7805) shouldBe 48.5e3 +- 0.5e3
    hav(10, 20, 30, 40) shouldBe hav(30, 40, 10, 20) +- 1e-9
    hav(47.0, -117.0, 47.0, -117.0) shouldBe 0.0 +- 1e-9
    // miles→meters unit arithmetic (readme.md:393)
    G.MetersPerMile * 10 shouldBe 16093.44 +- 1e-6
  }

  test("$near semantics: ascending distance, bounded by maxDistance") {
    import spark.implicits._
    val pts = Seq((1L, 47.10, -117.20), (2L, 47.11, -117.21),
      (3L, 47.50, -117.90), (4L, 47.1001, -117.2001)).toDF("id", "lat", "lon")
    val got = G.nearest(pts, col("lat"), col("lon"), 47.10, -117.20, 10000.0)
      .select("id").collect().map(_.getLong(0)).toSeq
    got shouldBe Seq(1L, 4L, 2L) // 3 is ~50km away, excluded
  }

  test("ray-cast PIP agrees with the box rewrite on axis-aligned boxes") {
    import spark.implicits._
    // the reference's wa_box/id_box shape (readme.md:508-514): split at
    // the WA/ID border lon=-117.04
    val waBox = Array((-117.04, 46.0), (-117.04, 49.0), (-120.0, 49.0),
      (-120.0, 46.0), (-117.04, 46.0))
    val idBox = Array((-116.0, 46.0), (-116.0, 49.0), (-117.04, 49.0),
      (-117.04, 46.0), (-116.0, 46.0))
    // deterministic point cloud spanning both boxes + outside; offsets
    // chosen so no point lands EXACTLY on a box edge (there the
    // closed-interval box and the even-odd ray-cast legitimately
    // disagree — that asymmetry is the next test's subject)
    val pts = (0 until 2000).map { i =>
      (i.toLong, 46.0005 + (i % 50) * 0.065, -120.4995 + (i % 97) * 0.047)
    }.toDF("id", "lat", "lon")

    val waUdf = G.pointInPolygon(waBox)
    val idUdf = G.pointInPolygon(idBox)
    val scored = pts.select(col("id"), col("lat"), col("lon"),
      waUdf(col("lon"), col("lat")).as("pip_wa"),
      idUdf(col("lon"), col("lat")).as("pip_id"),
      G.inBox(col("lon"), col("lat"), -120.0, 46.0, -117.04, 49.0).as("box_wa"),
      G.inBox(col("lon"), col("lat"), -117.04, 46.0, -116.0, 49.0).as("box_id"))
      .cache()

    // PIP and the pushdown-friendly box rewrite agree everywhere except
    // possibly exact-boundary points (even-odd edge asymmetry vs
    // closed-interval box). Our grid avoids exact boundaries.
    scored.filter(col("pip_wa") =!= col("box_wa")).count() shouldBe 0
    scored.filter(col("pip_id") =!= col("box_id")).count() shouldBe 0

    // conservation invariant shape (readme.md:522): boxes partition the
    // full lon range they cover — every point in the union is in
    // exactly one
    val within = scored.filter(col("lon") > -120.0 && col("lon") < -116.0 &&
      col("lat") > 46.0 && col("lat") < 49.0 &&
      col("lon") =!= -117.04)
    val total = within.count()
    val wa = within.filter(col("box_wa")).count()
    val id = within.filter(col("box_id")).count()
    (wa + id) shouldBe total
    scored.unpersist()
  }

  test("PIP handles a non-convex ring (beyond the reference's boxes)") {
    import spark.implicits._
    // L-shaped polygon: unit square minus its top-right quadrant
    val ell = Array((0.0, 0.0), (1.0, 0.0), (1.0, 0.5), (0.5, 0.5),
      (0.5, 1.0), (0.0, 1.0), (0.0, 0.0))
    val f = G.pointInPolygon(ell)
    val got = Seq(
      (0.25, 0.25, true),  // lower-left quadrant
      (0.75, 0.25, true),  // lower-right
      (0.25, 0.75, true),  // upper-left
      (0.75, 0.75, false), // notch
      (1.5, 0.5, false))   // outside
      .toDF("x", "y", "want")
      .select(f(col("x"), col("y")).as("got"), col("want")).collect()
    got.foreach(r => r.getBoolean(0) shouldBe r.getBoolean(1))
  }
}
