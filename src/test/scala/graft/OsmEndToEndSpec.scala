package graft

import org.apache.spark.sql.functions._
import graft.functions.{GeoFunctions => G}
import graft.operators.Repairs
import graft.sources.OsmSource

/** The reference's whole workflow replayed end-to-end on OSM data:
  * XML ingest → parquet → repair → the readme.md query battery
  * (counts, distinct users, top amenities, $near, $geoWithin
  * conservation). Everything runs on the canonical typed schema — the
  * integration seam test across sources/operators/functions/queries.
  */
class OsmEndToEndSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val p = OsmFixture.write("example.osm", OsmFixture.xml)
    val dir = java.nio.file.Files.createTempDirectory("osm-e2e").toString + "/docs"
    // ingest RAW (lesson-style), clean as a transform (project-style) —
    // both reference variants in one pipeline
    val raw = OsmSource.elements(spark, p.toString, cleanStreets = false)
    Repairs.clean(raw.toDF()).write.mode("overwrite").partitionBy("type").parquet(dir)
    dir
  }

  private lazy val docs = spark.read.parquet(warehouse)

  test("dataset-level invariants (readme.md:144-152 shape)") {
    docs.count() shouldBe 21
    docs.filter(col("type") === "node").count() shouldBe 20
    docs.filter(col("type") === "way").count() shouldBe 1
    docs.select(col("created.user")).distinct().count() shouldBe 6
  }

  test("repairs applied in flight: streets normalized through the pipeline") {
    val streets = docs.filter(col("address.street").isNotNull)
      .select(col("address.street")).collect().map(_.getString(0)).toSet
    streets shouldBe Set("West Lexington Street", "Baldwin Road", "North Mozart Avenue")
  }

  test("top-amenities pipeline (readme.md:246-249) on the shaped corpus") {
    val top = docs.filter(col("amenity").isNotNull)
      .groupBy("amenity").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("amenity")).limit(20)
      .collect()
    top.map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe Seq(("restaurant", 1L))
  }

  test("$near (readme.md:392-398): nodes sorted by distance from a point") {
    val nodes = docs.filter(col("type") === "node")
    val near = G.nearest(nodes, col("pos.lat"), col("pos.lon"),
        41.9730791, -87.6866303, 2000.0)
      .select(col("id"), round(col("dist_m"), 1).as("d"))
      .collect()
    near.head.getString(0) shouldBe "261114295" // the center node itself, d=0
    near.head.getDouble(1) shouldBe 0.0
    // ascending distance
    val ds = near.map(_.getDouble(1)).toSeq
    ds shouldBe ds.sorted
    // the far-west nodes (~1km+) included, nothing beyond 2km
    ds.last should be <= 2000.0
  }

  test("$geoWithin conservation (readme.md:516-522): box split partitions all nodes") {
    val nodes = docs.filter(col("type") === "node")
      .select(col("pos.lon").as("lon"), col("pos.lat").as("lat"))
    // split the fixture's bbox at lon=-87.69 via the native expression
    val west = Array((-87.71, 41.96), (-87.69, 41.96), (-87.69, 41.99),
      (-87.71, 41.99), (-87.71, 41.96))
    val east = Array((-87.69, 41.96), (-87.67, 41.96), (-87.67, 41.99),
      (-87.69, 41.99), (-87.69, 41.96))
    val nWest = nodes.filter(G.pointInPolygonNative(col("lon"), col("lat"), west)).count()
    val nEast = nodes.filter(G.pointInPolygonNative(col("lon"), col("lat"), east)).count()
    // no fixture node sits exactly on the split line, so closed boxes partition
    (nWest + nEast) shouldBe nodes.count()
    nWest should be > 0L
    nEast should be > 0L
  }

  test("graft_haversine is SQL-callable (F13 via the extension)") {
    docs.createOrReplaceTempView("osm_docs")
    val d = spark.sql(
      """SELECT id, graft_haversine(41.9730791, -87.6866303, pos.lat, pos.lon) AS d
        |FROM osm_docs WHERE type = 'node' ORDER BY d LIMIT 2""".stripMargin).collect()
    d(0).getString(0) shouldBe "261114295"
    d(0).getDouble(1) shouldBe 0.0 +- 1e-6
    d(1).getDouble(1) should be > 0.0
  }
}
