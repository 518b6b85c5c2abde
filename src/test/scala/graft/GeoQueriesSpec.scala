package graft

/** Cross-checks between the oracle-checked box form of $geoWithin and
  * the oracle-less ray-cast UDF form — the correctness gate for f14b
  * (SURVEY §7.3: "no DuckDB oracle for UDF-geo queries — mitigate with
  * conservation invariants").
  */
class GeoQueriesSpec extends SparkSpec {

  test("f14b (ray-cast PIP) reproduces f14 (box rewrite) exactly; conservation holds") {
    val box = SparkEntry.queries("f14_geowithin_box")(spark, sf).collect()(0)
    val pip = SparkEntry.queries("f14b_pip_conservation")(spark, sf).collect()(0)
    pip.getAs[Long]("n_wa") shouldBe box.getAs[Long]("n_wa")
    pip.getAs[Long]("n_id") shouldBe box.getAs[Long]("n_id")
    pip.getAs[Long]("n_total") shouldBe box.getAs[Long]("n_total")
    box.getAs[Boolean]("conserved") shouldBe true
    pip.getAs[Boolean]("conserved") shouldBe true
    // both boxes are non-trivially populated (the grid spans the split)
    box.getAs[Long]("n_wa") should be > 0L
    box.getAs[Long]("n_id") should be > 0L
  }

  test("driver smoke: entry returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }
}
