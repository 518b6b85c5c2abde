package graft

import org.apache.spark.sql.functions._
import graft.operators.Validate
import graft.operators.Validate._

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def planted = Seq(
    (1L, Some(10.0), "a", "ok-1"),
    (2L, Some(150.0), "b", "ok-2"),   // out of range
    (3L, None, "a", "bad"),           // null value, bad format
    (3L, Some(20.0), "z", "ok-3"),    // dup id, bad domain
    (4L, Some(30.0), "a", null)       // null text
  ).toDF("id", "value", "cat", "label")

  test("row-local checks count violations exactly, nulls violate everything but not_null declares it") {
    val report = Validate.run(planted, Seq(
      NotNull("value_not_null", "value"),
      InRange("value_range", "value", 0.0, 100.0),
      AcceptedValues("cat_domain", "cat", Seq("a", "b")),
      MatchesRegex("label_format", "label", "^ok-"),
      Expect("id_positive", col("id") > 0L)
    )).collect().map(r => r.getString(0) ->
      (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap

    report("value_not_null") shouldBe ((5L, 1L, false))
    // null value + 150.0 both violate the range
    report("value_range") shouldBe ((5L, 2L, false))
    report("cat_domain") shouldBe ((5L, 1L, false))
    // "bad" and the NULL label both violate the regex
    report("label_format") shouldBe ((5L, 2L, false))
    report("id_positive") shouldBe ((5L, 0L, true))
  }

  test("unique counts excess duplicates; foreign_key counts DISTINCT orphans and nulls pass vacuously") {
    val parent = Seq(1L, 2L, 4L).toDF("pid")
    val child = Seq(Some(1L), Some(1L), Some(3L), Some(3L), Some(9L), None)
      .toDF("id").withColumn("v", lit("x"))
    val report = Validate.run(child, Seq(
      Unique("id_unique", Seq("id")),
      ForeignKey("id_fk", Seq("id"), parent, Seq("pid"))
    )).collect().map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    // 6 rows, 4 distinct tuples (1, 3, 9, NULL) → 2 excess copies
    report("id_unique") shouldBe ((2L, false))
    // orphaned DISTINCT keys: 3 and 9 (NULL passes vacuously)
    report("id_fk") shouldBe ((2L, false))
  }

  test("all row-local checks fuse into ONE scan of the table", Slow) {
    val df = SparkEntry.queries("dq1_expectations")(spark, sf)
    df.collect()
    // the AQE plan string appends an "== Initial Plan ==" duplicate —
    // count scans in the executed (final) section only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // orders is scanned once for the 5 fused row-local checks, once
    // for each of the 2 unique aggregates, once as FK parent; lineitem
    // once as FK child + once for its row count = 6 scans total for 8
    // checks. A per-check-scan compilation would need 10+.
    "Scan parquet".r.findAllIn(p).size should be <= 6
  }

  test("duplicate check names are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      Validate.run(planted, Seq(
        NotNull("x", "value"), InRange("x", "value", 0, 1)))
    }
    e.getMessage should include("duplicate check names")
  }

  test("annotate tags each row with its failed checks in declaration order, inline") {
    val annotated = Validate.annotate(planted, Seq(
      InRange("range", "value", 0.0, 100.0),
      AcceptedValues("domain", "cat", Seq("a", "b")),
      MatchesRegex("format", "label", "^ok-")
    ))
    val byId = annotated.collect()
      .map(r => (r.getLong(0), r.getString(2)) ->
        (r.getAs[String]("violations"), r.getAs[Boolean]("passed"))).toMap
    byId((1L, "a")) shouldBe (("", true))
    byId((2L, "b")) shouldBe (("range", false))
    byId((3L, "a")) shouldBe (("range,format", false)) // null value + bad label
    byId((3L, "z")) shouldBe (("domain", false))
    byId((4L, "a")) shouldBe (("format", false)) // null label violates regex
    // zero extra passes: the annotation is a projection over one scan
    val p = annotated.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    p should not include "Exchange"
  }

  test("annotate rejects table-level checks loudly") {
    intercept[IllegalArgumentException] {
      Validate.annotate(planted, Seq(Unique("u", Seq("id"))))
    }.getMessage should include("row-local")
  }

  test("report kinds and ordering are stable") {
    val rows = Validate.run(planted, Seq(
      Unique("b_unique", Seq("id")),
      NotNull("a_nn", "value")
    )).collect()
    rows.map(_.getString(0)).toSeq shouldBe Seq("a_nn", "b_unique")
    rows.map(_.getString(1)).toSeq shouldBe Seq("not_null", "unique")
  }
}
