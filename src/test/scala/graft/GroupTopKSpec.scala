package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GroupTopK

/** Properties the gk1 oracle (DuckDB window twin on the sf corpus)
  * doesn't isolate: exact agreement with the window form under planted
  * ties, the small-group boundary, and the plan shape that justifies
  * the operator's existence (bounded partial agg, no Window exchange).
  */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  // 6 groups × 40 rows with heavy score ties (score = id % 7) so the
  // k-boundary lands inside a tie run in every group
  private def tied = (0L until 240L)
    .map(i => (s"g${i % 6}", i, (i % 7).toDouble))
    .toDF("grp", "id", "sc")

  test("matches the window-function reference under ties, best-first per id") {
    val got = GroupTopK.topKPerGroup(tied, "grp", "id", "sc", 5)
    val w = Window.partitionBy("grp").orderBy(desc("sc"), col("id"))
    val want = tied
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("grp"), col("id"), col("sc").as("score"))
    got.count() shouldBe 30L
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
  }

  test("groups smaller than k return every row; k=1 is the per-group argmax") {
    val df = Seq(("a", 1L, 9.0), ("a", 2L, 7.0), ("b", 3L, 5.0))
      .toDF("grp", "id", "sc")
    GroupTopK.topKPerGroup(df, "grp", "id", "sc", 10).count() shouldBe 3L
    val top1 = GroupTopK.topKPerGroup(df, "grp", "id", "sc", 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    top1 shouldBe Map("a" -> 1L, "b" -> 3L)
  }

  test("equal scores keep the smaller ids") {
    val df = Seq(("a", 10L, 1.0), ("a", 3L, 1.0), ("a", 7L, 1.0))
      .toDF("grp", "id", "sc")
    GroupTopK.topKPerGroup(df, "grp", "id", "sc", 2)
      .select("id").as[Long].collect().sorted shouldBe Array(3L, 7L)
  }

  test("plan: bounded partial agg around one exchange — no Window, no row sort") {
    val p = GroupTopK.topKPerGroup(tied, "grp", "id", "sc", 5)
      .queryExecution.executedPlan.toString
    p should not include "Window"
    // typed-Aggregator partial/final pair around the group shuffle
    "ObjectHashAggregate".r.findAllIn(p).size should be >= 2
    p should include("Exchange hashpartitioning")
  }
}
