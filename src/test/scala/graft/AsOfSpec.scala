package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** Property gate for the union+window as-of join: result-identical to
  * the per-row brute force on random keyed event data (including ties
  * on both sides and keys with no right rows), plus the bounded-
  * staleness (tolerance) variant. The declared query `j4_asof_join`
  * hash-gates the same semantics against DuckDB's native ASOF JOIN at
  * sf0.01; this spec covers the corners a single dataset can't.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // Seconds granularity over a small range on few keys → plenty of
  // exact-ts ties, both right-right (tie-break) and right-left
  // (inclusive-match) collisions.
  private val rnd = new scala.util.Random(7)
  private val left = (1 to 300).map(i =>
    (rnd.nextInt(8).toLong, new Timestamp(rnd.nextInt(500) * 1000L), i.toLong))
  private val right = (1 to 300).map(i =>
    (rnd.nextInt(8).toLong, new Timestamp(rnd.nextInt(500) * 1000L), (1000 + i).toLong))

  private def brute(tolMicros: Option[Long]): Map[Long, Long] =
    left.map { case (k, ts, lid) =>
      val cands = right.filter(r => r._1 == k && !r._2.after(ts))
        .filter(r => tolMicros.forall(t => (ts.getTime - r._2.getTime) * 1000L <= t))
      lid -> (if (cands.isEmpty) -1L else cands.maxBy(r => (r._2.getTime, r._3))._3)
    }.toMap

  private def run(tolMicros: Option[Long]): Map[Long, Long] =
    AsOf.asofJoin(left.toDF("k", "ts", "lid"), right.toDF("k", "ts", "rid"),
        "k", "ts", Seq("rid"), tieCol = "rid", toleranceMicros = tolMicros)
      .select(col("lid"), coalesce(col("asof_rid"), lit(-1L)).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("asofJoin == per-row brute force (ties, inclusive match, missing keys)") {
    run(None) shouldBe brute(None)
  }

  test("tolerance nulls matches older than the staleness bound") {
    val tol = Some(60L * 1000000L) // 60 s
    val got = run(tol)
    got shouldBe brute(tol)
    // the bound actually bites on this data
    got.values.count(_ == -1L) should be > brute(None).values.count(_ == -1L)
  }

  test("left rows with no prior right row survive with null match") {
    val l = Seq((1L, new Timestamp(1000L), 10L)).toDF("k", "ts", "lid")
    val r = Seq((1L, new Timestamp(2000L), 20L)).toDF("k", "ts", "rid")
    val out = AsOf.asofJoin(l, r, "k", "ts", Seq("rid"), tieCol = "rid").collect()
    out.length shouldBe 1
    out.head.isNullAt(out.head.fieldIndex("asof_rid")) shouldBe true
  }
}
