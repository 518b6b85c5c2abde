package graft

import org.apache.spark.sql.functions._
import graft.operators.FreqItems

/** Misra–Gries heavy hitters: the containment guarantee, exactness of
  * the two-pass result, and partitioning-independence (the sketch's
  * candidate set may vary with combine order; the final answer must
  * not). */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  // 1000 tokens: "hot" ×400, "warm" ×150, 45 distinct cold fillers ×10
  private def corpus = (Seq.fill(400)("hot") ++ Seq.fill(150)("warm") ++
    (0 until 45).flatMap(i => Seq.fill(10)(s"cold$i"))).toDF("term")

  test("every item above n/(k+1) is found, with its exact count") {
    // k=9 → threshold 1000/10 = 100: hot and warm qualify, no cold does
    val got = FreqItems.heavyHitters(corpus, "term", k = 9)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("hot" -> 400L, "warm" -> 150L)
  }

  test("the answer is identical under any partitioning of the input") {
    val expected = Map("hot" -> 400L, "warm" -> 150L)
    for (p <- Seq(1, 7, 32)) {
      val got = FreqItems.heavyHitters(corpus.repartition(p), "term", k = 9)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      withClue(s"partitions=$p: ") { got shouldBe expected }
    }
  }

  test("threshold is strict: an item at exactly n/(k+1) does not qualify") {
    // 100 tokens, k=9 → threshold 10; "edge" has exactly 10
    val df = (Seq.fill(10)("edge") ++ (0 until 90).map(i => s"u$i")).toDF("term")
    FreqItems.heavyHitters(df, "term", k = 9)
      .filter(col("term") === "edge").count() shouldBe 0L
  }

  test("RAW null terms fold to the empty string in both passes") {
    // n=100, k=1 → threshold 50: the null-group is the one true heavy
    // hitter, and the operator must find it WITHOUT the caller
    // pre-coalescing — pass 2 mirrors the sketch's null→"" fold (a
    // bare isin("") would miss every NULL row and drop the answer)
    val df = (Seq.fill(60)(null.asInstanceOf[String]) ++ Seq.fill(40)("x"))
      .toDF("term")
    val got = FreqItems.heavyHitters(df, "term", k = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("" -> 60L)
  }
}
