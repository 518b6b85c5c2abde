package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunking

/** Properties the ch1 oracle (full-formula DuckDB twin on the sf
  * corpus) doesn't isolate: coverage/overlap invariants across window
  * shapes, the no-suffix-tail rule, and degenerate inputs. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int) =
    (id, (1 to nTokens).map(i => s"t$i").mkString(" "))

  test("every token is covered and consecutive chunks overlap by window-stride") {
    val df = Seq(doc(1, 100), doc(2, 17), doc(3, 1)).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "doc_id", "text", window = 10, stride = 7)
      .collect().groupBy(_.getLong(0))
    out(1L).map(_.getLong(1)).sorted shouldBe out(1L).indices.map(_.toLong)
    for (chunks <- out.values) {
      val spans = chunks.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(2) + r.getLong(3)))
      // full coverage: starts at 0, no gap, last chunk reaches n
      spans.head._1 shouldBe 0L
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => s2 should be < e1 // strict overlap
        case _ =>
      }
    }
    // doc 1: 100 tokens, w=10 s=7 → starts 0,7,...,91? last start < 100-3=97
    // → 0..91 step 7 = 14 chunks, last spans [91,100)
    out(1L).length shouldBe 14
    out(1L).map(r => (r.getLong(2), r.getLong(3))).maxBy(_._1) shouldBe (91L, 9L)
    // doc 3: single token → one whole-doc chunk
    out(3L).length shouldBe 1
    out(3L).head.getString(4) shouldBe "t1"
  }

  test("no chunk is a pure suffix of its predecessor (tail-start rule)") {
    // n=12, w=10, s=7: naive starts 0,7 — start 7 spans [7,12) which
    // extends past chunk 0's end 10, so it IS emitted; n=10 would
    // make start 7 a pure suffix ([7,10) ⊂ [0,10)) and drop it.
    val out12 = Chunking.chunkByTokens(Seq(doc(1, 12)).toDF("doc_id", "text"),
      "doc_id", "text", 10, 7).collect()
    out12.map(_.getLong(2)).sorted shouldBe Array(0L, 7L)
    val out10 = Chunking.chunkByTokens(Seq(doc(1, 10)).toDF("doc_id", "text"),
      "doc_id", "text", 10, 7).collect()
    out10.map(_.getLong(2)) shouldBe Array(0L)
  }

  test("stride == window tiles without overlap; chunk text re-joins the tokens") {
    val df = Seq(doc(1, 7)).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "doc_id", "text", 3, 3)
      .orderBy("chunk_id").collect()
    out.map(_.getString(4)) shouldBe Array("t1 t2 t3", "t4 t5 t6", "t7")
    out.map(_.getLong(3)) shouldBe Array(3L, 3L, 1L)
  }

  test("empty, whitespace-only, and null texts yield zero chunks; runs of whitespace count once") {
    val df = Seq((1L, ""), (2L, "   \t "), (4L, "a  b\t\tc")).toDF("doc_id", "text")
      .union(Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out = Chunking.chunkByTokens(df, "doc_id", "text", 4, 4).collect()
    out.map(_.getLong(0)).toSet shouldBe Set(4L)
    out.head.getString(4) shouldBe "a b c"
    out.head.getLong(3) shouldBe 3L
  }

  test("plan: chunking is projection + explode — zero shuffle") {
    val df = Seq(doc(1, 50)).toDF("doc_id", "text")
    val p = Chunking.chunkByTokens(df, "doc_id", "text", 8, 5)
      .queryExecution.executedPlan.toString
    p should not include "Exchange"
  }

  test("paragraph chunks: paragraphs are atomic, pack to budget, oversize stays whole") {
    val df = Seq(
      (1L, "a1 a2 a3 a4\n\nb1 b2 b3 b4 b5\n\nc1 c2 c3"), // 4+5+3 @ budget 8
      (2L, (1 to 20).map(i => s"t$i").mkString(" ")))      // one 20-token para
      .toDF("doc_id", "text")
    val out = Chunking.chunkByParagraphs(df, "doc_id", "text", budget = 8)
      .orderBy("doc_id", "chunk_id").collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq shouldBe
      Seq((1L, 0L, 2L, 9L), (1L, 1L, 1L, 3L), (2L, 0L, 1L, 20L))
    out(0).getString(4) shouldBe "a1 a2 a3 a4\n\nb1 b2 b3 b4 b5"
    out(1).getString(4) shouldBe "c1 c2 c3"
  }

  test("paragraph chunks: whitespace-only and null docs vanish; re-join order is deterministic") {
    val df = Seq((3L, "  \n\n\t\n\np31 p32"), (5L, "x1 x2\n\n\n\ny1 y2 y3"))
      .toDF("doc_id", "text")
      .union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out = Chunking.chunkByParagraphs(df.repartition(7), "doc_id", "text", 8)
      .orderBy("doc_id", "chunk_id").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(3L, 5L)
    out(0).getString(4) shouldBe "p31 p32"
    out(1).getString(4) shouldBe "x1 x2\n\ny1 y2 y3" // 4-newline gap = ONE separator
  }

  test("plan: paragraph chunking shuffles once on the doc key — no global window") {
    val df = Seq((1L, "a\n\nb")).toDF("doc_id", "text")
    val p = Chunking.chunkByParagraphs(df, "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    "Exchange hashpartitioning\\(doc_id".r.findAllIn(p).size should be >= 1
    p should not include "Exchange SinglePartition"
    p should not include "Exchange rangepartitioning"
  }
}
