package graft

import org.apache.spark.sql.functions._
import graft.operators.{MaximalRepeats, SpanDedup}

/** Variable-length maximal-repeat detection: brute-force parity on a
  * repeat-dense pseudo-random corpus, the overlapping-repeats fixture
  * where fixed-n provably can't report the structure, within-doc
  * repeats (fixed-n distinct-doc counting is blind), cap saturation,
  * and the span-removal surface. */
class MaximalRepeatsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic repeat-dense corpus: tokens from a 4-letter
    * alphabet via a tiny LCG — small alphabet ⟹ repeats of many
    * lengths arise naturally, the shape that stresses every length of
    * the sweep at once. */
  private def randomCorpus(nDocs: Int, docLen: Int): Seq[(Long, String)] = {
    var s = 12345L
    def next(): Int = { s = (s * 1103515245L + 12345L) % 2147483648L; (s % 4).toInt }
    (0 until nDocs).map { d =>
      (d.toLong, (0 until docLen).map(_ => s"t${next()}").mkString(" "))
    }
  }

  /** Scala brute force: per (doc, pos), the max l in [minLen, cap]
    * such that the l-token slice occurs at another (doc, pos). */
  private def bruteLens(docs: Seq[(Long, String)], minLen: Int,
                        cap: Int): Map[(Long, Int), Int] = {
    val toks = docs.map { case (d, t) => d -> t.split("\\s+").toVector }.toMap
    val all = for {
      (d, ts) <- toks.toSeq; p <- ts.indices
    } yield (d, p)
    all.flatMap { case (d, p) =>
      val ts = toks(d)
      val best = (minLen to cap).filter { l =>
        p + l <= ts.size && all.exists { case (d2, p2) =>
          (d2, p2) != (d, p) && p2 + l <= toks(d2).size &&
            toks(d2).slice(p2, p2 + l) == ts.slice(p, p + l)
        }
      }
      best.lastOption.map(l => (d, p) -> l)
    }.toMap
  }

  test("repeatLens: brute-force parity on a repeat-dense corpus") {
    val docs = randomCorpus(nDocs = 4, docLen = 40)
    val expect = bruteLens(docs, minLen = 3, cap = 8)
    val got = MaximalRepeats.repeatLens(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 3, cap = 8)
      .as[(Long, Int, Long)].collect()
      .map { case (d, p, l) => (d, p) -> l.toInt }.toMap
    got shouldBe expect
  }

  test("overlapping variable-length repeats: exact lengths fixed-n can't report") {
    // doc 1 carries r1..r6 (shared with doc 2, length 6) OVERLAPPING
    // r4..r10 (shared with doc 3, length 7): rep_len at the two starts
    // must read the two different lengths, and the merged span is 10
    // tokens although no 10-token substring repeats anywhere.
    val docs = Seq(
      (1L, "u1 u2 r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 u3"),
      (2L, "v1 r1 r2 r3 r4 r5 r6 v2"),
      (3L, "r4 r5 r6 r7 r8 r9 r10 w1 w2"))
      .toDF("doc_id", "text")
    val lens = MaximalRepeats.repeatLens(docs, "doc_id", "text",
        minLen = 4, cap = 16)
      .as[(Long, Int, Long)].collect()
      .map { case (d, p, l) => (d, p) -> l }.toMap
    lens((1L, 2)) shouldBe 6L  // r1..r6 with doc 2
    lens((1L, 5)) shouldBe 7L  // r4..r10 with doc 3
    val spans = MaximalRepeats.repeatSpans(docs, "doc_id", "text",
        minLen = 4, cap = 16)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long)].collect()
    spans shouldBe Array((1L, 2L, 10L), (2L, 1L, 6L), (3L, 0L, 7L))
  }

  test("within-doc repeats: found here, provably invisible to fixed-n windows") {
    val docs = Seq(
      (4L, "x1 p1 p2 p3 p4 p5 x2 p1 p2 p3 p4 p5 x3"),
      (5L, "z1 z2 z3 z4 z5"))
      .toDF("doc_id", "text")
    val spans = MaximalRepeats.repeatSpans(docs, "doc_id", "text",
        minLen = 4, cap = 16)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long)].collect()
    spans shouldBe Array((4L, 1L, 5L), (4L, 7L, 5L))
    // the fixed-n operator at the same threshold sees NOTHING: its
    // duplicated-window set counts DISTINCT DOCS, and the repeat
    // lives twice in one doc — the fringe dd20 exists to close
    SpanDedup.duplicatedWindowHashes(docs, "doc_id", "text", n = 4)
      .count() shouldBe 0L
  }

  test("cap saturation: a repeat longer than cap stays fully covered") {
    // 12-token shared run, cap 8: reported lengths saturate at 8 but
    // coverage/span extents remain exact (every token of the repeat
    // is inside some cap-length sub-repeat)
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, s"a1 $shared b1"), (2L, s"$shared c1 c2"))
      .toDF("doc_id", "text")
    val spans = MaximalRepeats.repeatSpans(docs, "doc_id", "text",
        minLen = 4, cap = 8)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long)].collect()
    spans shouldBe Array((1L, 1L, 12L), (2L, 0L, 12L))
    val maxLen = MaximalRepeats.repeatLens(docs, "doc_id", "text",
        minLen = 4, cap = 8)
      .agg(max("rep_len")).as[Long].head()
    maxLen shouldBe 8L
  }

  test("spanDedupVar: covered spans removed, survivors in order") {
    val docs = Seq(
      (1L, "u1 u2 r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 u3"),
      (2L, "v1 r1 r2 r3 r4 r5 r6 v2"),
      (3L, "r4 r5 r6 r7 r8 r9 r10 w1 w2"),
      (4L, "x1 p1 p2 p3 p4 p5 x2 p1 p2 p3 p4 p5 x3"),
      (5L, "z1 z2 z3 z4 z5"))
      .toDF("doc_id", "text")
    val r = MaximalRepeats.spanDedupVar(docs, "doc_id", "text",
        minLen = 4, cap = 16)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    r shouldBe Array(
      (1L, 13L, 10L, "u1 u2 u3"),
      (2L, 8L, 6L, "v1 v2"),
      (3L, 9L, 7L, "w1 w2"),
      (4L, 13L, 10L, "x1 x2 x3"),
      (5L, 5L, 0L, "z1 z2 z3 z4 z5"))
  }

  test("plan shape: no cartesian product, no global single-partition window") {
    val docs = randomCorpus(2, 20).toDF("doc_id", "text")
    val p = MaximalRepeats.repeatSpans(docs, "doc_id", "text",
        minLen = 3, cap = 8)
      .queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }
}
