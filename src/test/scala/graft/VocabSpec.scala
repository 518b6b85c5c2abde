package graft

import graft.operators.Vocab

/** Hand-checkable invariants behind the vb1-vb3 oracles (full-formula
  * DuckDB twins on the sf corpus): exact df-vs-cf accounting, the
  * occurrence-weighted pair counts, and the OOV boundary cases. */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "apple apple banana"),
    (2L, "apple cherry"),
    (3L, "banana banana banana x"))
    .toDF("doc_id", "text")

  test("termStats: df counts docs, cf counts occurrences, df-desc term-asc order") {
    val out = Vocab.termStats(fixture, "doc_id", "text", 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out shouldBe Array(
      ("apple", 2L, 3L),   // docs 1,2; occurrences 2+1
      ("banana", 2L, 4L),  // docs 1,3; occurrences 1+3
      ("cherry", 1L, 1L),
      ("x", 1L, 1L))
  }

  test("termStats: k truncates after the sort") {
    Vocab.termStats(fixture, "doc_id", "text", 2).collect()
      .map(_.getString(0)) shouldBe Array("apple", "banana")
  }

  test("oovRate: full vocab covers everything; disjoint vocab covers nothing") {
    val full = Vocab.topVocab(fixture, "doc_id", "text", 100)
    val r1 = Vocab.oovRate(fixture, "doc_id", "text", full).collect().head
    (r1.getLong(0), r1.getLong(1), r1.getDouble(2)) shouldBe ((9L, 0L, 0.0))
    val none = Seq("zebra").toDF("term")
    val r2 = Vocab.oovRate(fixture, "doc_id", "text", none).collect().head
    (r2.getLong(0), r2.getLong(1), r2.getDouble(2)) shouldBe ((9L, 9L, 1.0))
  }

  test("oovRate: partial vocab — exact occurrence-weighted count") {
    val v = Seq("apple", "banana").toDF("term")
    val r = Vocab.oovRate(fixture, "doc_id", "text", v).collect().head
    // covered: 3 apples + 4 bananas = 7 of 9; oov = cherry + x = 2
    (r.getLong(0), r.getLong(1)) shouldBe ((9L, 2L))
    r.getDouble(2) shouldBe math.rint(2.0 / 9.0 * 1e6) / 1e6
  }

  test("bpePairCounts: occurrence-weighted adjacent pairs; 1-char tokens drop") {
    val docs = Seq((1L, "abab ab x"), (2L, "ab")).toDF("doc_id", "text")
    val out = Vocab.bpePairCounts(docs, "doc_id", "text", 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // "abab": ab,ba,ab; "ab"×2: ab each; "x": nothing
    out shouldBe Map("ab" -> 4L, "ba" -> 1L)
  }

  test("bpePairCounts: case folding merges pair counts") {
    val docs = Seq((1L, "AB ab")).toDF("doc_id", "text")
    Vocab.bpePairCounts(docs, "doc_id", "text", 10).collect()
      .map(r => (r.getString(0), r.getLong(1))) shouldBe Array(("ab", 2L))
  }
}
