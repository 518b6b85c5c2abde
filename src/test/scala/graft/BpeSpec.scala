package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Vocab}

/** BPE trainer on the classic Sennrich corpus (low×5 lower×2
  * newest×6 widest×3): the full hand-derived merge sequence, the
  * distributed collapse agreeing with the pure driver loop, the
  * single-step cross-pin against Vocab.bpePairCounts, and apply-side
  * parity between the driver encoder and the native expression. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val wordCounts = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  // merges 1..8, each derivable by hand (object scaladoc semantics)
  private val expected = Seq(
    ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
    ("e", "w"), ("ew", "est"), ("n", "ewest"), ("d", "est"))

  private def corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")).toDF("doc_id", "text")

  test("the merge loop reproduces the hand-derived Sennrich sequence") {
    Bpe.trainFromWordCounts(wordCounts, 8) shouldBe expected
  }

  test("distributed word collapse trains identically, under any partitioning") {
    Bpe.trainMerges(corpus, "text", 8) shouldBe expected
    Bpe.trainMerges(corpus.repartition(7), "text", 8) shouldBe expected
  }

  test("the first merge is exactly Vocab.bpePairCounts' top pair") {
    val top = Vocab.bpePairCounts(corpus, "doc_id", "text", 1)
      .head().getString(0)
    top shouldBe (expected.head._1 + expected.head._2)
  }

  test("greedy encode: seen words re-segment as trained, unseen stay chars") {
    val ranks = expected.zipWithIndex.toMap
    Bpe.encodeWord("lowest", ranks) shouldBe Seq("low", "est") // the classic
    Bpe.encodeWord("newest", ranks) shouldBe Seq("newest")
    Bpe.encodeWord("wider", ranks) shouldBe Seq("w", "i", "d", "e", "r")
    Bpe.encodeWord("x", ranks) shouldBe Seq("x")
  }

  test("the native encode expression matches the driver encoder word for word") {
    val ranks = expected.zipWithIndex.toMap
    val rows = Seq(
      (1L, "lowest newest"), (2L, "  low\t lower "), (3L, ""), (4L, "LOWEST"))
      .toDF("doc_id", "text")
      .union(Seq((5L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val got = rows.select(col("doc_id"),
        Bpe.encode(col("text"), expected).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    def ref(t: String): Seq[String] =
      t.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
        .filter(_.nonEmpty).toSeq
        .flatMap(w => Bpe.encodeWord(w, ranks))
    got(1L) shouldBe ref("lowest newest")
    got(2L) shouldBe ref("low lower")
    got(3L) shouldBe Seq.empty
    got(4L) shouldBe ref("lowest") // case-folded like the trainer
    got(5L) shouldBe Seq.empty     // null → empty, the corpus posture
  }

  test("SQL surface: graft_bpe_encode with a literal merge spec equals the Column form") {
    import spark.implicits._
    val spec = Bpe.mergesSpec(expected)
    Bpe.parseMergesSpec(spec) shouldBe expected
    Seq((1L, "lowest newest"), (2L, "wider"))
      .toDF("doc_id", "text")
      .union(Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"))
      .createOrReplaceTempView("bpe_sql_view")
    val got = spark.sql(
      s"SELECT doc_id, graft_bpe_encode(text, '$spec') AS toks FROM bpe_sql_view")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    got(1L) shouldBe Seq("low", "est", "newest")
    got(2L) shouldBe Seq("w", "i", "d", "e", "r")
    got(3L) shouldBe Seq.empty // null folds to '' — SAME as the Column form
    intercept[Exception] {
      spark.sql("SELECT graft_bpe_encode(text, text) FROM bpe_sql_view").collect()
    }
  }

  test("merge spec round-trips symbols containing punctuation (commas included)") {
    // symbols are whitespace-free but can hold ANY punctuation —
    // a comma- or pipe-delimited spec format would re-parse these as
    // a silently different tokenizer
    val nasty = Seq(("a", "b,x"), ("ab,x", "c|d"), ("e", "f"))
    Bpe.parseMergesSpec(Bpe.mergesSpec(nasty)) shouldBe nasty
    intercept[IllegalArgumentException] {
      Bpe.mergesSpec(Seq(("a b", "c"))) // whitespace in a symbol
    }
    intercept[IllegalArgumentException] {
      Bpe.parseMergesSpec("a b c") // odd symbol count
    }
  }

  test("training stops when every word is fully merged") {
    Bpe.trainFromWordCounts(Seq("ab" -> 1L), 10) shouldBe Seq(("a", "b"))
    Bpe.trainFromWordCounts(Seq("a" -> 5L), 10) shouldBe Seq.empty
    Bpe.trainFromWordCounts(Seq.empty, 3) shouldBe Seq.empty
  }

  test("incremental trainer equals the naive full recount, merge for merge") {
    // the classic fixture, run to exhaustion in both
    Bpe.trainFromWordCounts(wordCounts, 64) shouldBe
      Bpe.trainFromWordCountsNaive(wordCounts, 64)
    // randomized fixture over a 4-letter alphabet: short words, heavy
    // count ties, repeated-letter runs (the overlap edge), and enough
    // rounds that the vocabulary churns — any drift in the delta
    // bookkeeping or the heap's tie ordering diverges here
    val rnd = new scala.util.Random(20260814L)
    val fixture = Seq.fill(400) {
      val len = 1 + rnd.nextInt(8)
      (Seq.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString,
        1L + rnd.nextInt(9))
    }.groupMapReduce(_._1)(_._2)(_ + _)
      .toSeq.sortBy(_._1)
    val inc = Bpe.trainFromWordCounts(fixture, 60)
    val naive = Bpe.trainFromWordCountsNaive(fixture, 60)
    inc shouldBe naive
    inc.length should be > 30 // the fixture genuinely exercises depth
    // zero-count words are rejected loudly (the naive loop would let
    // them skew the "pair is live iff it occurs" invariant silently)
    intercept[IllegalArgumentException] {
      Bpe.trainFromWordCounts(Seq("ab" -> 0L), 1)
    }
  }

  test("incremental trainer handles a 512-merge vocabulary in driver time") {
    // ~2k distinct pseudo-words over an 8-letter alphabet: the naive
    // recount would do rounds × total-positions work here; the
    // incremental loop must finish hundreds of merges interactively
    // (the sf-scale wall-clock gauge is bench-side: sx54)
    val rnd = new scala.util.Random(7L)
    val fixture = Seq.fill(4000) {
      val len = 2 + rnd.nextInt(10)
      (Seq.fill(len)(('a' + rnd.nextInt(8)).toChar).mkString,
        1L + rnd.nextInt(50))
    }.groupMapReduce(_._1)(_._2)(_ + _).toSeq.sortBy(_._1)
    val t0 = System.nanoTime()
    val merges = Bpe.trainFromWordCounts(fixture, 512)
    val secs = (System.nanoTime() - t0) / 1e9
    merges.length shouldBe 512
    secs should be < 10.0 // generous CI bound; typical is well under 1s
  }
}
