package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

import graft.plans.BpeEncodeExpr

/** BPE tokenizer TRAINING — the full merge loop [[Vocab.bpePairCounts]]
  * computes one step of. The industrial shape (Sennrich et al., and
  * what HF tokenizers does): the corpus first collapses to a
  * word-frequency table (one explode + partial-agged groupBy +
  * TakeOrdered — the only distributed pass, and the corpus text never
  * shuffles), then the merge loop runs driver-side over that bounded
  * table. A 100 TB corpus and a 100 MB corpus train over the same
  * few-hundred-thousand-row word table; corpus scale only changes the
  * counts. Driver state = the word table (≤ `maxWords` rows) — the
  * same bounded-model precedent as the IVF centroids and the
  * classifier weights.
  *
  * Semantics (pinned in BpeSpec on the classic low/lower/newest/widest
  * fixture): pairs count PER ADJACENT POSITION weighted by word
  * frequency; the merge chosen each round is max count with
  * lexicographic (left, right) tie-break; application replaces
  * non-overlapping occurrences left to right. No end-of-word marker —
  * tokens never span words (words come from the corpus whitespace
  * convention, lowercased like [[Vocab]]/[[Retrieval]]).
  *
  * The APPLY side ([[encode]]) is the data path: one native expression
  * per row with the merge ranks in the task closure, zero shuffle —
  * the same fused-scan shape as the classifier's scorer.
  */
object Bpe {

  type Merge = (String, String)

  /** Train `nMerges` merges from a corpus: word-count collapse, then
    * [[trainFromWordCounts]]. */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  maxWords: Int = 100000): Seq[Merge] = {
    // HEADROOM over maxWords at the Spark-side cut: the driver re-fold
    // below can only MERGE rows, so collecting extra rows lets words
    // just past the boundary contribute their counts to surviving
    // fold-mates instead of vanishing; the FINAL cut happens after the
    // fold, under one consistent (count desc, word asc) Java-String
    // ordering — the Spark cut's UTF8-binary sort never decides which
    // folded words survive. (Any finite truncation of an unbounded
    // vocabulary is heuristic at the outer boundary; the headroom makes
    // the fold exact for everything the final table keeps.)
    val headroom = maxWords + math.min(maxWords, 4096)
    val words = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w")).limit(headroom)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // Locale.ROOT re-fold on the driver: Spark's lower() falls back to
    // default-locale String.toLowerCase for non-ASCII, while the
    // encode expression lowercases with Locale.ROOT — training
    // symbols MUST come out of the identical fold or a trained merge
    // can never fire at encode (the tr-TR 'İ' trap). ASCII corpora are
    // untouched; colliding folds combine counts.
    val folded = words
      .groupMapReduce(_._1.toLowerCase(java.util.Locale.ROOT))(_._2)(_ + _)
      .toSeq.sortBy { case (w, n) => (-n, w) }
      .take(maxWords)
    trainFromWordCounts(folded, nMerges)
  }

  /** The merge loop — pure, deterministic driver math over the bounded
    * word-count table, INCREMENTAL (Sennrich's production variant):
    * pair counts build once, then each round touches only the words
    * that CONTAIN the chosen pair, applying positional count deltas and
    * keeping candidates in a lazily-invalidated max-heap. Per-round
    * cost is O(Σ length of affected words + log-factor heap traffic)
    * instead of the naive O(total symbol positions) full recount — the
    * difference between fixture-scale-only and a real 32k-merge
    * vocabulary (the naive rebuild is ~10^10 driver ops there; this is
    * minutes of deltas). Output is IDENTICAL to the naive loop — same
    * max-count / lexicographic-(left,right) selection each round —
    * pinned by BpeSpec's equivalence gates on the classic and a
    * randomized fixture. Stops early when no pair remains (every word
    * fully merged). Word counts must be positive: a zero-count word
    * cannot influence any merge decision and would only blur the
    * "pair is live iff it occurs" invariant the heap relies on. */
  def trainFromWordCounts(words: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    require(nMerges >= 0, s"negative nMerges: $nMerges")
    words.foreach { case (w, n) =>
      require(n > 0, s"non-positive count for word '$w': $n") }
    val syms: Array[Array[String]] =
      words.map { case (w, _) => w.map(_.toString).toArray }.toArray
    val freq: Array[Long] = words.map(_._2).toArray

    val pairCounts = scala.collection.mutable.HashMap.empty[Merge, Long]
    // pair → indices of words containing it (at >= 1 position)
    val pairWords = scala.collection.mutable.HashMap.empty[Merge, scala.collection.mutable.BitSet]
    // max-heap on (count, pair): highest count first, then
    // lexicographically SMALLEST (left, right) — the naive loop's
    // minBy((-n, a, b)) ordering. Entries are never removed on count
    // change; they invalidate lazily (pop-and-check against the live
    // count), the standard trick that keeps updates O(log n).
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val a = y._2.compareTo(x._2) // smaller left symbol wins
          if (a != 0) a else y._3.compareTo(x._3)
        }
      }
    }
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)

    def addPair(p: Merge, i: Int, n: Long): Unit = {
      pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
      pairWords.getOrElseUpdate(p, scala.collection.mutable.BitSet.empty) += i
    }
    var i = 0
    while (i < syms.length) {
      val ss = syms(i)
      var j = 0
      while (j < ss.length - 1) { addPair((ss(j), ss(j + 1)), i, freq(i)); j += 1 }
      i += 1
    }
    pairCounts.foreach { case ((a, b), n) => heap.enqueue((n, a, b)) }

    val merges = Seq.newBuilder[Merge]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      // pop stale entries: an entry is live iff its count matches the
      // pair's CURRENT count (a pair re-reaching an old count re-enqueued
      // on the way, so equality is sufficient)
      var best: Merge = null
      while (best == null && heap.nonEmpty) {
        val (n, a, b) = heap.dequeue()
        if (pairCounts.getOrElse((a, b), 0L) == n) best = (a, b)
      }
      if (best == null) exhausted = true
      else {
        merges += best
        // touched pairs accumulate deltas across all affected words,
        // then re-enqueue ONCE with their new live count
        val touched = scala.collection.mutable.HashSet.empty[Merge]
        val affected = pairWords.getOrElse(best, scala.collection.mutable.BitSet.empty)
        affected.toArray.foreach { wi =>
          val old = syms(wi)
          val nw = mergeOnce(old, best)
          val n = freq(wi)
          // positional deltas: subtract every adjacent pair of the old
          // form, add every adjacent pair of the new — exactly the
          // naive recount's contribution change for this word
          var j = 0
          while (j < old.length - 1) {
            val p = (old(j), old(j + 1))
            pairCounts(p) = pairCounts(p) - n
            touched += p
            j += 1
          }
          j = 0
          while (j < nw.length - 1) {
            val p = (nw(j), nw(j + 1))
            pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
            touched += p
            j += 1
          }
          // membership maintenance: sets must stay exact or a later
          // merge would miss occurrences and corrupt counts
          val oldSet = old.iterator.zip(old.iterator.drop(1)).toSet
          val newSet = nw.iterator.zip(nw.iterator.drop(1)).toSet
          (oldSet -- newSet).foreach { p =>
            pairWords.get(p).foreach { s => s -= wi; if (s.isEmpty) pairWords.remove(p) }
          }
          (newSet -- oldSet).foreach { p =>
            pairWords.getOrElseUpdate(p, scala.collection.mutable.BitSet.empty) += wi
          }
          syms(wi) = nw
        }
        touched.foreach { p =>
          val n = pairCounts.getOrElse(p, 0L)
          if (n <= 0 || !pairWords.contains(p)) pairCounts.remove(p)
          else heap.enqueue((n, p._1, p._2))
        }
        round += 1
      }
    }
    merges.result()
  }

  /** The textbook full-recount loop — O(rounds × total symbol
    * positions), kept as the EQUIVALENCE REFERENCE the incremental
    * trainer is pinned against in BpeSpec (and the shape a reader
    * should check the semantics from). */
  private[graft] def trainFromWordCountsNaive(words: Seq[(String, Long)],
                                              nMerges: Int): Seq[Merge] = {
    require(nMerges >= 0, s"negative nMerges: $nMerges")
    var syms: Array[(Array[String], Long)] =
      words.map { case (w, n) => (w.map(_.toString).toArray, n) }.toArray
    val merges = Seq.newBuilder[Merge]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[Merge, Long]
      syms.foreach { case (ss, n) =>
        var j = 0
        while (j < ss.length - 1) {
          val p = (ss(j), ss(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        syms = syms.map { case (ss, n) => (mergeOnce(ss, best), n) }
        round += 1
      }
    }
    merges.result()
  }

  /** Replace non-overlapping occurrences of `p` left to right. */
  private[operators] def mergeOnce(ss: Array[String], p: Merge): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < ss.length) {
      if (j < ss.length - 1 && ss(j) == p._1 && ss(j + 1) == p._2) {
        out += ss(j) + ss(j + 1); j += 2
      } else { out += ss(j); j += 1 }
    }
    out.toArray
  }

  /** Greedy encode of one word: repeatedly apply the LOWEST-rank
    * applicable merge until none applies — the standard BPE inference
    * rule, which reproduces training's segmentation for any word
    * whose pairs the training saw. */
  def encodeWord(word: String, ranks: Map[Merge, Int]): Seq[String] = {
    var ss: Array[String] = word.map(_.toString).toArray
    var continue = ss.length > 1
    while (continue) {
      var best: Merge = null
      var bestRank = Int.MaxValue
      var j = 0
      while (j < ss.length - 1) {
        val r = ranks.getOrElse((ss(j), ss(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (ss(j), ss(j + 1)) }
        j += 1
      }
      if (best == null) continue = false
      else ss = mergeOnce(ss, best)
      if (ss.length < 2) continue = false
    }
    ss.toSeq
  }

  /** text → array<string> of BPE tokens (all words, in order) — the
    * corpus-sweep column form; ranks ride the closure. */
  def encode(text: Column, merges: Seq[Merge]): Column =
    column(BpeEncodeExpr(expression(coalesce(text, lit(""))), merges))

  /** Serialize a trained merge list for the SQL surface
    * (`graft_bpe_encode(text, '<spec>')`): the symbols of all merges
    * flattened in rank order, space-separated — "l1 r1 l2 r2 …".
    * WHITESPACE is the one character class guaranteed absent from
    * symbols (they come from whitespace-split words — but they can
    * contain commas, pipes, any punctuation, so any other delimiter
    * would be silently ambiguous: 'ab,x' + ',' delimiters re-parsed
    * as a DIFFERENT tokenizer). "Whitespace" here means exactly the
    * Java-regex `\s` class the training word-split and
    * [[parseMergesSpec]]'s split use — NOT `Character.isWhitespace`:
    * a Unicode space like U+2028 is not `\s`, so training can
    * legitimately produce symbols containing it, and the spec
    * round-trips them intact (the `\s+` re-split never cuts them).
    * Round-trips through [[parseMergesSpec]], which rejects
    * odd-length specs loudly. */
  def mergesSpec(merges: Seq[Merge]): String = {
    // the same class Java regex \s matches (and split("\\s+") cuts on)
    def regexSpace(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    merges.foreach { case (l, r) =>
      require(!l.exists(regexSpace) && !r.exists(regexSpace),
        s"merge symbols must be free of regex-\\s whitespace: ('$l', '$r')")
    }
    merges.flatMap { case (l, r) => Seq(l, r) }.mkString(" ")
  }

  def parseMergesSpec(spec: String): Seq[Merge] = {
    val syms = spec.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    require(syms.length % 2 == 0,
      s"merge spec must hold left/right pairs, got ${syms.length} symbols")
    syms.grouped(2).map { case Seq(l, r) => (l, r) }.toSeq
  }
}
