package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** VARIABLE-LENGTH maximal-repeat detection over token streams — the
  * true suffix-array shape of "Deduplicating Training Data Makes
  * Language Models Better" (Lee et al. 2022, ExactSubstr), which
  * [[SpanDedup]]'s fixed-n windows only approximate. Fixed-n answers
  * ONE membership question ("is this token inside a cross-doc repeat
  * of length ≥ n?"); it cannot report the actual repeat LENGTH at a
  * position (two overlapping repeats of 6 and 7 tokens read exactly
  * like their fixed-5 window union), and its distinct-doc counting is
  * blind to WITHIN-document repetition (the "p q r … p q r" spam shape
  * self-repeats are made of). This operator reports, per position, the
  * exact length of the longest repeated substring starting there —
  * counting occurrences across the whole corpus INCLUDING the same
  * document — and derives maximal repeated spans and span-removed text
  * from it.
  *
  * Distributed shape — NO global sort, NO all-pairs, ever:
  *   1. a prefix-doubling LABEL ladder: r_h(i) identifies the token
  *      sequence `tokens[i, i+h)` (truncated at the doc end) for
  *      h = 1, 2, 4, …, 2^⌊log2 cap⌋. Each doubling is one per-doc
  *      `lead` window pass + one xxhash64 — labels are EQUALITY
  *      surrogates, not ranks, so the global sort a classic suffix
  *      array pays (Flick & Aluru's prefix doubling sorts every round)
  *      is replaced by hashing, at the same 64-bit collision odds the
  *      dedup family already rides ([[SpanDedup]], [[Dedup]]).
  *      Truncation is length-faithful: a suffix shorter than h labels
  *      its full content, the out-of-bounds continuation labels as a
  *      shared ε sentinel, so label equality at level 2h ⟺ the two
  *      truncated sequences are identical (never "equal by padding").
  *   2. an exact length sweep: the substring [i, i+ℓ) is identified by
  *      TWO ladder labels (r_h(i), r_h(i+ℓ−h)) with h = 2^⌊log2 ℓ⌋ —
  *      the classic two-overlapping-blocks trick — and every distinct
  *      (level, offset) lead the sweep needs rides the ladder's single
  *      window pass. The whole [minLen, cap] range then costs ONE
  *      explode (factor cap−minLen+1, 8-byte keys, no text) + ONE
  *      count-by-(ℓ, key) (map-side combinable) + ONE semi-join.
  *      rep_len(i) = max ℓ whose key occurs ≥ 2 times; cap is small by
  *      use-case (Lee et al. threshold ≈ 50 BPE tokens).
  *   3. coverage/spans: ∪ [i, i + rep_len(i)) for rep_len ≥ minLen is
  *      EXACTLY the set of tokens inside some length-≥minLen repeat —
  *      both inclusions are immediate, and the equality survives the
  *      cap (a repeat longer than cap is covered by its cap-length
  *      sub-repeats; only the REPORTED length saturates at cap).
  *      Maximal spans are gaps-and-islands runs over covered
  *      positions, keyed per doc.
  */
object MaximalRepeats {

  /** Whitespace tokens — the dedup-family convention
    * (TextFunctions.tokens' split). */
  private def toks(text: Column): Column = split(trim(text), "\\s+")

  /** (id, _len, _tp, _tok): one row per token, carrying the doc's
    * token count (the in-bounds tests below read it instead of paying
    * a lead per candidate length). */
  private def tokenRows(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs.select(col(idCol), size(toks(col(textCol))).as("_len"),
      posexplode(toks(col(textCol))).as(Seq("_tp", "_tok")))

  /** ε: the shared "empty continuation" label. Safe as a sentinel
    * because real labels are xxhash64 outputs seeded per level — a
    * collision with ε is the same 2^-64 event as any other. */
  private val Eps = -1L

  /** The label ladder: (id, _tp, _r1, _r2, _r4, …) where `_r$h` labels
    * the truncated sequence tokens[_tp, _tp+h). Levels double up to
    * the largest power of two ≤ cap. */
  private def ladder(tk: DataFrame, idCol: String,
                     cap: Int): (DataFrame, Seq[Int]) = {
    val w = Window.partitionBy(idCol).orderBy("_tp")
    var levels = List(1)
    var out = tk.withColumn("_r1", xxhash64(lit(1), col("_tok")))
      .drop("_tok")
    while (levels.head * 2 <= cap) {
      val h = levels.head
      val h2 = h * 2
      // label(2h) = hash(label_h(i), label_h(i+h) | ε): equality at 2h
      // ⟺ both truncated halves equal — length-faithful because a
      // <h-length suffix's label differs from every exactly-h label
      out = out.withColumn(s"_r$h2",
        xxhash64(lit(h2), col(s"_r$h"),
          coalesce(lead(col(s"_r$h"), h).over(w), lit(Eps))))
      levels = h2 :: levels
    }
    (out, levels.reverse)
  }

  /** Per-position exact maximal repeat length: (id, _tp, rep_len) for
    * every position whose longest repeated-substring prefix reaches
    * `minLen` (positions below the threshold are absent — the common
    * case; most of a healthy corpus repeats nothing). `rep_len` is
    * exact in [minLen, cap] and saturates at `cap`. Occurrences are
    * counted over ALL (doc, position) pairs — a substring repeated
    * twice within one document counts, exactly like a suffix array
    * and unlike [[SpanDedup]]'s distinct-doc windows. */
  def repeatLens(docs: DataFrame, idCol: String, textCol: String,
                 minLen: Int, cap: Int): DataFrame = {
    require(minLen >= 2, s"minLen=$minLen must be >= 2")
    require(cap >= minLen, s"cap=$cap < minLen=$minLen")
    val (lad0, levels) = ladder(tokenRows(docs, idCol, textCol), idCol, cap)
    // Every length's key is TWO ladder labels (r_h(i), r_h(i+l−h)),
    // h = 2^⌊log2 l⌋ — so the whole sweep needs only the distinct
    // (level, offset) leads, all computable in the ladder's ONE window
    // pass (same window spec). After that, per-length keys are pure
    // projections: the sweep costs one explode + one count-by-(l,key)
    // + one semi-join TOTAL, not a pass per length.
    val w = Window.partitionBy(idCol).orderBy("_tp")
    def floorLevel(l: Int): Int = levels.filter(_ <= l).max
    val leadCols: Seq[(Int, Int)] = (minLen to cap)
      .map(l => (floorLevel(l), l - floorLevel(l)))
      .filter(_._2 > 0).distinct
    val wide = leadCols.foldLeft(lad0) { case (df, (h, off)) =>
      df.withColumn(s"_r${h}_$off", lead(col(s"_r$h"), off).over(w))
    }.localCheckpoint() // the sweep's two consumers re-read it cheaply
    // (l, key) per in-bounds position: inBounds guarantees l tokens
    // remain, hence BOTH h-blocks are full — no ε can appear here, so
    // key equality ⟺ tokens[i, i+l) identical (two overlapping full
    // blocks cover [0, l) exactly)
    val lenKeys = (minLen to cap).map { l =>
      val h = floorLevel(l)
      val key =
        if (l == h) col(s"_r$h")
        else xxhash64(lit(l), col(s"_r$h"), col(s"_r${h}_${l - h}"))
      struct(lit(l).as("_l"), key.as("_k"),
        (col("_len") - col("_tp") >= l).as("_ok"))
    }
    val exploded = wide
      .select(col(idCol), col("_tp"), explode(array(lenKeys: _*)).as("e"))
      .filter(col("e._ok"))
      .select(col(idCol), col("_tp"),
        col("e._l").as("_l"), col("e._k").as("_k"))
    val dupKeys = exploded.groupBy(col("_l"), col("_k"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") >= 2)
      .select(col("_l"), col("_k"))
    exploded.join(dupKeys, Seq("_l", "_k"), "left_semi")
      .groupBy(col(idCol), col("_tp"))
      .agg(max(col("_l")).cast("long").as("rep_len"))
  }

  /** Maximal repeated SPANS per doc: gaps-and-islands runs over the
    * covered-token union ∪ [i, i+rep_len(i)). (id, span_start,
    * span_len), span_start 0-based. Two overlapping repeats merge into
    * one span (the removal unit ExactSubstr cuts); the per-repeat
    * lengths stay available from [[repeatLens]]. */
  def repeatSpans(docs: DataFrame, idCol: String, textCol: String,
                  minLen: Int, cap: Int): DataFrame = {
    val covered = coveredPositions(
      repeatLens(docs, idCol, textCol, minLen, cap), idCol)
    val w = Window.partitionBy(idCol).orderBy("_tp")
    covered
      .withColumn("_run", col("_tp") - row_number().over(w))
      .groupBy(col(idCol), col("_run"))
      .agg(min(col("_tp")).cast("long").as("span_start"),
        count(lit(1)).as("span_len"))
      .drop("_run")
  }

  /** Distinct (id, _tp) covered by ≥1 maximal repeat. */
  private def coveredPositions(lens: DataFrame, idCol: String): DataFrame =
    lens.select(col(idCol),
        explode(sequence(col("_tp"),
          col("_tp") + col("rep_len").cast("int") - 1)).as("_tp"))
      .distinct()

  /** Variable-length span dedup — [[SpanDedup.spanDedup]]'s report
    * shape (token count, covered-token count, covered-spans-removed
    * text) with suffix-array coverage: within-doc repeats count, and
    * the threshold is a true "any repeat of ≥ minLen tokens", not a
    * fixed window size. Row per input doc. */
  def spanDedupVar(docs: DataFrame, idCol: String, textCol: String,
                   minLen: Int, cap: Int): DataFrame = {
    val tk = tokenRows(docs, idCol, textCol)
    val covered = coveredPositions(
      repeatLens(docs, idCol, textCol, minLen, cap), idCol)
    val coveredCount = covered.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_tokens"))
    val cleaned = tk
      .join(covered, Seq(idCol, "_tp"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("_tp"), col("_tok")))),
          s => s.getField("_tok"))).as("text"))
    docs.select(col(idCol), size(toks(col(textCol))).cast("long").as("n_tokens"))
      .join(coveredCount, Seq(idCol), "left")
      .join(cleaned, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        coalesce(col("text"), lit("")).as("text"))
  }
}
