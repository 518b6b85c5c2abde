package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level duplicate n-gram SPAN dedup — the token-window analog
  * of suffix-array substring dedup ("Deduplicating Training Data Makes
  * Language Models Better"-style): any n-token window whose hash
  * appears in ≥ `minDocs` distinct documents is a duplicated span, and
  * every token it covers is boilerplate shared across the corpus
  * (licence headers, navigation chrome, templated paragraphs) that
  * document-level near-dup (MinHash on whole docs) cannot see.
  *
  * Distributed shape, in order:
  *   1. tokenize + posexplode to (doc, pos, token) rows — ONE split
  *      per doc, explode factor = tokens/doc;
  *   2. window hashes via ONE per-doc window pass — n-1 `lead`s feed a
  *      single xxhash64. The obvious map-side alternative (a `transform`
  *      HOF over `sequence` with `slice` per window) measures 4× slower
  *      end-to-end at sf0.1: CollapseProject inlines the tokenize
  *      expression into the lambda so every window RE-SPLITS the doc
  *      (the minhashSignature lesson, Dedup.scala), and the nested-HOF
  *      codegen costs seconds of JIT. The window pass pays one keyed
  *      token shuffle instead — linear, and the same (doc, pos, token)
  *      relation then feeds the span-removal reassembly for free;
  *   3. duplicated-hash set — ONE partial-aggregated groupBy over
  *      (hash → distinct-doc count); only 8-byte hashes shuffle, never
  *      text;
  *   4. windows ⋈ dup-hashes equi-join on the hash — keys-only right
  *      side; AQE broadcasts it when the dup set is small (the common
  *      case: dup windows are a thin tail of all windows);
  *   5. covered-position roll-up / span removal — keyed by doc id.
  * No all-pairs comparison exists anywhere; every stage is a keyed
  * shuffle that partitions cleanly at any corpus size. A suffix array
  * would find duplicates at every length ≥ n in one pass but needs a
  * global sort of the whole corpus text; fixed-n windows trade that
  * for embarrassing parallelism (the published pipelines run exactly
  * this shape at web scale, n ≈ 50 BPE tokens).
  */
object SpanDedup {

  /** Whitespace tokens (the corpus convention used by the dedup
    * family — TextFunctions.tokens' split). */
  private def toks(text: Column): Column = split(trim(text), "\\s+")

  /** (id, _tp, _tok): one row per token — the shared relation behind
    * both the window hashes and the span-removal reassembly. */
  private def tokenRows(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs.select(col(idCol), posexplode(toks(col(textCol))).as(Seq("_tp", "_tok")))

  /** (id, _pos, _wh): one row per FULL n-token window occurrence,
    * hashed in one per-doc window pass. Windows shorter than n (the
    * last n-1 positions, or every position of a short doc) are dropped
    * by the `lead(n-1)` null test — `concat_ws` skips nulls, so
    * without it the doc tail would hash as shorter grams. */
  private def windows(tokens: DataFrame, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy("_tp")
    val parts = col("_tok") +: (1 until n).map(i => lead(col("_tok"), i).over(w))
    tokens.select(col(idCol), col("_tp").as("_pos"),
        xxhash64(concat_ws(" ", parts: _*)).as("_wh"),
        lead(col("_tok"), n - 1).over(w).isNotNull.as("_full"))
      .filter(col("_full")).drop("_full")
  }

  /** Hashes of windows occurring in ≥ minDocs DISTINCT docs — the
    * corpus-duplicated span keys (keys only, one agg pass). */
  def duplicatedWindowHashes(docs: DataFrame, idCol: String, textCol: String,
                             n: Int, minDocs: Int = 2): DataFrame =
    windows(tokenRows(docs, idCol, textCol), idCol, n)
      .groupBy(col("_wh")).agg(countDistinct(col(idCol)).as("_nd"))
      .filter(col("_nd") >= minDocs).select(col("_wh"))

  /** Per-doc duplicated-window occurrences (id, _pos) from an already
    * materialized window set — one tokenize pass feeds both the dup-set
    * aggregate and the join-back. */
  private def dupWindows(wins: DataFrame, idCol: String, minDocs: Int): DataFrame = {
    val dupHashes = wins
      .groupBy(col("_wh")).agg(countDistinct(col(idCol)).as("_nd"))
      .filter(col("_nd") >= minDocs).select(col("_wh"))
    wins.join(dupHashes, Seq("_wh")).select(col(idCol), col("_pos"))
  }

  /** Distinct (id, _tp) token positions covered by ≥1 duplicated
    * window — a window at _pos covers tokens [_pos, _pos+n-1]. */
  private def coveredPositions(dupWins: DataFrame, idCol: String,
                               n: Int): DataFrame =
    dupWins.select(col(idCol),
        explode(sequence(col("_pos"), col("_pos") + lit(n - 1))).as("_tp"))
      .distinct()

  /** Per-doc span-dedup report: token count, duplicated-window
    * occurrence count, tokens covered by duplicated windows, and the
    * text with those spans removed (tokens re-joined in order; empty
    * string when everything was boilerplate). Row per input doc. */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String,
                n: Int, minDocs: Int = 2): DataFrame = {
    val tk = tokenRows(docs, idCol, textCol)
    val dw = dupWindows(windows(tk, idCol, n), idCol, minDocs)
    val covered = coveredPositions(dw, idCol, n)

    val dupWinCount = dw.groupBy(col(idCol)).agg(count(lit(1)).as("n_dup_windows"))
    val coveredCount = covered.groupBy(col(idCol)).agg(count(lit(1)).as("n_dup_tokens"))

    // Surviving tokens, order-preserving: the SAME token relation
    // anti-joined against the covered set, re-assembled by sorted
    // (pos, token) structs — deterministic regardless of partitioning.
    val cleaned = tk
      .join(covered, Seq(idCol, "_tp"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("_tp"), col("_tok")))),
          s => s.getField("_tok"))).as("text"))

    docs.select(col(idCol), size(toks(col(textCol))).cast("long").as("n_tokens"))
      .join(dupWinCount, Seq(idCol), "left")
      .join(coveredCount, Seq(idCol), "left")
      .join(cleaned, Seq(idCol), "left")
      .select(col(idCol),
        col("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        coalesce(col("text"), lit("")).as("text"))
  }

  /** Corpus-level stats in one row — the bench/monitoring surface.
    * Computed directly from the window/covered sets, NOT by aggregating
    * [[spanDedup]]: the stats never read the cleaned text, so paying
    * for its reassembly (anti-join + per-doc sorted collect) would
    * roughly double the scan for nothing. The totals-equivalence is
    * pinned in SpanDedupSpec. */
  def spanDedupStats(docs: DataFrame, idCol: String, textCol: String,
                     n: Int, minDocs: Int = 2): DataFrame = {
    val dw = dupWindows(windows(tokenRows(docs, idCol, textCol), idCol, n),
      idCol, minDocs)
    docs.select(toks(col(textCol)).as("_toks"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("_toks"))).cast("long").as("n_tokens"))
      .crossJoin(dw.agg(count(lit(1)).as("n_dup_windows")))
      .crossJoin(coveredPositions(dw, idCol, n)
        .agg(count(lit(1)).as("n_dup_tokens")))
  }
}
