package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *   1. tokenize + per-doc window hashes — pure column expressions
  *      (`transform`/`slice`/`xxhash64`), no shuffle, explode factor =
  *      tokens/doc;
  *   2. duplicated-hash set — ONE partial-aggregated groupBy over
  *      (hash → distinct-doc count); only 8-byte hashes shuffle, never
  *      text;
  *   3. windows ⋈ dup-hashes equi-join on the hash — keys-only right
  *      side; AQE broadcasts it when the dup set is small (the common
  *      case: dup windows are a thin tail of all windows);
  *   4. covered-position roll-up / span removal — keyed by doc id.
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

  /** Array of xxhash64 hashes of the n-token windows of `tokens`,
    * index i = window starting at token i; empty when the doc is
    * shorter than n tokens (guarded: `sequence(0, neg)` would count
    * DOWN, not return empty). */
  private[graft] def windowHashes(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(0), size(tokens) - n),
        i => xxhash64(concat_ws(" ", slice(tokens, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<bigint>"))

  /** (id, _pos, _wh): one row per n-token window occurrence. */
  private def windows(docs: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame =
    docs.select(col(idCol), windowHashes(toks(col(textCol)), n).as("_whs"))
      .select(col(idCol), posexplode(col("_whs")).as(Seq("_pos", "_wh")))

  /** Hashes of windows occurring in ≥ minDocs DISTINCT docs — the
    * corpus-duplicated span keys (keys only, one agg pass). */
  def duplicatedWindowHashes(docs: DataFrame, idCol: String, textCol: String,
                             n: Int, minDocs: Int = 2): DataFrame =
    windows(docs, idCol, textCol, n)
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
    val base = docs.select(col(idCol), toks(col(textCol)).as("_toks"))
    val dw = dupWindows(windows(docs, idCol, textCol, n), idCol, minDocs)
    val covered = coveredPositions(dw, idCol, n)

    val dupWinCount = dw.groupBy(col(idCol)).agg(count(lit(1)).as("n_dup_windows"))
    val coveredCount = covered.groupBy(col(idCol)).agg(count(lit(1)).as("n_dup_tokens"))

    // Surviving tokens, order-preserving: positions anti-joined against
    // the covered set, re-assembled by sorted (pos, token) structs —
    // deterministic regardless of partitioning.
    val cleaned = base
      .select(col(idCol), posexplode(col("_toks")).as(Seq("_tp", "_tok")))
      .join(covered, Seq(idCol, "_tp"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("_tp"), col("_tok")))),
          s => s.getField("_tok"))).as("text"))

    base.select(col(idCol), size(col("_toks")).cast("long").as("n_tokens"))
      .join(dupWinCount, Seq(idCol), "left")
      .join(coveredCount, Seq(idCol), "left")
      .join(cleaned, Seq(idCol), "left")
      .select(col(idCol),
        col("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        coalesce(col("text"), lit("")).as("text"))
  }

  /** Corpus-level stats in one row — the bench/monitoring surface. */
  def spanDedupStats(docs: DataFrame, idCol: String, textCol: String,
                     n: Int, minDocs: Int = 2): DataFrame =
    spanDedup(docs, idCol, textCol, n, minDocs)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_dup_windows")).as("n_dup_windows"),
        sum(col("n_dup_tokens")).as("n_dup_tokens"))
}
