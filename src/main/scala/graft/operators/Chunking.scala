package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the retrieval/context-prep move
  * that turns each document into fixed-budget pieces a retriever or a
  * context window can hold: windows of `window` tokens starting every
  * `stride` tokens, so consecutive chunks share `window - stride`
  * tokens of overlap (boundary sentences land whole in at least one
  * chunk).
  *
  * Chunk-start contract (re-derivable, so another engine can oracle
  * every row): starts are the multiples of `stride` in
  * `[0, max(n - (window - stride), 1))` for an n-token document.
  * That emits start 0 always, and drops exactly the tail starts whose
  * chunk would be a pure suffix of the previous chunk (start ≥
  * n - overlap ⇒ every remaining token was already in the prior
  * window) — no degenerate duplicate tails, full coverage: the last
  * emitted chunk always reaches token n. Documents that are empty or
  * whitespace-only yield zero chunks.
  *
  * Scale posture: a pure per-row projection + explode — ZERO shuffle;
  * the output blowup is bounded by n/stride chunks per doc with each
  * token appearing in at most ⌈window/stride⌉ chunks, so 100 TB in is
  * ≤ ⌈w/s⌉ × 100 TB out, streamed partition-local. Tokenization is
  * the same whitespace split as [[graft.functions.TextFunctions]]
  * token counting — swap `tokenSep` for a BPE-ish regex when chunk
  * budgets must match a real tokenizer. */
object Chunking {

  /** One row per (doc, chunk): (idCol, chunk_id, start_tok, n_tokens,
    * chunk) — `chunk_id = start/stride` dense from 0, `start_tok` the
    * 0-based first-token index, `chunk` the tokens re-joined with a
    * single space (runs of whitespace do not round-trip; budget
    * arithmetic, not byte fidelity, is the contract). */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int,
                    tokenSep: String = "\\s+"): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window]: stride=$stride window=$window")
    val overlap = window - stride
    // Split first, then drop empty tokens — NOT `trim` + split: Spark's
    // `trim` strips only ASCII space, so a tab/newline-padded doc would
    // keep a phantom empty leading token (and a "  \t " doc would emit
    // a chunk). Filtering empties handles every whitespace flavor and
    // makes whitespace-only docs yield n = 0 ⇒ zero chunks, as the
    // contract above promises.
    val toks = filter(split(col(textCol), tokenSep), t => length(t) > 0)
    val n = coalesce(size(toks), lit(0))
    df.select(col(idCol), toks.as("_ts"), n.as("_n"))
      .filter(col("_n") > 0)
      // inclusive sequence stop = the largest valid start's upper bound
      .select(col(idCol), col("_ts"), col("_n"),
        explode(sequence(lit(0),
          greatest(col("_n") - lit(overlap) - 1, lit(0)),
          lit(stride))).as("_start"))
      .select(col(idCol),
        (col("_start") / lit(stride)).cast("long").as("chunk_id"),
        col("_start").cast("long").as("start_tok"),
        least(lit(window), col("_n") - col("_start")).cast("long").as("n_tokens"),
        array_join(slice(col("_ts"), col("_start") + 1, lit(window)), " ")
          .as("chunk"))
  }

  /** STRUCTURE-AWARE chunking: paragraphs (blank-line-separated) are
    * the atomic unit — a paragraph never splits across chunks — and
    * consecutive paragraphs pack into a chunk while the RUNNING token
    * count stays under `budget`. The boundary rule is pure arithmetic
    * (re-derivable, so another engine can oracle every row):
    * `chunk_id = ⌊tokens_before_this_paragraph / budget⌋` over the
    * doc's (whitespace-cleaned) paragraph sequence. A chunk closes
    * only when the running total CROSSES a budget multiple, so a
    * chunk's token count can overshoot `budget` by up to its final
    * paragraph's tokens minus one (e.g. paragraphs of 4+5 at budget 8
    * make one 9-token chunk — pinned in ChunkingSpec); a single
    * paragraph larger than the whole budget forms its own chunk, kept
    * whole (truncating mid-paragraph is [[chunkByTokens]]'s job).
    * Empty / whitespace-only paragraphs vanish; paragraph text
    * normalizes to single-space tokens re-joined (same
    * budget-not-bytes contract as [[chunkByTokens]]).
    *
    * Scale posture: one narrow explode + ONE keyed window pass
    * (partitioned by doc — parallel across docs, never a global
    * window) + one keyed agg. The re-join uses `sort_array` over
    * (position, text) structs, not raw `collect_list` order, so the
    * output is deterministic under any shuffle. */
  def chunkByParagraphs(df: DataFrame, idCol: String, textCol: String,
                        budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(col("_para"), "\\s+"), t => length(t) > 0)
    val w = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    df.select(col(idCol),
        posexplode_outer(split(col(textCol), "\n{2,}")).as(Seq("_pos", "_para")))
      .withColumn("_ts", toks)
      .withColumn("_n", coalesce(size(col("_ts")), lit(0)))
      .filter(col("_n") > 0)
      .withColumn("_before", coalesce(
        sum(col("_n")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("chunk_id", floor(col("_before") / budget))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        count(lit(1)).as("n_paras"),
        sum(col("_n")).as("n_tokens"),
        array_join(
          transform(
            sort_array(collect_list(struct(col("_pos"), array_join(col("_ts"), " ").as("_p")))),
            x => x.getField("_p")),
          "\n\n").as("chunk"))
  }
}
