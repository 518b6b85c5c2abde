package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics for tokenizer work: term heavy
  * hitters, vocabulary coverage / OOV rate, and the pair counts that
  * drive a BPE merge step. These are the corpus-level scans a
  * tokenizer-training or vocab-audit pipeline runs before anything is
  * tokenized for real.
  *
  * Scale posture: every operator is explode → partial-agged groupBy →
  * `TakeOrderedAndProject` — terms shuffle once as (term, partial
  * count) pairs, the corpus text never shuffles, and no global sort
  * materializes. [[oovRate]] joins the (small, top-k) vocabulary in by
  * broadcast and reduces to ONE row. Term cardinality is vocabulary-
  * sized (≤ millions), far under the doc count — the term shuffle is
  * the cheap one.
  */
object Vocab {

  /** Case-folded whitespace tokens — the corpus convention
    * ([[graft.functions.TextFunctions.tokens]]) plus `lower`, matching
    * [[Retrieval]]'s term space. */
  private def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  private def exploded(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol), explode(toks(col(textCol))).as("term"))

  /** Top-k terms by document frequency: (term, df = docs containing,
    * cf = total occurrences), df desc then term asc. The df count
    * dedups (doc, term) pairs before counting — two partial-agged
    * passes over the exploded terms, no full sort. */
  def termStats(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    val ex = exploded(docs, idCol, textCol)
    val cf = ex.groupBy(col("term")).agg(count(lit(1)).as("cf"))
    val df_ = ex.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
    df_.join(cf, Seq("term"))
      .orderBy(desc("df"), col("term")).limit(k)
  }

  /** Corpus-frequency top-k vocabulary: (term, cf), the induced vocab
    * [[oovRate]] audits against. */
  def topVocab(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame =
    exploded(docs, idCol, textCol)
      .groupBy(col("term")).agg(count(lit(1)).as("cf"))
      .orderBy(desc("cf"), col("term")).limit(k)

  /** One-row coverage audit of `vocab` (any frame with a `term`
    * column, small by contract — it broadcasts): total token
    * occurrences, occurrences outside the vocab, and the OOV rate.
    * One corpus scan, one broadcast join, one global agg. */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocab: DataFrame): DataFrame =
    exploded(docs, idCol, textCol)
      .join(broadcast(vocab.select(col("term"), lit(1).as("_inv"))),
        Seq("term"), "left_outer")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))

  /** Top-k adjacent-character pairs across all token occurrences —
    * the count table one BPE merge iteration maximizes over. Pairs
    * are weighted by occurrence (a token seen 100× contributes its
    * pairs 100×); 1-char tokens contribute nothing. */
  def bpePairCounts(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame =
    exploded(docs, idCol, textCol)
      .filter(length(col("term")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("term")) - 1),
        i => col("term").substr(i, lit(2))))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("pair")).limit(k)
}
