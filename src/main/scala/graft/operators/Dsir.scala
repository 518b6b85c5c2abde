package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Data Selection via Importance Resampling (DSIR) — pick the subset
  * of a huge raw corpus that looks most like a small high-quality
  * TARGET corpus (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling"; the same bag-of-ngrams importance-weight
  * idea underlies GPT-3's and PaLM's quality classifiers). Per
  * document, the importance weight is the log-likelihood ratio of its
  * tokens under two bag-of-words models, log p_target(x) − log p_raw(x);
  * selection is either deterministic top-k by weight or Gumbel-top-k
  * resampling (one Gumbel draw per doc added to its weight — the
  * classic exponential-race trick that turns weighted sampling WITHOUT
  * replacement into a single distributed top-k).
  *
  * Feature space: the paper hashes n-grams into buckets to bound the
  * model; here the bound comes from a top-K TARGET vocabulary plus one
  * out-of-vocabulary bucket — same boundedness (the model is K+1 rows,
  * broadcast-class), but exactly reproducible by any engine (no
  * hash-function coupling), which is what lets a SQL oracle gate the
  * whole pipeline. `featN` picks the n-gram order: 1 = unigram tokens,
  * 2 = the paper's word bigrams (WITH repeats — multiplicity is part
  * of the bag-of-ngrams likelihood).
  *
  * Execution shape at 100 TB:
  *  - [[fit]]: two explode+groupBy passes (target is small; raw's pass
  *    is one partial-aggregated shuffle of (token, count) — vocab-sized
  *    after the map-side combine). The K+1 bucket rows collect to the
  *    driver (bounded, the centroids/codebooks class) and the corpus
  *    totals derive from them — no dedicated counting pass.
  *  - [[score]]: explode the raw corpus once, ONE broadcast join
  *    against the (K+1)-row model, one keyed sum back to doc grain.
  *    Nothing wider than (doc_id, long) shuffles.
  *  - [[selectTopK]] / [[gumbelTopK]]: a global sort+limit fuses to
  *    TakeOrderedAndProject — no full sort materializes.
  *
  * Determinism (the oracle-gate discipline, [[CharLm]]'s micro-grid):
  * each token's log-ratio is snapped to an integer micro grid
  * (round(lr·10⁶) as long) BEFORE the per-doc sum, so document weights
  * are exact integer sums — immune to float addition order. The Gumbel
  * draw uses a Knuth multiplicative hash of (doc id, seed) — plain
  * integer arithmetic any engine reproduces — and is itself
  * micro-snapped before the addition.
  */
object Dsir {

  /** The out-of-vocabulary bucket's token key. The \\u0001 prefix cannot appear in
    * whitespace-normalized text, so it never collides with a real
    * token (SQL side: chr(1) || 'oov'). */
  val Oov = "\u0001oov"

  /** The matching token rule shared with the dedup family. */
  private def toks(text: Column): Column =
    split(T.normalizeForDedup(text), " ")

  /** The feature stream: unigrams (featN=1) or word n-grams WITH
    * repeats (featN≥2 — the paper's hashed-ngram features use
    * multiplicity, so no distinct here, unlike [[Dedup.shingles]]).
    * Documents shorter than featN contribute their full token run as
    * one under-length feature, the shingle family's convention.
    * Native one-pass expression: the Column-chain form
    * (transform(sequence, slice) over the token array) re-evaluates
    * the split per window under Catalyst's project-collapse —
    * measured 12× on ds4 before this. */
  private def feats(text: Column, featN: Int): Column = {
    if (featN == 1) toks(text)
    else {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.column(graft.plans.ShinglesExpr(
        ColumnBridge.expression(T.normalizeForDedup(text)), featN,
        distinct = false))
    }
  }

  /** Top-K target features by (count desc, feature asc) — the bounded
    * feature space. Deterministic: the tie-break is total. */
  def vocab(target: DataFrame, textCol: String, k: Int,
            featN: Int = 1): DataFrame =
    target.select(explode(feats(col(textCol), featN)).as("tok"))
      // a corpus token BYTE-EQUAL to the sentinel (binary-garbage
      // crawl text) must not enter the vocab — it would duplicate the
      // OOV key and fan out every downstream model join
      .filter(col("tok") =!= Oov)
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc)
      .limit(k)
      .select("tok")

  /** Per-bucket token counts of `df` under vocabulary `v`: one row per
    * vocab token (absent → 0) plus the OOV bucket. */
  private def bucketCounts(df: DataFrame, textCol: String,
                           v: DataFrame, featN: Int): DataFrame = {
    val counted = df.select(explode(feats(col(textCol), featN)).as("tok0"))
      .join(broadcast(v), col("tok0") === col("tok"), "left")
      .select(coalesce(col("tok"), lit(Oov)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    v.select(col("tok"))
      .union(v.sparkSession.range(1).select(lit(Oov).as("tok")))
      .join(counted, Seq("tok"), "left")
      .select(col("tok"), coalesce(col("c"), lit(0L)).as("c"))
  }

  /** A fitted importance-weight model: the K+1 (feature, lr_micro)
    * rows PLUS the feature order they were built with. featN rides the
    * model, not [[score]]'s parameter list — a fit/score n-gram
    * mismatch would silently map every token to the OOV bucket
    * (uniformly wrong ranking, no error), so the API makes it
    * unrepresentable. Bounded driver state, the centroids/codebooks
    * class. */
  final case class Model(feats: Seq[(String, Long)], featN: Int) {
    private[Dsir] def df(spark: org.apache.spark.sql.SparkSession): DataFrame =
      spark.createDataFrame(feats).toDF("tok", "lr_micro")
    private[Dsir] def oovLr: Long =
      feats.find(_._1 == Oov).map(_._2).getOrElse(0L)
  }

  /** Fit the importance-weight model: (feature, lr_micro) over the
    * top-K target vocabulary plus OOV, where
    * lr = ln p̂_target(f) − ln p̂_raw(f) with add-one smoothing over
    * the K+1 buckets, snapped to the integer micro grid.
    *
    * The model MATERIALIZES here — K+1 rows of bounded driver state.
    * Collecting is load-bearing, not convenience: [[score]] consumes
    * the model twice (the OOV scalar + the broadcast join), and a lazy
    * plan would re-execute both full-corpus bucket passes per use.
    * The corpus feature totals also fall out of the collected buckets
    * (Σc over vocab+OOV = every feature, bucketed), saving the two
    * dedicated corpus passes they previously cost. */
  def fit(target: DataFrame, raw: DataFrame, textCol: String,
          k: Int, featN: Int = 1): Model = {
    val v = vocab(target, textCol, k, featN)
    val ct = bucketCounts(target, textCol, v, featN).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val cr = bucketCounts(raw, textCol, v, featN).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nt = ct.map(_._2).sum
    val nr = cr.values.sum
    // smoothing denominator = the ACTUAL bucket count (vocab rows +
    // OOV), not the requested k+1: a target with fewer than k distinct
    // features would otherwise overstate the bucket count and the
    // smoothed probabilities would no longer sum to 1 over real
    // buckets. Equal to k+1 whenever the vocabulary fills.
    val buckets = ct.length
    // HALF_UP on the micro grid — the same rounding Spark's round()
    // expression and DuckDB's round() apply, so the collected model is
    // bit-equal to the previous expression-built one
    def micro(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    Model(ct.toSeq.map { case (tok, c) =>
      (tok, micro((math.log(c + 1.0) - math.log((nt + buckets).toDouble)
        - math.log(cr(tok) + 1.0) + math.log((nr + buckets).toDouble))
        * 1e6))
    }, featN)
  }

  /** Per-document importance weight under a [[fit]]ed model:
    * (idCol, n_tokens, logw_micro), logw = Σ_feats lr(bucket(feat))
    * — exact integer addition on the micro grid. The feature order
    * comes from the model itself. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val m = model.df(docs.sparkSession)
    docs.select(col(idCol),
        explode(feats(col(textCol), model.featN)).as("tok0"))
      .join(broadcast(m), col("tok0") === col("tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("lr_micro"), lit(model.oovLr))).as("logw_micro"))
  }

  /** Deterministic selection: the n highest-weight documents
    * (ties broken by id — the ordering is total, so the selected SET
    * is reproducible). Sort+limit fuses to TakeOrderedAndProject. */
  def selectTopK(scored: DataFrame, idCol: String, n: Int): DataFrame =
    scored.orderBy(col("logw_micro").desc, col(idCol).asc).limit(n)

  /** Gumbel noise for (id, seed) on the micro grid: u ∈ (0,1) from a
    * three-round integer hash (affine → quadratic → affine, pure
    * integer arithmetic — exactly reproducible in any engine),
    * g = −ln(−ln u). The quadratic round h → h² + h (mod M) breaks the
    * affine lattice a single Knuth step leaves (consecutive ids would
    * otherwise receive constant-increment uniforms mod 1); the result
    * is deterministic pseudo-noise adequate for reproducible
    * resampling, NOT i.i.d. randomness. Every intermediate is
    * ANSI-overflow-safe: (M−1)² + (M−1) ≈ 4.6e18 and
    * (M−1)·2654435761 + seed' ≈ 5.7e18, both < 2⁶³. */
  private val M = 2147483647L // 2^31 − 1
  def gumbelMicro(id: Column, seed: Long): Column = {
    // seed folded into [0, M) on the driver, so the executor-side sums
    // stay < 2⁶³ for EVERY caller seed — the raw seed would overflow
    // ANSI arithmetic above ~3.5e18
    val seedM = ((seed % M) + M) % M
    val h1 = pmod(pmod(id.cast("long"), lit(M)) * lit(2654435761L)
      + lit(seedM), lit(M))
    val h2 = pmod(h1 * h1 + h1, lit(M))
    val h3 = pmod(h2 * lit(2246822519L) + lit(seedM), lit(M))
    val u = (h3 + 1.0) / (M + 2.0) // strictly inside (0,1)
    round(-log(-log(u)) * 1e6).cast("long")
  }

  /** Gumbel-top-k importance RESAMPLING: rank by
    * logw_micro + gumbel_micro and keep the top n — distributionally,
    * weighted sampling without replacement ∝ exp(logw) (Gumbel-max),
    * in one distributed top-k pass. Same (id, seed) → same sample. */
  def gumbelTopK(scored: DataFrame, idCol: String, n: Int,
                 seed: Long): DataFrame =
    scored
      .withColumn("key_micro",
        col("logw_micro") + gumbelMicro(col(idCol), seed))
      .orderBy(col("key_micro").desc, col(idCol).asc)
      .limit(n)
}
