package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic split / shuffle / weighted-sample operators — the
  * ordering side of training-data prep ([[Mixing]] is the rate side):
  * carving a corpus into train/val/test, shuffling it into shards for
  * an epoch, and drawing a weighted sample without replacement.
  *
  * All three decide per row from an ARITHMETIC hash of the row's own
  * id (Knuth's multiplicative scheme: fold the id to 31 bits, multiply
  * by 2654435761 = ⌊2^32/φ⌋, take mod 2^32) — not from RNG state and
  * not from Spark's partition-dependent `rand()`. That buys, at
  * 100 TB: reproducibility across runs/retries/executor counts,
  * incremental consistency (a re-ingested id lands in the same split),
  * and auditability (the keep/place decision is re-derivable from the
  * row alone, in ANY engine — plain 64-bit integer arithmetic, so a
  * SQL warehouse can re-check a Spark-made split exactly). Ids 2^31
  * apart collide (same decisions, ordering then tie-breaks on the full
  * id); acceptable for sampling, unlike for dedup.
  *
  * Scale posture per operator:
  *  - [[assignSplits]]: pure per-row projection — ZERO shuffle; the
  *    split boundaries are exact integer cutoffs, so engines never
  *    disagree on a boundary row.
  *  - [[epochShuffle]]: ONE hash-partition exchange on the shard key +
  *    a within-shard sort — no global sort ever. Size `nShards` so a
  *    shard fits an executor (the within-shard position is a
  *    single-partition window per shard); 100 TB at 10k shards is
  *    ~10 GB a shard.
  *  - [[weightedTopK]] (Efraimidis–Spirakis A-Res): the sample IS the
  *    top-k by key u^(1/w) — `TakeOrderedAndProject`, no global sort,
  *    driver holds k rows.
  */
object Sampling {

  private val Fold: Long = 1L << 31
  private val Mod: Long  = 1L << 32
  private val Knuth: Long = 2654435761L

  /** The shared hash: exact in 64-bit arithmetic for every long id
    * (the 31-bit fold keeps the product under 2^63, so ANSI-mode Spark
    * never overflows), uniform-ish over [0, 2^32). The seed is folded
    * in BEFORE the multiply — added after, nearby seeds (epoch 1 vs 2)
    * would shift every hash by a constant and barely move anything;
    * inside, the multiplier decorrelates them. */
  private[operators] def idHash(id: Column, seed: Long): Column = {
    val s = ((seed % Fold) + Fold) % Fold
    pmod(pmod(pmod(id, lit(Fold)) + lit(s), lit(Fold)) * lit(Knuth), lit(Mod))
  }

  /** Deterministic split assignment: adds `splitCol` with the first
    * name whose cumulative-fraction cutoff exceeds the id's hash. The
    * last split absorbs any fraction rounding (cutoffs are exact
    * integers `⌊Σf · 2^32⌋`), so every row gets exactly one split.
    * Fractions must be positive and sum to 1. */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Double)], seed: Long = 0L,
                   splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), s"bad splits $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val cutoffs = splits.scanLeft(0.0)(_ + _._2).tail
      .map(f => (f * Mod.toDouble).toLong)
    val h = idHash(col(idCol), seed)
    // last arm is the unconditional otherwise — absorbs rounding
    val assigned = splits.init.zip(cutoffs).foldRight(
      lit(splits.last._1): Column) { case (((name, _), cut), rest) =>
      when(h < cut, lit(name)).otherwise(rest)
    }
    df.withColumn(splitCol, assigned)
  }

  /** Exact integer cutoffs for `splits` — exposed so an oracle in
    * another engine can embed the SAME literals. */
  def splitCutoffs(splits: Seq[(String, Double)]): Seq[Long] =
    splits.scanLeft(0.0)(_ + _._2).tail.map(f => (f * Mod.toDouble).toLong)

  /** Epoch shuffle: a deterministic permutation of the corpus keyed by
    * (seed = the epoch number), materialized as shard assignment plus
    * a dense 1-based position within the shard. Reading shards in
    * order, each sorted by `pos`, replays the exact epoch order on any
    * cluster size; changing the epoch reshuffles everything. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Long,
                   nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val h = idHash(col(idCol), epoch)
    val shard = pmod(h, lit(nShards.toLong))
    df.withColumn("_h", h)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("_h"), col(idCol)))
        .cast("long"))
      .drop("_h")
  }

  /** Stratified deterministic sampling: keep each row with its
    * stratum's OWN fraction — the down/up-weighting move behind every
    * "90% web, tripled Wikipedia" style data recipe, and the honest
    * form of `DataFrameStatFunctions.sampleBy` (whose Bernoulli draw
    * is partition-order-dependent and unrepeatable across retries).
    *
    * The keep gate is `idHash(id) < ⌊f(stratum) · 2^32⌋` — the same
    * re-derivable integer arithmetic as [[assignSplits]], so: ZERO
    * shuffle (one CASE projection + filter, no join — the fractions
    * map is folded into the expression, strata counts are typically
    * 10s); reproducible across runs/retries/cluster sizes; NESTED —
    * because the gate is `h < cut`, a 10% sample is a strict subset of
    * the same seed's 20% sample (shrinking a stratum's rate never
    * picks different rows, it keeps a prefix); and composable with
    * [[assignSplits]] under a DIFFERENT seed (the multiplier
    * decorrelates the two gates, so sampling doesn't skew splits).
    *
    * Strata absent from `fractions` get `defaultFraction` (0 = drop —
    * the allowlist posture for 100 TB crawls where unknown sources
    * appear weekly; 1 = keep-all, the audit posture). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double], seed: Long = 0L,
                       defaultFraction: Double = 0.0): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      s"fractions must be in [0,1]: $fractions")
    require(defaultFraction >= 0 && defaultFraction <= 1,
      s"defaultFraction must be in [0,1]: $defaultFraction")
    val cut = fractions.toSeq.sortBy(_._1).foldRight(
      lit(fractionCutoff(defaultFraction)): Column) { case ((k, f), rest) =>
      when(col(stratumCol) === lit(k), lit(fractionCutoff(f))).otherwise(rest)
    }
    df.filter(idHash(col(idCol), seed) < cut)
  }

  /** Exact integer keep-cutoff for a fraction — exposed (like
    * [[splitCutoffs]]) so an oracle in another engine embeds the SAME
    * literal and agrees on every boundary row. */
  def fractionCutoff(f: Double): Long = (f * Mod.toDouble).toLong

  /** Weighted sampling WITHOUT replacement as one top-k pass
    * (Efraimidis–Spirakis A-Res): key(row) = u^(1/w) with
    * u = (hash+1)/2^32 ∈ (0,1], take the k largest keys. Inclusion
    * probability is proportional-ish to `weightCol` (exactly the
    * E-S reservoir distribution); weights clamp below at `minWeight`
    * so zero/negative weights never divide by zero. Returns the
    * original columns plus the sampling key (deterministic, so
    * re-runs return the identical sample). */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: String,
                   k: Int, seed: Long = 0L,
                   minWeight: Double = 1e-9): DataFrame = {
    val u = (idHash(col(idCol), seed) + 1).cast("double") / lit(Mod.toDouble)
    val w = greatest(col(weightCol).cast("double"), lit(minWeight))
    df.withColumn("samp_key", pow(u, lit(1.0) / w))
      .orderBy(desc("samp_key"), col(idCol)).limit(k)
  }
}
