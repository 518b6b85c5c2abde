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
  * id (two multiply-mod rounds with xor-shift mixing between — see
  * [[idHash]]) — not from RNG state and not from Spark's
  * partition-dependent `rand()`. That buys, at
  * 100 TB: reproducibility across runs/retries/executor counts,
  * incremental consistency (a re-ingested id lands in the same split),
  * and auditability (the keep/place decision is re-derivable from the
  * row alone, in ANY engine — plain 64-bit integer arithmetic plus
  * xor/shift, so a SQL warehouse can re-check a Spark-made split
  * exactly; [[idHashSql]] emits the matching ANSI-ish SQL). Ids 2^31
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
  private val Knuth: Long  = 2654435761L // ⌊2^32/φ⌋, odd
  private val Prime2: Long = 2246822519L // xxhash32 PRIME2, odd

  /** splitmix64-style driver-side seed mixer, folded to 31 bits. Plain
    * Scala (wrapping Long arithmetic is fine on the driver); the result
    * is a literal constant in the column expression, so nearby seeds
    * (epoch 1 vs 2) enter the hash as unrelated 31-bit offsets. */
  private[operators] def mixSeed(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    z & 0x7FFFFFFFL
  }

  /** The shared hash, uniform-ish over [0, 2^32): fold the id to 31
    * bits, add the mixed seed (mod 2^31), then run a two-round
    * finalizer — multiply by an odd 32-bit constant mod 2^32, xor with
    * the 16-bit right shift, refold to 31 bits, multiply/xor again.
    * Every multiplicand stays under 2^31 and every constant under
    * 2^32, so each product is < 2^63 — exact in 64-bit arithmetic,
    * ANSI-mode safe, and re-derivable in any engine with integer
    * `%`/`*`/xor/`>>` ([[idHashSql]] emits the DuckDB/ANSI form).
    *
    * The xor-shifts between the multiplies make the hash NON-LINEAR in
    * its input, so two seeds never differ by a constant offset — a
    * gate under seed A (`h_A < cut`) is statistically independent of a
    * gate under seed B. (A single multiply-mod is affine in the seed:
    * h(id,s2) = h(id,s1) + (s2−s1)·K mod 2^32, which made every
    * cross-seed sample-then-split combination perfectly correlated.
    * SamplingSpec pins the fix with a quantitative bound across seed
    * pairs.) Same seed ⇒ same h, so `h < cut` gates stay NESTED in the
    * cutoff. */
  def idHash(id: Column, seed: Long): Column = {
    val s = mixSeed(seed)
    val x0 = pmod(pmod(id, lit(Fold)) + lit(s), lit(Fold))
    val h1 = pmod(x0 * lit(Knuth), lit(Mod))
    val x1 = pmod(h1.bitwiseXOR(shiftright(h1, 16)), lit(Fold))
    val h2 = pmod(x1 * lit(Prime2), lit(Mod))
    h2.bitwiseXOR(shiftright(h2, 16))
  }

  /** The SAME hash as a SQL expression string (DuckDB-compatible:
    * `xor(a,b)`, `>>`, integer `%` on non-negative operands), so an
    * oracle in another engine embeds the identical formula and agrees
    * on every row. `idExpr` must be non-negative (SQL `%` keeps the
    * dividend's sign, unlike Spark's `pmod`). */
  def idHashSql(idExpr: String, seed: Long): String = {
    val s = mixSeed(seed)
    val x0 = s"(($idExpr % 2147483648 + $s) % 2147483648)"
    val h1 = s"(($x0 * 2654435761) % 4294967296)"
    val x1 = s"((xor($h1, $h1 >> 16)) % 2147483648)"
    val h2 = s"(($x1 * 2246822519) % 4294967296)"
    s"xor($h2, $h2 >> 16)"
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
    * [[assignSplits]] under a DIFFERENT seed (the xor-shift finalizer
    * in [[idHash]] makes gates under distinct seeds statistically
    * independent, so sampling doesn't skew splits — spec-pinned with
    * a quantitative bound in SamplingSpec).
    *
    * Strata absent from `fractions` get `defaultFraction` (0 = drop —
    * the allowlist posture for 100 TB crawls where unknown sources
    * appear weekly; 1 = keep-all, the audit posture). A NULL stratum
    * is deliberately indistinguishable from an unlisted one: every
    * `=== k` arm evaluates NULL, so the row falls to the same
    * `defaultFraction` gate (NULL can't be a `fractions` key, and an
    * unlabeled row should get the unknown-source policy, not a
    * silent third behavior). */
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

  /** EXACT-size stratified sampling: the k smallest [[idHash]] values
    * per stratum — the "exactly k docs per language" recipe, where
    * [[stratifiedSample]]'s rate gate gives only expected sizes. Same
    * determinism story (re-runs/retries identical; re-derivable via
    * [[idHashSql]] + per-stratum rank), NESTED in k (the k=10 sample
    * is a prefix of the k=20 sample under the same seed, because both
    * are prefixes of the same hash order), and scalable through the
    * bounded [[GroupTopK]] buffer: at most k rows per stratum ×
    * partition shuffle — never a per-stratum global sort. Strata with
    * fewer than k rows return whole. Output: (stratumCol, idCol). */
  def exactStratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                            k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // Fail at the API boundary, not deep in GroupTopK's casts: the
    // bounded top-k buffer keys (string stratum, long id), so a string
    // doc id or a struct stratum would otherwise come back silently
    // re-typed (or null out at the cast) instead of erroring here.
    import org.apache.spark.sql.types._
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"exactStratifiedSample: idCol '$idCol' must be an integral type " +
        s"(the id round-trips through the long-keyed top-k buffer), got $idType")
    require(df.schema(stratumCol).dataType == StringType,
      s"exactStratifiedSample: stratumCol '$stratumCol' must be string " +
        s"(it round-trips through the string-keyed buffer), got " +
        df.schema(stratumCol).dataType)
    GroupTopK.topKPerGroup(
        df.withColumn("_negh", -idHash(col(idCol), seed)),
        stratumCol, idCol, "_negh", k)
      .select(col(stratumCol), col(idCol).cast(idType))
  }

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
