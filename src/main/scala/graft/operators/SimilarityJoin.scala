package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** EXACT set-similarity self-join via global-frequency-order prefix
  * filtering — the AllPairs / PPJoin family (Bayardo et al. WWW'07;
  * Xiao et al. WWW'08; Vernica et al. SIGMOD'10, the MapReduce
  * formulation this implementation follows).
  *
  * This is the COMPLETE counterpart to the MinHash-LSH near-dup path
  * ([[Dedup.minhashNearDups]]): LSH banding trades recall for
  * candidate volume (a pair can land in no shared band), while the
  * prefix filter is a *lossless* candidate generator — every pair
  * with Jaccard ≥ t is guaranteed to share a prefix token, so the
  * verified output is exactly the brute-force all-pairs answer with
  * no probabilistic caveat. The price is sensitivity to corpus-wide
  * token frequencies (one extra agg + join to establish the global
  * order), which is why both operators exist: LSH for "find most
  * near-dups cheaply at 100 TB", this join when the contract is
  * "find ALL pairs ≥ t" (contamination audits, eval-set guarantees).
  *
  * Completeness (prefix-filtering lemma, both sides symmetric): order
  * every doc's shingle set by ascending global document frequency
  * (ties by token) and keep the first `L(n) = n - ceil(t·n) + 1`
  * tokens as its prefix. If `J(x,y) ≥ t` then
  * `|x∩y| ≥ t·|x∪y| ≥ t·max(|x|,|y|)`, so the integer overlap is
  * `≥ α = ceil(t·max(|x|,|y|))`; if the globally-first common token
  * were outside x's prefix, all `≥ α` common tokens would sit in x's
  * suffix of size `ceil(t·|x|) - 1 < α` — contradiction, and
  * symmetrically for y. Hence the first common token lies in BOTH
  * prefixes and the prefix-prefix equi-join emits the pair. The code
  * uses `L'(n) = n - floor(t·n) + 1 ≥ L(n)` so double rounding can
  * only lengthen the prefix (extra candidates, never a miss).
  *
  * Scale posture (the Vernica MapReduce shape):
  *  - the global order is ONE token-frequency aggregation; rarest-
  *    first ordering puts the rarest tokens in prefixes, so prefix
  *    postings are the SHORT tail of the frequency distribution and
  *    the candidate join touches small groups;
  *  - candidate generation is keys-only — `(prefix_token, id, n)`
  *    rows, never document payloads — followed by a distinct on the
  *    id pair; the full shingle arrays are joined back exactly once
  *    for the verify pass (the dd8 "keys-only distinct before one
  *    verify" rule);
  *  - the size filter `min(n1,n2) ≥ t·max(n1,n2)` (necessary since
  *    `J ≤ min/max`) prunes candidates before the distinct;
  *  - everything is equi-joins + aggs — no cartesian, no windows; the
  *    optional PPJoin positional refinement (bounding overlap by
  *    prefix positions) is documented but intentionally omitted: it
  *    cuts verify volume by a constant while complicating the
  *    keys-only shape, and the verify join is already one pass.
  *
  * Reference behavior anchored: readme.md's near-duplicate audit
  * queries define "duplicate" as shingle-Jaccard over whitespace
  * tokens; `dd18` pins this operator to the same planted corpus truth
  * as `dd3`/`dd5`, oracle-gated by a full DuckDB all-pairs
  * re-derivation (not pinned VALUES).
  */
object SimilarityJoin {

  /** All pairs `(id1 < id2, jaccard)` with exact k-shingle Jaccard
    * ≥ `threshold`. Complete — no false negatives — and exact: the
    * returned `jaccard` is `|∩|/|∪|` of the distinct shingle sets,
    * rounded to 4 decimals (the repo-wide oracle convention).
    *
    * Empty-text docs (no tokens → the single "" shingle) participate
    * like any other doc; docs never pair with themselves.
    *
    * `materialize = true` (default) eagerly localCheckpoints the small
    * pair result so the shared shingle intermediate can be unpersisted
    * before returning; pass `false` to keep the logical plan
    * inspectable (spec plan audits) — the caller then owns unpersist.
    */
  def jaccardJoin(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 3, materialize: Boolean = true): DataFrame = {
    val p = build(docs, idCol, textCol, threshold, k)
    if (materialize) {
      val out = p.verified.localCheckpoint(true)
      p.ordered.unpersist(blocking = false)
      out
    } else p.verified
  }

  /** [[jaccardJoin]] plus the scale evidence: one stats row
    * `(n_docs, n_candidates, n_pairs, candidate_frac)` where
    * `candidate_frac = n_candidates / (n_docs·(n_docs−1)/2)` — the
    * fraction of the quadratic pair space the prefix filter actually
    * verified. This is the operator's 100 TB argument as a measured
    * number (the LSH analog is [[Dedup.lshDropStats]]). */
  def jaccardJoinWithStats(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 3): (DataFrame, DataFrame) = {
    val p = build(docs, idCol, textCol, threshold, k)
    val candPersisted = p.cand.persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = p.verifiedFrom(candPersisted).localCheckpoint(true)
    val nDocs = p.ordered.count()
    val nCand = candPersisted.count()
    val nPairs = pairs.count()
    candPersisted.unpersist(blocking = false)
    p.ordered.unpersist(blocking = false)
    val allPairs = math.max(nDocs * (nDocs - 1) / 2, 1L).toDouble
    val spark = docs.sparkSession
    import spark.implicits._
    val stats = Seq((nDocs, nCand, nPairs, nCand / allPairs))
      .toDF("n_docs", "n_candidates", "n_pairs", "candidate_frac")
    (pairs, stats)
  }

  private final case class Pipeline(ordered: DataFrame, cand: DataFrame,
      threshold: Double) {
    def verifiedFrom(c: DataFrame): DataFrame = c
      .join(ordered.select(col("id").as("id1"), col("toks").as("t1")), "id1")
      .join(ordered.select(col("id").as("id2"), col("toks").as("t2")), "id2")
      .withColumn("jaccard", Dedup.jaccard(col("t1"), col("t2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
    def verified: DataFrame = verifiedFrom(cand)
  }

  private def build(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int): Pipeline = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val sh = docs.select(col(idCol).as("id"),
      Dedup.shingles(col(textCol), k).as("toks"))

    // Global document frequency per shingle: the total order is
    // (df asc, token asc) — rarest first, deterministic tie-break.
    val tokRows = sh.select(col("id"), explode(col("toks")).as("tok"))
    val dfreq = tokRows.groupBy("tok").agg(count(lit(1)).as("df"))

    // Re-assemble each doc's shingles sorted by the global order.
    // sort_array on (df, tok) structs gives exactly (df asc, tok asc);
    // n = |distinct shingles| (shingles() already dedups).
    val ordered = tokRows.join(dfreq, "tok")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ord"),
        count(lit(1)).as("n"))
      .withColumn("toks", transform(col("ord"), s => s.getField("tok")))
      .withColumn("plen",
        least(col("n"), col("n") - floor(lit(threshold) * col("n")).cast("long") + 1))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Keys-only prefix postings → candidate id pairs. The size filter
    // runs BEFORE the distinct so oversize-mismatched pairs never
    // reach the pair-dedup shuffle; the 1e-9 slack keeps double
    // rounding one-sided (may keep a boundary pair, never drops one).
    val prefix = ordered.select(col("id"), col("n"),
      explode(slice(col("toks"), lit(1), col("plen"))).as("ptok"))
    val cand = prefix.select(col("ptok"), col("id").as("id1"), col("n").as("n1"))
      .join(prefix.select(col("ptok"), col("id").as("id2"), col("n").as("n2")),
        Seq("ptok"))
      .filter(col("id1") < col("id2"))
      .filter(least(col("n1"), col("n2")).cast("double") >=
        lit(threshold) * greatest(col("n1"), col("n2")).cast("double") - lit(1e-9))
      .select("id1", "id2")
      .distinct()

    // ONE verify join back to the shingle arrays (Pipeline.verified);
    // the caller materializes before unpersisting `ordered`.
    Pipeline(ordered, cand, threshold)
  }

  /** Brute-force all-pairs exact Jaccard — the quadratic semantics
    * reference for [[jaccardJoin]] (spec parity only; never the scale
    * path). */
  private[graft] def bruteForcePairs(docs: DataFrame, idCol: String,
      textCol: String, threshold: Double, k: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      Dedup.shingles(col(textCol), k).as("toks"))
    sh.select(col("id").as("id1"), col("toks").as("t1"))
      .crossJoin(sh.select(col("id").as("id2"), col("toks").as("t2")))
      .filter(col("id1") < col("id2"))
      .withColumn("jaccard", Dedup.jaccard(col("t1"), col("t2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
  }
}
