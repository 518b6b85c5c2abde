package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Edit-distance (Levenshtein) similarity join with RECALL-COMPLETE
  * deletion-neighborhood blocking — the FastSS family (Bocek, Hunt,
  * Stiller: "Fast Similarity Search in Large Dictionaries", Univ. of
  * Zurich tech report ifi-2007.02), re-expressed as Spark equi-joins.
  *
  * Replaces the r12 `f15` demo's first-character equi-block, which was
  * recall-LOSSY: any pair whose edit touches position 0
  * ("Smith"/"mith") never shared a block. Deletion neighborhoods carry
  * a guarantee instead: if `ed(a,b) <= k` then the sets of strings
  * obtainable by deleting at most k characters from a and from b
  * intersect (delete the edited positions from each side), so a
  * candidate join on shared variants NEVER misses a true pair. The
  * converse does not hold (a shared variant only bounds `ed <= 2k`),
  * which is why every candidate is verified with the exact native
  * `levenshtein` — blocking is allowed false positives, never false
  * negatives.
  *
  * Scale posture:
  *  - never all-pairs: candidates come from an equi-join on variant
  *    keys, and [[selfJoinWithStats]] measures the fraction of the
  *    quadratic pair space actually verified (the dd18/sx57
  *    candidate-accounting convention);
  *  - variant keys shuffle as 8-byte `xxhash64` hashes, not variant
  *    strings — a hash collision can only ADD a candidate (killed at
  *    verify), never lose one, so completeness survives the
  *    compression;
  *  - the `|len(a) - len(b)| <= k` necessary condition prunes
  *    candidates BEFORE the pair-dedup shuffle;
  *  - candidate generation is keys-only `(key, id, len)` rows; full
  *    strings are joined back exactly once for the verify pass.
  *
  * Intended domain: SHORT keys — names, titles, codes (the reference's
  * street-name repair domain, audit.py's over_abbreviated /
  * update_name family). The deletion neighborhood of a length-n
  * string has ~n^k/k! members, so `maxDist` is capped at 2 and
  * strings longer than `maxLen` fail loudly (a 10k-char document at
  * k=2 would be 50M variants — use [[SimilarityJoin]] /
  * [[Dedup.minhashNearDups]] for long text).
  */
object FuzzyJoin {

  /** All single-character-deletion variants of `s` (length-n array;
    * empty array for the empty string). */
  private def del1(s: Column): Column =
    when(length(s) <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - lit(1)),
          s.substr(i + lit(1), length(s)))))

  /** The deletion neighborhood D_<=k(s): s plus every string obtainable
    * by deleting up to `maxDist` characters, distinct. Grows as
    * ~n^k/k! — the reason for the maxDist/maxLen guards. */
  private[operators] def neighborhood(s: Column, maxDist: Int): Column = {
    var acc: Column = array(s)
    var frontier: Column = array(s)
    (1 to maxDist).foreach { _ =>
      frontier = array_distinct(flatten(transform(frontier, v => del1(v))))
      acc = concat(acc, frontier)
    }
    array_distinct(acc)
  }

  private def keysOf(base: DataFrame, maxDist: Int): DataFrame =
    base.select(col("id"), col("n"),
        explode(neighborhood(col("s"), maxDist)).as("v"))
      .select(col("id"), col("n"), xxhash64(col("v")).as("key"))

  private def guard(base: DataFrame, strCol: String, maxDist: Int,
      maxLen: Int): Unit = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2 (neighborhoods grow ~n^k/k!), got $maxDist")
    val worst = base.agg(max(col("n"))).head()
    val longest = if (worst.isNullAt(0)) 0 else worst.getInt(0)
    require(longest <= maxLen,
      s"'$strCol' has a length-$longest value but maxLen=$maxLen — " +
        "deletion-neighborhood blocking is for short keys (names/titles/" +
        "codes); for long text use SimilarityJoin or MinHash-LSH")
  }

  /** All pairs `(id1 < id2, dist)` with `levenshtein <= maxDist` —
    * complete (no blocking miss) and exact (`dist` is the true edit
    * distance). NULL strings never pair; empty strings participate
    * (""/"a" is a distance-1 pair). Ties in id ordering require an
    * orderable id column. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxLen: Int = 256): DataFrame = {
    val p = build(df, idCol, strCol, maxDist, maxLen)
    try p.verified.localCheckpoint(true)
    finally p.base.unpersist(blocking = false)
  }

  /** [[selfJoin]] plus the scale evidence: one stats row
    * `(n_rows, n_candidates, n_pairs, candidate_frac)` where
    * `candidate_frac = n_candidates / (n·(n−1)/2)` — the fraction of
    * the quadratic pair space the deletion-neighborhood block actually
    * verified. */
  def selfJoinWithStats(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxLen: Int = 256): (DataFrame, DataFrame) = {
    val p = build(df, idCol, strCol, maxDist, maxLen)
    val cand = p.cand.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val pairs = p.verifiedFrom(cand).localCheckpoint(true)
      val nRows = p.base.count()
      val nCand = cand.count()
      val nPairs = pairs.count()
      val allPairs = math.max(nRows * (nRows - 1) / 2, 1L).toDouble
      val spark = df.sparkSession
      import spark.implicits._
      val stats = Seq((nRows, nCand, nPairs, nCand / allPairs))
        .toDF("n_rows", "n_candidates", "n_pairs", "candidate_frac")
      (pairs, stats)
    } finally { // a failed action must not leak cached partitions
      cand.unpersist(blocking = false)
      p.base.unpersist(blocking = false)
    }
  }

  /** Two-table fuzzy match: all `(left_id, right_id, dist)` with
    * `levenshtein(left_str, right_str) <= maxDist` — the
    * entity-resolution shape (dirty names against a canonical
    * dictionary). Same completeness guarantee; a left row may match
    * many right rows and vice versa. */
  def join(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int, maxLen: Int = 256): DataFrame = {
    val lb = sideOf(left, leftId, leftStr).persist(StorageLevel.MEMORY_AND_DISK)
    val rb = sideOf(right, rightId, rightStr).persist(StorageLevel.MEMORY_AND_DISK)
    try { // guard() or any action may throw: never leak the caches
      guard(lb, leftStr, maxDist, maxLen)
      guard(rb, rightStr, maxDist, maxLen)
      val cand = keysOf(lb, maxDist)
        .select(col("key"), col("id").as("left_id"), col("n").as("n1"))
        .join(keysOf(rb, maxDist)
          .select(col("key"), col("id").as("right_id"), col("n").as("n2")),
          Seq("key"))
        .filter(abs(col("n1") - col("n2")) <= maxDist)
        .select("left_id", "right_id").distinct()
      cand
        .join(lb.select(col("id").as("left_id"), col("s").as("s1")), "left_id")
        .join(rb.select(col("id").as("right_id"), col("s").as("s2")), "right_id")
        .withColumn("dist", levenshtein(col("s1"), col("s2")))
        .filter(col("dist") <= maxDist)
        .select(col("left_id"), col("right_id"), col("dist"))
        .localCheckpoint(true)
    } finally {
      lb.unpersist(blocking = false)
      rb.unpersist(blocking = false)
    }
  }

  private def sideOf(df: DataFrame, idCol: String, strCol: String): DataFrame =
    df.filter(col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("s"),
        length(col(strCol)).as("n"))

  private final case class Pipeline(base: DataFrame, cand: DataFrame,
      maxDist: Int) {
    def verifiedFrom(c: DataFrame): DataFrame = c
      .join(base.select(col("id").as("id1"), col("s").as("s1")), "id1")
      .join(base.select(col("id").as("id2"), col("s").as("s2")), "id2")
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .filter(col("dist") <= maxDist)
      .select(col("id1"), col("id2"), col("dist"))
    def verified: DataFrame = verifiedFrom(cand)
  }

  private def build(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxLen: Int): Pipeline = {
    val base = sideOf(df, idCol, strCol).persist(StorageLevel.MEMORY_AND_DISK)
    try guard(base, strCol, maxDist, maxLen)
    catch { case e: Throwable => base.unpersist(blocking = false); throw e }
    val keys = keysOf(base, maxDist)
    val cand = keys.select(col("key"), col("id").as("id1"), col("n").as("n1"))
      .join(keys.select(col("key"), col("id").as("id2"), col("n").as("n2")),
        Seq("key"))
      .filter(col("id1") < col("id2"))
      .filter(abs(col("n1") - col("n2")) <= maxDist)
      .select("id1", "id2").distinct()
    Pipeline(base, cand, maxDist)
  }

  /** A STANDING fuzzy-match dictionary: the canonical side of
    * [[join]] with its deletion-neighborhood keys computed ONCE and
    * kept cached — the shape a streaming loop needs
    * ([[graft.streaming.Windows.streamingFuzzyMatch]]), where the
    * dictionary is fixed for the stream's lifetime and re-deriving
    * ~n^k/k! variant keys per micro-batch would be pure rework. The
    * caches are the point (a standing index, not a leak); `unpersist()`
    * when the stream ends. */
  final case class PreparedDict private[FuzzyJoin] (
      private[FuzzyJoin] val base: DataFrame,
      private[FuzzyJoin] val keys: DataFrame,
      maxDist: Int) {
    def unpersist(): Unit = {
      base.unpersist(blocking = false)
      keys.unpersist(blocking = false)
    }
  }

  /** Build a [[PreparedDict]] from the canonical table: guard once,
    * persist the `(id, s, n)` base and its hashed variant keys. */
  def prepare(dict: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxLen: Int = 256): PreparedDict = {
    val base = sideOf(dict, idCol, strCol).persist(StorageLevel.MEMORY_AND_DISK)
    try guard(base, strCol, maxDist, maxLen)
    catch { case e: Throwable => base.unpersist(blocking = false); throw e }
    val keys = keysOf(base, maxDist).persist(StorageLevel.MEMORY_AND_DISK)
    PreparedDict(base, keys, maxDist)
  }

  /** Per-micro-batch probe against a [[PreparedDict]]: all
    * `(left_id, dict_id, dist)` with `levenshtein <= prep.maxDist` —
    * the [[join]] semantics with the dictionary half of the work
    * already paid. LAZY (no internal actions/persists): a streaming
    * caller materializes the result exactly once at its sink, and the
    * probe side of a micro-batch is small, so its keys broadcast into
    * the equi-join against the standing key table. The probe side's
    * maxLen guard rides IN-PLAN (`raise_error` on an over-long value —
    * one job, no extra driver action per batch; fails the micro-batch
    * loudly, the foreachBatch discipline). */
  def joinPrepared(left: DataFrame, leftId: String, leftStr: String,
      prep: PreparedDict, maxLen: Int = 256): DataFrame = {
    val guarded = sideOf(left, leftId, leftStr)
      .withColumn("s", when(length(col("s")) > maxLen,
          raise_error(concat(lit(s"'$leftStr' value longer than maxLen=$maxLen " +
            "— deletion-neighborhood blocking is for short keys: "),
            col("s").substr(1, 64))))
        .otherwise(col("s")))
    val cand = broadcast(keysOf(guarded, prep.maxDist)
        .select(col("key"), col("id").as("left_id"), col("n").as("n1")))
      .join(prep.keys
        .select(col("key"), col("id").as("dict_id"), col("n").as("n2")),
        Seq("key"))
      .filter(abs(col("n1") - col("n2")) <= prep.maxDist)
      .select("left_id", "dict_id").distinct()
    cand
      .join(broadcast(guarded.select(col("id").as("left_id"), col("s").as("s1"))),
        "left_id")
      .join(prep.base.select(col("id").as("dict_id"), col("s").as("s2")),
        "dict_id")
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .filter(col("dist") <= prep.maxDist)
      .select(col("left_id"), col("dict_id"), col("dist"))
  }

  /** Brute-force all-pairs edit distance — the quadratic semantics
    * reference for [[selfJoin]] (spec parity only; never the scale
    * path). */
  private[graft] def bruteForcePairs(df: DataFrame, idCol: String,
      strCol: String, maxDist: Int): DataFrame = {
    val base = df.filter(col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("s"))
    base.select(col("id").as("id1"), col("s").as("s1"))
      .crossJoin(base.select(col("id").as("id2"), col("s").as("s2")))
      .filter(col("id1") < col("id2"))
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .filter(col("dist") <= maxDist)
      .select(col("id1"), col("id2"), col("dist"))
  }
}
