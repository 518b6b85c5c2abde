package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.storage.StorageLevel

import graft.functions.{VectorFunctions => V}
import graft.plans.{PqAdcExpr, PqDecodeExpr, PqEncodeExpr}

/** PRODUCT QUANTIZATION (Jégou, Douze, Schmid 2011 — the public IVF-PQ
  * recipe every billion-scale ANN system runs on): each vector splits
  * into `m` subvectors; each subspace trains its own k-entry codebook
  * by L2 k-means; a vector is stored as the m BYTES naming its nearest
  * entry per subspace. A 64-float embedding becomes an 8-byte code —
  * 32× compression — and query scoring never touches the floats again:
  * the query expands driver-side into m×k lookup tables (asymmetric
  * distance computation), and each candidate costs m table adds.
  *
  * 100 TB posture, by phase:
  *  - TRAIN is a build step: init is one bounded distinct-sample per
  *    subspace, then each Lloyd round is ONE distributed aggregation
  *    whose partial state is the m×k (count, sum) table — a few KB per
  *    partition, map-side combined. Driver state = the codebooks
  *    (k × dim doubles), the IVF-centroid precedent.
  *  - ENCODE is a fused zero-shuffle scan ([[graft.plans.PqEncodeExpr]],
  *    codebooks in the task closure) — run once at ingest, the codes
  *    land beside the ids and the float column never ships again.
  *  - SCORE reads only the code column: [[graft.plans.PqAdcExpr]] with
  *    the per-query lookup tables in the closure, top-k via
  *    TakeOrderedAndProject. At scale this composes with the IVF
  *    partition pruning ([[Ann.buildIvfIndex]]): probe the nProbe cell
  *    directories, ADC-score their codes.
  *
  * Scoring is approximate COSINE (the family's metric, comparable to
  * [[Ann.bruteForceTopK]]): both dot(q, x̂) and ‖x̂‖² decompose exactly
  * over subspaces, so the reconstruction x̂'s cosine computes from the
  * same m lookups as L2 would. Determinism: init is a
  * distinct-orderBy-limit sample (no RNG); argmin ties break to the
  * lowest index everywhere; and on integer-valued planted fixtures the
  * trained centroids are bit-exact regardless of partition order
  * (integer sums are exact in double), which is what lets ann9 pin PQ
  * top-k against a DuckDB exact-cosine oracle.
  */
object Pq {

  /** Trained codebooks: `books(s)(j)` is subspace s's j-th centroid
    * (length dim/m). */
  final case class Codebooks(dim: Int, books: Array[Array[Array[Double]]]) {
    def m: Int = books.length
    def k: Int = books(0).length
    def sub: Int = dim / m
  }

  /** Per-round distributed state: counts(s*k+j) and
    * sums(((s*k)+j)*sub .. +sub) accumulate subspace s / cell j. */
  final case class PqState(counts: Array[Long], sums: Array[Double])

  /** One Lloyd round for ALL subspaces in ONE aggregation: assignment
    * against the closure-captured codebooks, partial (count, sum)
    * tables merged elementwise. */
  private final class PqRoundAgg(books: Array[Array[Array[Double]]], dim: Int)
      extends Aggregator[Seq[Double], PqState, PqState] {
    private val m = books.length
    private val k = books(0).length
    private val sub = dim / m

    override def zero: PqState =
      PqState(new Array[Long](m * k), new Array[Double](m * k * sub))

    override def reduce(b: PqState, vec: Seq[Double]): PqState = {
      val x = vec.toArray
      var s = 0
      while (s < m) {
        val base = s * sub
        var best = 0
        var bestD = Double.PositiveInfinity
        var j = 0
        while (j < k) {
          val c = books(s)(j)
          var d = 0.0
          var t = 0
          while (t < sub) { val e = x(base + t) - c(t); d += e * e; t += 1 }
          if (d < bestD) { bestD = d; best = j } // ties → lowest index
          j += 1
        }
        val cell = s * k + best
        b.counts(cell) += 1
        var t = 0
        while (t < sub) { b.sums(cell * sub + t) += x(base + t); t += 1 }
        s += 1
      }
      b
    }

    override def merge(a: PqState, b: PqState): PqState = {
      var i = 0
      while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
      i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      a
    }

    override def finish(r: PqState): PqState = r
    override def bufferEncoder: Encoder[PqState] = Encoders.product[PqState]
    override def outputEncoder: Encoder[PqState] = Encoders.product[PqState]
  }

  /** Train m codebooks of k entries each. Init: per subspace, greedy
    * FARTHEST-POINT (k-center) seeds over a bounded sample of the
    * distinct subvectors — deterministic, no RNG. The sample is
    * min(n, max(4096, k)) rows at evenly-spaced ranks of the
    * value-ordered distinct set (a distributed sort + zipWithIndex;
    * the collect is ≤4096 sub-dim rows, the codebook class of driver
    * state); the traversal starts at the value-smallest sample row and
    * repeatedly adds the sample row farthest from the chosen set
    * (ties → lowest rank). Why k-center, not "k value-smallest" (the
    * pre-r15 rule) or bare even-spread ranks: when the input is an
    * ε-perturbed rotation of clustered data (the [[Opq]] alternation's
    * second round), each true cluster explodes into an ε-diameter blob
    * of distinct subvectors and the k value-smallest seeds all land in
    * the lowest blob — degenerate codebooks that Lloyd's
    * empty-cell-keeps-centroid rule never recovers from; k-center
    * provably covers every cluster when k ≥ #clusters and separations
    * exceed diameters, so separable planted clusters converge exactly.
    * And on real spread-out corpora, rank spacing over a LEXICOGRAPHIC
    * sort only diversifies the leading dimension (measured: it cost
    * −0.1 raw / −0.2 rerank recall@10 vs the old rule at sf scale)
    * while k-center spreads seeds in the full sub-dim geometry.
    * Fewer than k distinct subvectors pads by cycling (duplicate
    * centroids are harmless: the strict argmin never picks one over
    * its lower-index twin). Each Lloyd round is one distributed pass;
    * empty cells keep their centroid. */
  /** Valid-vector projection, optionally hash-gated down to
    * ≈ `maxTrainRows` training rows (deterministic: the gate is a
    * modulus of xxhash64 over the vector itself, so the same corpus
    * always trains on the same rows regardless of partitioning). One
    * count when the gate is requested; none otherwise. */
  private[graft] def trainingSet(embs: DataFrame, vecCol: String, dim: Int,
                                 maxTrainRows: Long): DataFrame = {
    val base = embs
      .select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dim &&
        !array_contains(transform(col("v"), e => e.isNull), true))
    if (maxTrainRows <= 0) base
    else {
      val n = base.count()
      if (n <= maxTrainRows) base
      else {
        val den = math.max(2L, math.round(n.toDouble / maxTrainRows))
        base.filter(pmod(xxhash64(col("v")), lit(den)) === 0)
      }
    }
  }

  /** Greedy farthest-point traversal on the driver-side sample: start
    * at the value-smallest row, repeatedly add the row maximizing the
    * distance to the chosen set (ties → lowest rank). O(k·|sample|·sub)
    * driver arithmetic — ≤ 256·4096·64 ≈ 67M flops worst case. */
  private def kCenterSeeds(sample: Array[Array[Double]], k: Int,
                           sub: Int): Array[Array[Double]] = {
    val minD = new Array[Double](sample.length)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var t = 0
      while (t < sub) { val e = a(t) - b(t); s += e * e; t += 1 }
      s
    }
    val seeds = new Array[Array[Double]](k)
    seeds(0) = sample(0).clone()
    var i = 0
    while (i < sample.length) { minD(i) = d2(sample(i), seeds(0)); i += 1 }
    var c = 1
    while (c < k) {
      var best = 0
      var bestD = -1.0
      i = 0
      while (i < sample.length) {
        if (minD(i) > bestD) { bestD = minD(i); best = i }
        i += 1
      }
      seeds(c) = sample(best).clone()
      i = 0
      while (i < sample.length) {
        val nd = d2(sample(i), seeds(c))
        if (nd < minD(i)) minD(i) = nd
        i += 1
      }
      c += 1
    }
    seeds
  }

  /** `maxTrainRows` is the 100 TB knob: codebooks are ESTIMATES, and
    * the published practice (FAISS trains k-means on ≤ ~256 points
    * per centroid) is to fit them on a bounded sample and encode the
    * full corpus — every Lloyd round and the seeding sort otherwise
    * scan all of it. 0 (default) trains on everything (the fixture /
    * oracle path); > 0 gates rows by a deterministic vector hash down
    * to ≈ that many before any training pass. Encoding ([[encode]] /
    * [[topK]]) is unaffected — it always covers every row. */
  def train(embs: DataFrame, vecCol: String, dim: Int, m: Int, k: Int,
            iters: Int = 3, maxTrainRows: Long = 0): Codebooks = {
    require(dim > 0 && m > 0 && dim % m == 0,
      s"dim must split evenly into m subspaces: dim=$dim, m=$m")
    require(k > 0 && k <= 256, s"byte codes address 1..256 centroids: k=$k")
    require(iters >= 0, s"negative iters: $iters")
    val spark = embs.sparkSession
    import spark.implicits._
    val sub = dim / m
    val vecs = trainingSet(embs, vecCol, dim, maxTrainRows)
      .as[Seq[Double]]
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var books: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
        val sorted = vecs.toDF("v")
          .select(slice(col("v"), s * sub + 1, sub).as("sv"))
          .distinct().orderBy(col("sv"))
        val n = sorted.count()
        require(n > 0,
          s"no trainable vectors in $vecCol (null / wrong-dim rows only)")
        if (n <= k) {
          val all = sorted.collect().map(_.getSeq[Double](0).toArray)
          Array.tabulate(k)(j => all(j % all.length).clone())
        } else {
          // bounded sample at evenly-spaced ranks of the global sort;
          // the sorted plan is range-partitioned, so zipWithIndex ids
          // ARE the ranks
          val sampleSize = math.min(n, math.max(4096L, k.toLong)).toInt
          val targets = (0 until sampleSize).map(j => j.toLong * n / sampleSize).toSet
          val sample = sorted.rdd.zipWithIndex()
            .filter { case (_, i) => targets.contains(i) }
            .map { case (row, i) => (i, row.getSeq[Double](0).toArray) }
            .collect().sortBy(_._1).map(_._2)
          assert(sample.length >= k, s"seed sample: ${sample.length} < $k")
          kCenterSeeds(sample, k, sub)
        }
      }
      var it = 0
      while (it < iters) {
        // clone per round: the closure must capture THIS iterate
        val snap = books.map(_.map(_.clone()))
        val st = vecs.select(new PqRoundAgg(snap, dim).toColumn).head()
        books = Array.tabulate(m) { s =>
          Array.tabulate(k) { j =>
            val cell = s * k + j
            val n = st.counts(cell)
            if (n == 0) books(s)(j) // empty cell keeps its centroid
            else Array.tabulate(sub)(t => st.sums(cell * sub + t) / n)
          }
        }
        it += 1
      }
      Codebooks(dim, books)
    } finally vecs.unpersist(blocking = false)
  }

  /** vector → m-byte PQ code (fused, zero shuffle; codebooks in the
    * closure). Null / short / null-element vectors encode as NULL. */
  def encode(vec: Column, cb: Codebooks): Column =
    column(PqEncodeExpr(expression(vec), cb.books))

  /** PQ code → the codebook reconstruction ŷ (array<double>). Cosine
    * against ŷ equals the ADC cosine; this form serves BATCH query
    * paths where per-query driver-side ADC tables are impossible —
    * scoring rides decode→cosine in-plan instead. */
  def decode(codes: Column, cb: Codebooks): Column =
    column(PqDecodeExpr(expression(codes), cb.books))

  /** PQ code → approximate cosine against `queryVec`, via the m×k ADC
    * lookup tables built HERE, driver-side, once per query. */
  def adcCosine(codes: Column, queryVec: Seq[Double], cb: Codebooks): Column = {
    require(queryVec.length == cb.dim,
      s"query dim ${queryVec.length} != codebook dim ${cb.dim}")
    val q = queryVec.toArray
    val dotTab = Array.tabulate(cb.m) { s =>
      Array.tabulate(cb.k) { j =>
        val c = cb.books(s)(j)
        var d = 0.0
        var t = 0
        while (t < cb.sub) { d += q(s * cb.sub + t) * c(t); t += 1 }
        d
      }
    }
    val sqTab = Array.tabulate(cb.m) { s =>
      Array.tabulate(cb.k) { j =>
        val c = cb.books(s)(j)
        var d = 0.0
        var t = 0
        while (t < cb.sub) { d += c(t) * c(t); t += 1 }
        d
      }
    }
    val qNorm = math.sqrt(q.map(v => v * v).sum)
    column(PqAdcExpr(expression(codes), dotTab, sqTab, qNorm))
  }

  /** RESIDUAL-code ADC ([[graft.plans.PqResidualAdcExpr]]): approximate
    * cosine for codes that quantize r = x − cent(cell) — the classic
    * IVFADC refinement, where quantization spends its k entries on the
    * (much tighter) within-cell offsets instead of re-describing cell
    * placement the IVF assignment already knows. Tables built HERE,
    * driver-side, once per query: the global q·r̂ / ‖r̂‖² m×k pair plus,
    * per PROBED cell, q·cent, ‖cent‖² and the cent·r̂ m×k table that
    * completes the ‖cent + r̂‖² decomposition. `cell` must be the
    * index's int cell column. */
  def adcCosineResidual(codes: Column, cell: Column, queryVec: Seq[Double],
                        cb: Codebooks, cents: Seq[Seq[Double]],
                        probedCells: Seq[Int]): Column = {
    require(queryVec.length == cb.dim,
      s"query dim ${queryVec.length} != codebook dim ${cb.dim}")
    require(probedCells.forall(c => c >= 0 && c < cents.length),
      s"probed cells ${probedCells.mkString(",")} outside 0..${cents.length - 1}")
    require(cents.forall(_.length == cb.dim),
      s"centroid dim ${cents.headOption.map(_.length)} != codebook dim ${cb.dim}")
    val q = queryVec.toArray
    def subDot(a: Array[Double], aOff: Int, b: Array[Double]): Double = {
      var d = 0.0
      var t = 0
      while (t < cb.sub) { d += a(aOff + t) * b(t); t += 1 }
      d
    }
    val dotTab = Array.tabulate(cb.m)(s => Array.tabulate(cb.k)(j =>
      subDot(q, s * cb.sub, cb.books(s)(j))))
    val sqTab = Array.tabulate(cb.m)(s => Array.tabulate(cb.k)(j =>
      subDot(cb.books(s)(j), 0, cb.books(s)(j))))
    val cellIds = probedCells.toArray
    val centArr = cellIds.map(c => cents(c).toArray)
    val qDotC = centArr.map(c => c.zip(q).map { case (a, b) => a * b }.sum)
    val cNorm2 = centArr.map(c => c.map(v => v * v).sum)
    val cDotTab = centArr.map(c => Array.tabulate(cb.m)(s =>
      Array.tabulate(cb.k)(j => subDot(c, s * cb.sub, cb.books(s)(j)))))
    val qNorm = math.sqrt(q.map(v => v * v).sum)
    column(graft.plans.PqResidualAdcExpr(expression(codes),
      expression(cell.cast("int")), dotTab, sqTab, qNorm,
      cellIds, qDotC, cNorm2, cDotTab))
  }

  /** Top-k by PQ-approximated cosine with ALREADY-TRAINED codebooks:
    * one fused encode→ADC projection over the scan, top-k via
    * TakeOrderedAndProject — the query path a standing corpus pays
    * (at scale the codes are pre-encoded at ingest; encoding here
    * keeps the demo self-contained on a float column). */
  def topK(embs: DataFrame, idCol: String, vecCol: String,
           queryVec: Seq[Double], k: Int, cb: Codebooks): DataFrame =
    embs.select(col(idCol),
        adcCosine(encode(col(vecCol), cb), queryVec, cb).as("sim"))
      .filter(col("sim").isNotNull)
      .orderBy(desc("sim"), col(idCol))
      .limit(k)

  /** Shortlist sizing recipe for [[topKReranked]]:
    * max(100, 10·k, ⌈0.1·n⌉) capped at 10k. The corpus-fraction term
    * is the small/medium-corpus guard — where ADC rank noise is large
    * RELATIVE to the corpus, a fixed candidate count under-covers (a
    * fixed 100 was 5% of the sf0.1 corpus and measured 0.9 recall@10;
    * 10% restores 1.0). The cap sits just under the session's
    * `topKSortFallbackThreshold` (default 10000): the ADC ranking
    * pass is an `orderBy(…).limit(shortlist)`, which plans as a
    * bounded per-partition TakeOrderedAndProject heap STRICTLY below
    * that value (the planner's comparison is `limit < threshold`) and
    * as a FULL global sort of the scored corpus at it — and ADC's
    * top-~10k is far looser than any real top-k needs at the sizes
    * where the cap binds (n > ~100k). */
  def rerankShortlist(nCorpus: Long, k: Int): Int = {
    val cap = math.max(100L,
      org.apache.spark.sql.internal.SQLConf.get.topKSortFallbackThreshold - 1L)
    // the cap binds the FINAL max — every term, including 10·k: a
    // k ≥ 1000 would otherwise return a shortlist at/over the fence
    // and the documented TakeOrderedAndProject plan would silently
    // degrade to a full global sort of the scored corpus. But the
    // result must still FLOOR AT K (the Ann search paths' guard, r16
    // advice): for k at/above the fence itself, a sub-k shortlist
    // would fail topKReranked's require where the uncapped recipe
    // merely planned the documented full-sort degradation — accept
    // the full sort, never the crash.
    math.max(k.toLong, math.min(cap, math.max(math.max(100L, 10L * k),
      math.ceil(0.1 * nCorpus).toLong))).toInt
  }

  /** SHORTLIST-AND-RERANK — the production PQ recipe: ADC over the
    * codes ranks a `shortlist`-sized candidate set (default 10·k;
    * size standing corpora with [[rerankShortlist]]), then ONLY those
    * rows' float vectors score exact cosine for the final top-k.
    * Measured at sf0.1 (64-dim, m=8, k=256): raw ADC recall@10 is 0.5
    * on the near-incompressible synthetic embeddings, while a
    * [[rerankShortlist]]-sized rerank recovers 1.0 — the
    * pq_rerank_recall_at_10 gauge pins it every round. Cost shape: the
    * ranking pass reads m BYTES per vector (codes column only — on a
    * columnar layout the float column isn't touched), and exact
    * arithmetic is paid for shortlist rows alone; at 100 TB the rerank
    * fetch composes with an id-clustered or IVF-cell layout so the
    * float reads are row-group-pruned too. */
  def topKReranked(embs: DataFrame, idCol: String, vecCol: String,
                   queryVec: Seq[Double], k: Int, cb: Codebooks,
                   shortlist: Int = 0): DataFrame = {
    val n = if (shortlist > 0) shortlist else math.max(10 * k, 100)
    require(n >= k, s"shortlist $n smaller than k=$k")
    val spark = embs.sparkSession
    import spark.implicits._
    val cands = topK(embs, idCol, vecCol, queryVec, n, cb).select(col(idCol))
    val q = broadcast(Seq(Tuple1(queryVec.map(_.toFloat))).toDF("_qvec"))
    embs.join(broadcast(cands), Seq(idCol), "left_semi")
      .crossJoin(q)
      .withColumn("sim", V.cosineSimilarityNative(col(vecCol), col("_qvec")))
      .select(col(idCol), col("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /** Serialize codebooks to a [[ModelRegistry]]-storable spec string.
    * Plain `Double.toString` components (exact round-trip per the Java
    * spec), so [[fromSpec]] reproduces the books double-for-double —
    * the train-once / publish / query-later lifecycle every other
    * trainable in the repo gets (classifier weights, BPE merges). */
  def spec(cb: Codebooks): String =
    s"pqv1;${cb.dim};${cb.m};${cb.k};" +
      cb.books.map(_.map(_.mkString(",")).mkString("|")).mkString(";")

  /** Parse a [[spec]] string back into codebooks — loud on anything
    * that isn't one. */
  def fromSpec(s: String): Codebooks = {
    val parts = s.split(";", -1)
    require(parts.length >= 5 && parts(0) == "pqv1",
      s"not a pq codebook spec: '${s.take(24)}…'")
    val (dim, m, k) = (parts(1).toInt, parts(2).toInt, parts(3).toInt)
    val books = parts.drop(4).map(
      _.split("\\|", -1).map(_.split(",", -1).map(_.toDouble)))
    require(books.length == m && books.forall(b =>
      b.length == k && b.forall(_.length == dim / m)),
      s"malformed pq spec: m=$m k=$k sub=${dim / m} vs parsed " +
        s"${books.length}/${books.headOption.map(_.length)}")
    Codebooks(dim, books)
  }

  /** Persist the PRE-ENCODED corpus: (id, vec, pq_code) — the standing
    * layout the ADC cost story assumes. The ranking pass of
    * [[topKEncoded]] then touches ONLY the m-byte `pq_code` column
    * (parquet column pruning — ReadSchema excludes the float vector,
    * pinned in PqSpec), and the floats are read just for rerank
    * shortlist rows. Encode once at ingest, not per query. */
  def writeEncodedTable(embs: DataFrame, idCol: String, vecCol: String,
                        cb: Codebooks, path: String): Unit =
    embs.select(col(idCol), col(vecCol), encode(col(vecCol), cb).as("pq_code"))
      .write.mode("overwrite").parquet(path)

  /** ADC ranking over a pre-encoded table ([[writeEncodedTable]]):
    * reads the `pq_code` column alone — m bytes per row of I/O. */
  def topKEncoded(encoded: DataFrame, idCol: String, queryVec: Seq[Double],
                  k: Int, cb: Codebooks): DataFrame =
    encoded.select(col(idCol), adcCosine(col("pq_code"), queryVec, cb).as("sim"))
      .filter(col("sim").isNotNull)
      .orderBy(desc("sim"), col(idCol))
      .limit(k)

  /** Shortlist-and-rerank over a pre-encoded table: the codes column
    * ranks the shortlist, then only those rows' float vectors are
    * fetched (semi-join back into the same table) for exact cosine. */
  def topKEncodedReranked(encoded: DataFrame, idCol: String, vecCol: String,
                          queryVec: Seq[Double], k: Int, cb: Codebooks,
                          shortlist: Int = 0): DataFrame = {
    val n = if (shortlist > 0) shortlist else math.max(10 * k, 100)
    require(n >= k, s"shortlist $n smaller than k=$k")
    val spark = encoded.sparkSession
    import spark.implicits._
    val cands = topKEncoded(encoded, idCol, queryVec, n, cb).select(col(idCol))
    val q = broadcast(Seq(Tuple1(queryVec.map(_.toFloat))).toDF("_qvec"))
    encoded.join(broadcast(cands), Seq(idCol), "left_semi")
      .crossJoin(q)
      .withColumn("sim", V.cosineSimilarityNative(col(vecCol), col("_qvec")))
      .select(col(idCol), col("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /** Train + search in one call (demo/test path — real deployments
    * train once and [[topK]] per query, the [[Ann.ivfTopKTrained]]
    * convention). */
  def pqTopK(embs: DataFrame, idCol: String, vecCol: String, dim: Int,
             queryVec: Seq[Double], k: Int, m: Int = 8, kCodes: Int = 16,
             iters: Int = 3): DataFrame =
    topK(embs, idCol, vecCol, queryVec, k,
      train(embs, vecCol, dim, m, kCodes, iters))
}
