package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: bounded top-k of (id, score) pairs per group —
  * the batched-ANN reduction ([[Ann.bruteForceTopKBatch]] /
  * [[Ann.ivfSearchBatch]]).
  *
  * Why an Aggregator and not `row_number() OVER (PARTITION BY qid
  * ORDER BY sim DESC)`: the window form SHUFFLES AND SORTS every
  * scored row — queries × corpus rows move to the window exchange
  * before all but k per query are discarded. This buffer keeps at most
  * k entries per (query × partition) during the map-side partial pass,
  * so only k · numPartitions rows per query ever shuffle — the same
  * bound `TakeOrderedAndProject` gives the single-query path, made
  * per-group. At 100 TB with a 1000-query batch that is the difference
  * between shuffling 10^11 scored rows and 10^7 survivors.
  *
  * Ordering: better = higher score, ties to the smaller id — matching
  * the single-query operators' `orderBy(desc("sim"), col(id))`.
  * `finish` emits hits best-first. Flat primitive arrays, geometric
  * growth while filling, and a cached worst-index once full: the
  * common full-buffer reject is one compare, a replacing insert is one
  * O(k) rescan. Safe for serving-sized k (10..100) AND the
  * covering-shortlist callers that pass k ≈ corpus.
  */
class TopKByScore(k: Int)
    extends Aggregator[QueryScored, TopKByScore.Buf, Seq[TopHit]] {
  import TopKByScore.Buf
  require(k > 0, "k must be > 0")

  override def zero: Buf = Buf(new Array[Long](0), new Array[Double](0), 0, -1)
  override def reduce(b: Buf, v: QueryScored): Buf =
    TopKByScore.insert(b, v.id, v.sim, k)
  override def merge(a: Buf, b: Buf): Buf = TopKByScore.mergeBufs(a, b, k)
  override def finish(b: Buf): Seq[TopHit] = TopKByScore.finishSorted(b)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[TopHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopHit]]()
}

object TopKByScore {
  /** `n` held entries in the first n slots (capacity grows
    * GEOMETRICALLY toward k — the old `:+`-per-insert form copied the
    * whole array per element, O(k²) while filling, a real cost once
    * covering-shortlist callers pass k ≈ corpus); `wIdx` caches the
    * worst-entry index once the buffer is full (−1 = unknown), making
    * the common full-buffer REJECT an O(1) compare instead of a scan. */
  case class Buf(ids: Array[Long], scores: Array[Double], n: Int, wIdx: Int)

  /** Index of the worst held entry: lowest score, ties to the LARGER
    * id (the first evicted among equals, keeping smaller ids). */
  private def worst(ids: Array[Long], scores: Array[Double], n: Int): Int = {
    var w = 0
    var i = 1
    while (i < n) {
      if (scores(i) < scores(w) ||
        (scores(i) == scores(w) && ids(i) > ids(w))) w = i
      i += 1
    }
    w
  }

  private[operators] def insert(b: Buf, id: Long, score: Double, k: Int): Buf =
    if (b.n < k) {
      var ids = b.ids
      var sc = b.scores
      if (b.n == ids.length) {
        val cap = math.min(k, math.max(4, ids.length * 2))
        ids = java.util.Arrays.copyOf(ids, cap)
        sc = java.util.Arrays.copyOf(sc, cap)
      }
      ids(b.n) = id
      sc(b.n) = score
      Buf(ids, sc, b.n + 1, -1)
    } else if (b.wIdx >= 0) {
      // hot path: worst already cached — a reject is one compare and
      // returns the SAME Buf (zero allocation per rejected row)
      val w = b.wIdx
      if (score > b.scores(w) || (score == b.scores(w) && id < b.ids(w))) {
        b.ids(w) = id
        b.scores(w) = score
        // the replaced slot may no longer be the worst — recompute
        Buf(b.ids, b.scores, b.n, worst(b.ids, b.scores, b.n))
      } else b
    } else {
      // worst unknown: compute once and allocate ONE Buf caching it
      val w = worst(b.ids, b.scores, b.n)
      if (score > b.scores(w) || (score == b.scores(w) && id < b.ids(w))) {
        b.ids(w) = id
        b.scores(w) = score
        Buf(b.ids, b.scores, b.n, worst(b.ids, b.scores, b.n))
      } else Buf(b.ids, b.scores, b.n, w)
    }

  private[operators] def mergeBufs(a: Buf, b: Buf, k: Int): Buf = {
    var out = a
    var i = 0
    while (i < b.n) { out = insert(out, b.ids(i), b.scores(i), k); i += 1 }
    out
  }

  private[operators] def finishSorted(b: Buf): Seq[TopHit] =
    (0 until b.n)
      .sortBy(i => (-b.scores(i), b.ids(i)))
      .map(i => TopHit(b.ids(i), b.scores(i)))
}

/** [[TopKByScore]] for ANY group key: the same bounded buffer keyed by
  * a (group, id, score) tuple so `groupByKey(_._1)` can carry string
  * groups (source, language, url-host) without a surrogate-id pass.
  * Identical ordering/eviction semantics — shared core. */
class TopKByScoreAny(k: Int)
    extends Aggregator[(String, Long, Double), TopKByScore.Buf, Seq[TopHit]] {
  import TopKByScore.Buf
  require(k > 0, "k must be > 0")

  override def zero: Buf = Buf(new Array[Long](0), new Array[Double](0), 0, -1)
  override def reduce(b: Buf, v: (String, Long, Double)): Buf =
    TopKByScore.insert(b, v._2, v._3, k)
  override def merge(a: Buf, b: Buf): Buf = TopKByScore.mergeBufs(a, b, k)
  override def finish(b: Buf): Seq[TopHit] = TopKByScore.finishSorted(b)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[TopHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopHit]]()
}

/** One scored candidate row of a batched ANN pass. */
case class QueryScored(qid: Long, id: Long, sim: Double)

/** One ranked hit of a batched top-k result. */
case class TopHit(id: Long, sim: Double)

/** A scored candidate carrying its label POLARITY relative to the
  * anchor (pos = same label). The triplet-mining value type — polarity
  * rides the row so ONE corpus scan feeds both buffers. */
case class PolarScored(qid: Long, id: Long, sim: Double, pos: Boolean)

/** Two [[TopKByScore]] buffers in one Aggregator — top-`posK`
  * same-label hits AND top-`negK` different-label hits per group, fed
  * by polarity-tagged rows from a SINGLE pass. This is what lets
  * [[HardNegatives.triplets]] mine positives and negatives in one
  * corpus scan: two separate `mineWith` calls would each re-scan the
  * corpus (two branches of an unpersisted plan re-execute upstream),
  * doubling the dominant IO at scale. Same per-buffer bounds and
  * (sim desc, id asc) ordering as the single-pole aggregator — the
  * shuffle carries at most posK + negK entries per group × partition. */
class TwoPoleTopK(posK: Int, negK: Int)
    extends Aggregator[PolarScored, TwoPoleTopK.Buf2,
      (Seq[TopHit], Seq[TopHit])] {
  import TopKByScore.Buf
  import TwoPoleTopK.Buf2
  require(posK > 0 && negK > 0, "posK and negK must be > 0")

  private def emptyBuf = Buf(new Array[Long](0), new Array[Double](0), 0, -1)
  override def zero: Buf2 = Buf2(emptyBuf, emptyBuf)
  override def reduce(b: Buf2, v: PolarScored): Buf2 =
    // reference-equal insert result = rejected row: return the Buf2
    // unchanged so the hot reject path stays zero-allocation (the
    // single-pole buffer's own guarantee, preserved through the pair)
    if (v.pos) {
      val nb = TopKByScore.insert(b.pos, v.id, v.sim, posK)
      if (nb eq b.pos) b else Buf2(nb, b.neg)
    } else {
      val nb = TopKByScore.insert(b.neg, v.id, v.sim, negK)
      if (nb eq b.neg) b else Buf2(b.pos, nb)
    }
  override def merge(a: Buf2, b: Buf2): Buf2 =
    Buf2(TopKByScore.mergeBufs(a.pos, b.pos, posK),
      TopKByScore.mergeBufs(a.neg, b.neg, negK))
  override def finish(b: Buf2): (Seq[TopHit], Seq[TopHit]) =
    (TopKByScore.finishSorted(b.pos), TopKByScore.finishSorted(b.neg))

  override def bufferEncoder: Encoder[Buf2] = Encoders.product[Buf2]
  override def outputEncoder: Encoder[(Seq[TopHit], Seq[TopHit])] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Seq[TopHit], Seq[TopHit])]()
}

object TwoPoleTopK {
  /** Positive-pole and negative-pole buffers, side by side. */
  case class Buf2(pos: TopKByScore.Buf, neg: TopKByScore.Buf)
}
