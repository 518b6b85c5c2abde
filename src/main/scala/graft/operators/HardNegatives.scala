package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Hard-negative mining — the training-data op behind every modern
  * embedding/reranker model (DPR's mined negatives, Karpukhin et al.
  * 2020; SBERT triplet mining; the RocketQA/ANCE denoised-negative
  * loop): for each ANCHOR, the corpus items most similar to it with a
  * DIFFERENT label are the near-misses the contrastive loss learns the
  * most from, and the most similar SAME-label item is its positive.
  *
  * Scale shape: the anchor set is the small side (a training batch, a
  * query sample), so mining is the [[Ann.bruteForceTopKBatch]] shape
  * with the label predicate fused BEFORE the reduction — one corpus
  * scan serves every anchor, the per-anchor top-k is the bounded
  * [[TopKByScore]] Aggregator (k rows per anchor × partition cross the
  * shuffle, never the anchors × corpus cross product), and the label
  * filter prunes at scoring time, not after a wasted top-k. At corpus
  * scale the exact scan swaps for the IVF-pruned shortlist
  * ([[mineShortlisted]]), the same trade every ANN serving path makes:
  * scan fraction for recall, with the shortlist bounding how much the
  * label filter can starve k (a shortlist must exceed k by the
  * anchor-label's local density to fill all k slots — the spec gauges
  * it; full probe + covering shortlist is lossless and oracle-equal
  * to [[mineExact]]).
  */
object HardNegatives {


  /** One broadcast anchor frame: (aid, avec, albl). */
  private def anchorSide(anchors: DataFrame, aidCol: String,
                         avecCol: String, alabelCol: String): DataFrame =
    broadcast(anchors.select(col(aidCol).cast("long").as("_aid"),
      col(avecCol).as("_avec"), col(alabelCol).as("_albl")))

  /** The one-scan mining pass shared by both label polarities: the
    * [[Ann.bruteForceTopKBatch]] shape with a label predicate fused
    * before the bounded reduction. `ranked = true` also emits each
    * hit's 1-based rank — FREE from the aggregator ([[TopKByScore]]'s
    * finish is already best-first by (sim desc, id)), where a
    * `row_number()` window would re-shuffle and re-sort the
    * anchors × k rows just to recompute indices the buffer had. */
  private def mineWith(corpus: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, anchors: DataFrame, aidCol: String,
                       avecCol: String, alabelCol: String, k: Int,
                       sameLabel: Boolean, ranked: Boolean): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val labelPred =
      if (sameLabel) col(labelCol) === col("_albl") &&
        col(idCol).cast("long") =!= col("_aid") // positives exclude self
      else col(labelCol) =!= col("_albl")
    val scored = corpus
      .crossJoin(anchorSide(anchors, aidCol, avecCol, alabelCol))
      .filter(labelPred)
      .select(col("_aid").as("qid"), col(idCol).cast("long").as("id"),
        V.cosineSimilarityNative(col(vecCol), col("_avec")).as("sim"))
      .as[QueryScored]
    val agg = scored.groupByKey(_.qid)
      .agg(new TopKByScore(k).toColumn.name("hits"))
    val out =
      if (ranked)
        agg.flatMap { case (qid, hits) =>
          hits.iterator.zipWithIndex.map { case (h, i) =>
            (qid, h.id, h.sim, i + 1)
          }
        }.toDF("anchor_id", idCol, "sim", "rank")
      else
        agg.flatMap { case (qid, hits) => hits.map(h => (qid, h.id, h.sim)) }
          .toDF("anchor_id", idCol, "sim")
    out.orderBy("anchor_id", idCol)
  }

  /** Exact hard negatives: per anchor, the k most-similar corpus rows
    * whose label DIFFERS. Output (anchor_id, idCol, sim), rows ordered
    * (anchor_id, id); best-first recoverable by (sim desc, id). */
  def mineExact(corpus: DataFrame, idCol: String, vecCol: String,
                labelCol: String, anchors: DataFrame, aidCol: String,
                avecCol: String, alabelCol: String, k: Int): DataFrame =
    mineWith(corpus, idCol, vecCol, labelCol, anchors, aidCol, avecCol,
      alabelCol, k, sameLabel = false, ranked = false)

  /** Exact positives: per anchor, the k most-similar SAME-label rows,
    * the anchor itself excluded. */
  def minePositives(corpus: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, anchors: DataFrame, aidCol: String,
                    avecCol: String, alabelCol: String,
                    k: Int): DataFrame =
    mineWith(corpus, idCol, vecCol, labelCol, anchors, aidCol, avecCol,
      alabelCol, k, sameLabel = true, ranked = false)

  /** Contrastive TRIPLETS: (anchor_id, pos_id, pos_sim, neg_id,
    * neg_sim, neg_rank) — the single most-similar positive paired with
    * each of the k hardest negatives (rank 1 = hardest). Anchors with
    * no same-label neighbor produce no triplet (nothing to contrast).
    *
    * ONE corpus scan serves both polarities: each scored row carries
    * its label polarity and feeds a [[TwoPoleTopK]] two-buffer
    * aggregator (pos top-1, neg top-k) per anchor — the previous
    * two-`mineWith` form re-scanned the corpus for each side, 2× the
    * dominant IO. Ranks fall out of the aggregator's best-first
    * finish; the triplet rows assemble in the same flatMap, so there
    * is no post-aggregation join at all. */
  def triplets(corpus: DataFrame, idCol: String, vecCol: String,
               labelCol: String, anchors: DataFrame, aidCol: String,
               avecCol: String, alabelCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val isPos = col(labelCol) === col("_albl")
    val scored = corpus
      .crossJoin(anchorSide(anchors, aidCol, avecCol, alabelCol))
      // positives exclude self; every different-label row qualifies.
      // isNotNull guard: an unlabeled row makes isPos NULL, and
      // NULL || true = true would let it through with an undecidable
      // polarity (crashing the primitive-Boolean deserializer) — drop
      // it, as the old two-mineWith form did via its equi-predicates
      .filter(isPos.isNotNull &&
        (!isPos || col(idCol).cast("long") =!= col("_aid")))
      .select(col("_aid").as("qid"), col(idCol).cast("long").as("id"),
        V.cosineSimilarityNative(col(vecCol), col("_avec")).as("sim"),
        isPos.as("pos"))
      .as[PolarScored]
    scored.groupByKey(_.qid)
      .agg(new TwoPoleTopK(posK = 1, negK = k).toColumn.name("hits"))
      .flatMap { case (qid, (pos, neg)) =>
        pos.headOption.toSeq.flatMap { p =>
          neg.iterator.zipWithIndex.map { case (h, i) =>
            (qid, p.id, p.sim, h.id, h.sim, i + 1)
          }
        }
      }
      .toDF("anchor_id", "pos_id", "pos_sim", "neg_id", "neg_sim",
        "neg_rank")
      .orderBy("anchor_id", "neg_rank")
  }

  /** AUTO-SIZED serving path: exact hard negatives at IVF cost with NO
    * recall knob to mis-set. The static `nProbe` of [[mineShortlisted]]
    * is a trap (the bench gauge measured recall 0.492 at the cheap
    * setting — silently soft negatives); here the probe depth derives
    * from the data per anchor, with a GEOMETRIC CERTIFICATE instead of
    * a hope:
    *
    *  1. One bounded pass records each cell's angular radius θ_c =
    *     arccos(min member-to-centroid cosine) — at scale an
    *     index-build artifact next to the centroids themselves.
    *  2. Phase 1 probes each anchor's `initProbe` nearest cells and
    *     takes the running k-th negative similarity s_k.
    *  3. Any unprobed cell can only beat s_k if its best-possible
    *     member similarity bound(a,c) = cos(max(0, ∠(a,μ_c) − θ_c))
    *     (spherical triangle inequality) reaches s_k — phase 2 probes
    *     exactly those cells and only for the anchors that need them.
    *
    * Rows in never-probed cells satisfy sim ≤ bound < s_k, so the
    * final top-k EQUALS [[mineExact]] — recall 1.0 by construction,
    * gauged per round next to the probed-cell fraction it actually
    * paid. Anchors whose probed cells can't fill k slots (label
    * starvation) get the sentinel threshold −2, escalating them to a
    * full probe rather than silently under-filling. Driver state is
    * the nCells radii; both phases are cell-join-pruned corpus scans
    * and the phase-1 reduction is the bounded [[TopKByScore]]. */
  def mineAuto(corpus: DataFrame, idCol: String, vecCol: String,
               labelCol: String, anchors: DataFrame, aidCol: String,
               avecCol: String, alabelCol: String, k: Int,
               cents: Seq[Seq[Double]], initProbe: Int = 2): DataFrame =
    mineAutoWithDiag(corpus, idCol, vecCol, labelCol, anchors, aidCol,
      avecCol, alabelCol, k, cents, initProbe)._1

  /** [[mineAuto]] plus its probed (anchor, cell) pair table — the
    * diagnostic the probe-fraction gauge records. */
  private[graft] def mineAutoWithDiag(corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, anchors: DataFrame, aidCol: String,
      avecCol: String, alabelCol: String, k: Int, cents: Seq[Seq[Double]],
      initProbe: Int): (DataFrame, DataFrame) = {
    val (out, probed, _) = mineAutoCore(corpus, idCol, vecCol, labelCol,
      anchors, aidCol, avecCol, alabelCol, k, cents, initProbe,
      maxProbeFrac = 1.0)
    (out, probed)
  }

  /** BUDGETED [[mineAuto]]: caps the probed-cell fraction per anchor at
    * `maxProbeFrac` and REPORTS which anchors lost their certificate
    * instead of silently paying a full-scan probe on unprunable
    * geometry (an isotropic corpus certifies every cell — correct, but
    * at 100 TB the caller must get to CHOOSE between exactness and a
    * probe budget, with the incompleteness machine-readable either
    * way). Phase 2's certificate-qualified cells are ranked per anchor
    * by their bound (most promising first) and cut at the budget;
    * returns (results, status) where status is one row per anchor —
    * `certified = true` means every qualifying cell was probed and the
    * result EQUALS [[mineExact]] for that anchor; `false` means at
    * least one qualifying cell was cut, so its rows are a lower-recall
    * shortlist (the gauge pair hard_negative_budget_{recall,frac}
    * measures what the cut actually cost). maxProbeFrac = 1.0
    * degenerates to the exact path with every anchor certified. */
  def mineAutoBudgeted(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, anchors: DataFrame, aidCol: String,
      avecCol: String, alabelCol: String, k: Int, cents: Seq[Seq[Double]],
      initProbe: Int = 2, maxProbeFrac: Double = 1.0)
      : (DataFrame, DataFrame) = {
    val (out, _, status) = mineAutoCore(corpus, idCol, vecCol, labelCol,
      anchors, aidCol, avecCol, alabelCol, k, cents, initProbe,
      maxProbeFrac)
    (out, status)
  }

  private[graft] def mineAutoCore(corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, anchors: DataFrame, aidCol: String,
      avecCol: String, alabelCol: String, k: Int, cents: Seq[Seq[Double]],
      initProbe: Int, maxProbeFrac: Double)
      : (DataFrame, DataFrame, DataFrame) = {
    require(maxProbeFrac > 0.0 && maxProbeFrac <= 1.0,
      s"maxProbeFrac=$maxProbeFrac outside (0, 1]")
    require(cents.size >= 2, "mineAuto needs at least 2 cells")
    require(initProbe >= 1 && initProbe <= cents.size,
      s"initProbe=$initProbe outside 1..${cents.size}")
    val spark = corpus.sparkSession
    import spark.implicits._
    val withCell = corpus
      .withColumn("_cell", Ann.nearestCell(col(vecCol), cents))
    // cell angular radii: one bounded aggregate. The member-to-own-
    // centroid cosine indexes the per-cell cos array by the ASSIGNED
    // id rather than re-deriving it as max-over-cells — assignment
    // (NearestCellExpr) and cosine run different float paths, and an
    // ULP disagreement between their argmaxes would UNDERSTATE the
    // radius (an inflated bound could then prune a cell holding a
    // true top-k row); indexing by the assignment is exact-or-
    // conservative by construction
    val cosOwn = element_at(array(cents.map(c =>
      V.cosineSimilarityNative(col(vecCol), typedLit(c))): _*),
      col("_cell") + 1)
    val theta: Map[Int, Double] = withCell
      .groupBy(col("_cell")).agg(min(cosOwn).as("m")).collect()
      .map(r => r.getAs[Number]("_cell").intValue() ->
        math.acos(math.max(-1.0, math.min(1.0,
          r.getAs[Number]("m").doubleValue())))).toMap
    // anchors × cells (bounded): per-cell anchor-centroid cosine, the
    // probe rank, and the certificate bound
    val cellArr = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("c"),
        V.cosineSimilarityNative(col("_qvec"), typedLit(c)).as("cosac"),
        lit(theta.getOrElse(i, 0.0)).as("theta"))
    }: _*)
    val ex = anchors
      .select(col(aidCol).cast("long").as("_qid"), col(avecCol).as("_qvec"),
        col(alabelCol).as("_albl"))
      .select(col("_qid"), col("_qvec"), col("_albl"),
        explode(cellArr).as("e"))
      .select(col("_qid"), col("_qvec"), col("_albl"),
        col("e.c").as("_probe_cell"), col("e.cosac").as("_cosac"),
        col("e.theta").as("_theta"))
      .withColumn("_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("_qid")
          .orderBy(col("_cosac").desc, col("_probe_cell").desc)))
      .withColumn("_bound", cos(greatest(lit(0.0),
        acos(least(greatest(col("_cosac"), lit(-1.0)), lit(1.0)))
          - col("_theta"))))
    def scoreCells(pairs: DataFrame) = withCell
      .join(broadcast(pairs.select(col("_qid"), col("_qvec"), col("_albl"),
        col("_probe_cell"))), col("_cell") === col("_probe_cell"))
      .filter(col(labelCol) =!= col("_albl"))
      .select(col("_qid").as("qid"), col(idCol).cast("long").as("id"),
        V.cosineSimilarityNative(col(vecCol), col("_qvec")).as("sim"))
      .as[QueryScored]
    val p1 = ex.filter(col("_rank") <= initProbe)
    // phase-1 hits + per-anchor running threshold, MATERIALIZED once
    // (bounded: anchors × k rows) — both consumers below reuse it
    val agg1 = scoreCells(p1).groupByKey(_.qid)
      .agg(new TopKByScore(k).toColumn.name("hits"))
      .map { case (qid, hits) =>
        (qid, hits, if (hits.size >= k) hits.last.sim else -2.0)
      }
      .localCheckpoint()
    val thr = agg1.map { case (q, _, s) => (q, s) }.toDF("_tqid", "_sk")
    // escalation: unprobed cells whose certificate can still beat s_k;
    // anchors with NO phase-1 group (starved) coalesce to the sentinel
    val p2q = ex.filter(col("_rank") > initProbe)
      .join(broadcast(thr), col("_qid") === col("_tqid"), "left")
      // epsilon slack: _bound is a double-rounded acos/cos chain, so a
      // few-ULP under-rounding near the spherical-triangle equality
      // case could prune a cell whose true best sim ties/exceeds s_k.
      // Probing at >= s_k − 1e-9 keeps the certificate conservative
      // under FP while still pruning essentially everything
      .filter(col("_bound") >= coalesce(col("_sk"), lit(-2.0)) - lit(1e-9))
    // probe budget: rank the qualifying cells per anchor by bound
    // (most promising first — the cells that can move the top-k most)
    // and cut at maxProbeFrac × nCells total probes counting phase 1.
    // The window runs over the bounded anchors × cells table, never
    // the corpus. Anchors with a cut cell are the UNCERTIFIED set —
    // reported, not silently degraded.
    val cellBudget = math.max(0,
      math.floor(maxProbeFrac * cents.size).toInt - initProbe)
    val (p2, cutAnchors) =
      if (maxProbeFrac >= 1.0)
        (p2q, spark.emptyDataset[Long].toDF("_cut_qid"))
      else {
        val ranked = p2q.withColumn("_erank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("_qid")
            .orderBy(col("_bound").desc, col("_probe_cell"))))
          .localCheckpoint() // both branches below read it once
        (ranked.filter(col("_erank") <= cellBudget).drop("_erank"),
          ranked.filter(col("_erank") > cellBudget)
            .select(col("_qid").as("_cut_qid")).distinct())
      }
    val flat1 = agg1.flatMap { case (q, hits, _) =>
      hits.map(h => QueryScored(q, h.id, h.sim))
    }
    val out = flat1.union(scoreCells(p2)).groupByKey(_.qid)
      .agg(new TopKByScore(k).toColumn.name("hits"))
      .flatMap { case (qid, hits) => hits.map(h => (qid, h.id, h.sim)) }
      .toDF("anchor_id", idCol, "sim")
      .orderBy("anchor_id", idCol)
    val probedPairs = p1.select(col("_qid"), col("_probe_cell"))
      .union(p2.select(col("_qid"), col("_probe_cell")))
    // per-anchor certificate status: certified anchors got EVERY
    // qualifying cell probed (result = mineExact for them); anchors in
    // the cut set are the budget's honest cost report
    val status = anchors
      .select(col(aidCol).cast("long").as("anchor_id")).distinct()
      .join(cutAnchors.withColumn("_cut", lit(true)),
        col("anchor_id") === col("_cut_qid"), "left")
      .select(col("anchor_id"),
        coalesce(!col("_cut"), lit(true)).as("certified"))
    (out, probedPairs, status)
  }

  /** IVF-pruned mining for corpus scale: each anchor scores only its
    * nProbe nearest cells ([[Ann.ivfSearchBatch]]) down to a
    * `shortlist`-sized candidate set, labels join on the (tiny)
    * shortlist, and the k hardest mismatches survive. Recall contract:
    * lossy at serving settings exactly like every IVF path (gauged in
    * the spec); with nProbe = #cells and a shortlist covering the
    * corpus it is LOSSLESS and equals [[mineExact]] — the full-probe
    * oracle convention. `shortlist` must exceed k by the anchor
    * label's local density or slots go unfilled (reported, not
    * silently padded). */
  def mineShortlisted(corpus: DataFrame, idCol: String, vecCol: String,
                      labelCol: String, anchors: DataFrame, aidCol: String,
                      avecCol: String, alabelCol: String, k: Int,
                      dim: Int, cents: Seq[Seq[Double]], nProbe: Int,
                      shortlist: Int): DataFrame = {
    require(shortlist >= k,
      s"shortlist=$shortlist < k=$k can never fill the negative slots")
    val short = Ann.ivfSearchBatch(corpus, idCol, vecCol, dim,
      anchors.select(col(aidCol).as("_aid"), col(avecCol).as("_avec")),
      "_aid", "_avec", k = shortlist, cents = cents, nProbe = nProbe)
    val lbl = anchors.select(col(aidCol).cast("long").as("query_id"),
      col(alabelCol).as("_albl"))
    // corpus streams, the (anchors × shortlist)-sized candidate set
    // broadcasts: the label attach is map-side at any corpus size
    corpus.select(col(idCol), col(labelCol))
      .join(broadcast(short.join(broadcast(lbl), "query_id")), Seq(idCol))
      .filter(col(labelCol) =!= col("_albl"))
      .withColumn("_rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("sim").desc, col(idCol).asc)))
      .filter(col("_rk") <= k)
      .select(col("query_id").as("anchor_id"), col(idCol), col("sim"))
      .orderBy("anchor_id", idCol)
  }
}
