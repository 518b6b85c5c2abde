package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.functions.{TextFunctions => T}

/** Benchmark decontamination by N-GRAM COLLISION: find (and remove)
  * training documents that share a word n-gram with an
  * evaluation/benchmark set — the published train-test-overlap
  * procedure (Brown et al. 2020, "Language Models are Few-Shot
  * Learners", appendix C: 13-gram overlap; Chowdhery et al. 2022 PaLM
  * §8 and Touvron et al. 2023 use the same n-gram-collision shape at
  * n=8..13). Without it, eval scores measure memorization.
  *
  * Complement, not duplicate, of [[Dedup.decontaminate]]: that one is
  * MinHash-Jaccard SIMILARITY decontamination — it catches training
  * docs that are near-duplicates of a whole benchmark document (the
  * pl5 prep stage). This one catches a verbatim answer string embedded
  * in an otherwise-unrelated document, which doc-level Jaccard at any
  * sane threshold cannot see (8 shared tokens in a 10k-token doc is
  * Jaccard ≈ 0). A thorough pipeline runs both.
  *
  * Scale shape (the asymmetry IS the design): the corpus is huge
  * (100 TB) but the eval side is small by premise — a benchmark is at
  * most a few million n-grams. So:
  *
  *   - Stage 1, SCREEN (zero shuffle): the eval n-gram set collapses to
  *     a bloom filter (one partial-aggregated pass over the tiny side),
  *     and every corpus document is probed map-side — one UDF call per
  *     row over its distinct-shingle array. A bloom has NO false
  *     negatives, so the survivors are a strict superset of the truly
  *     contaminated docs. fpp is a PER-GRAM rate, and a clean doc
  *     false-alarms if ANY of its grams does — the doc-level screen
  *     leak is ≈ n_grams·fpp (measured by the
  *     decontam_screen_frac − decontam_confirmed_frac gauge pair), so
  *     size fpp ≪ 1/avg_grams_per_doc. The 1e-4 default leaks ~1% of
  *     clean 100-gram docs into stage 2 at ~19 bits per eval gram;
  *     bits are cheap on the tiny side, collateral explodes aren't.
  *   - Stage 2, CONFIRM (exact, tiny): only the screened candidates
  *     explode their n-grams and broadcast-join the exact eval n-gram
  *     set. The expensive explode+join runs over the bloom-flagged
  *     fraction, not the corpus — and the final answer is EXACT, so the
  *     same SQL oracle gates both the screened and unscreened paths.
  *
  * Removal at 100 TB is then a metadata operation, not a rewrite-the-
  * world scan: the contaminated-id table is tiny — persist it and apply
  * with [[Snapshot.deleteMatching]] (keyed copy-on-write) on a governed
  * corpus, or broadcast anti-join on a raw one ([[decontaminate]]).
  *
  * Matching normalizes both sides with [[T.normalizeForDedup]]
  * (lowercase, collapse whitespace) before shingling — the same
  * normalization the exact-dedup family uses, so "The Quick  Brown" and
  * "the quick brown" collide, as the published procedures intend.
  * Documents shorter than n tokens contribute their full token sequence
  * as one under-length gram ([[Dedup.shingles]]' greatest(...,1)
  * convention) — a short eval answer string still screens.
  */
object Decontaminate {

  /** Normalized distinct word n-grams — the collision key. */
  private[graft] def grams(text: Column, n: Int): Column =
    Dedup.shingles(T.normalizeForDedup(text), n)

  /** Distinct n-grams of the eval set, one row per gram. Small by
    * premise; every downstream use broadcasts or sketches it. */
  def evalNgrams(evals: DataFrame, evalTextCol: String, n: Int): DataFrame =
    evals.select(explode(grams(col(evalTextCol), n)).as("gram")).distinct()

  /** Serialized-once, deserialized-lazily-per-executor probe (the
    * [[BloomDedup]] pattern): the filter rides the closure as bytes,
    * reconstructed once per JVM. Takes the whole shingle ARRAY — Spark
    * disallows UDF calls inside higher-order-function lambdas, and one
    * call per row beats one per gram anyway. */
  private class AnyHit(bytes: Array[Byte])
      extends (scala.collection.Seq[String] => Boolean) with Serializable {
    @transient private lazy val bf =
      BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    def apply(gs: scala.collection.Seq[String]): Boolean =
      gs != null && gs.exists(g => g != null && bf.mightContain(g))
  }

  private[graft] def anyHitProbe(bf: BloomFilter): Column => Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val f = udf(new AnyHit(bos.toByteArray))
    (c: Column) => f(c)
  }

  /** Build the bloom screen over an (already materialized-or-cached)
    * eval gram table: size check, one sketch pass, probe closure. The
    * batch entry points call this per invocation; the STREAMING loop
    * ([[graft.streaming.Windows.streamingDecontaminate]]) calls it once
    * at stream start and reuses the probe every micro-batch. */
  private[graft] def buildScreen(eg: DataFrame, fpp: Double,
                                 maxEvalNgrams: Long): Column => Column = {
    val nEval = eg.count()
    require(nEval <= maxEvalNgrams,
      s"eval set produced $nEval distinct n-grams > maxEvalNgrams=" +
        s"$maxEvalNgrams; decontamination broadcasts the eval side — " +
        "raise the cap only if executors hold it, or swap the sides")
    anyHitProbe(eg.stat.bloomFilter(col("gram"), math.max(nEval, 1L), fpp))
  }

  /** Eval-side preparation shared by the public entry points: the
    * distinct gram table, its exact count (also the bloom's sizing and
    * the boundedness gate), and the screen probe. The gram table is
    * deliberately NOT cached — it is tiny by premise and recomputing it
    * for the confirm join is cheaper than owning cache state in a
    * long-lived session (the qc3 lesson). `maxEvalNgrams` is the loud
    * guard on the "eval side is small" premise — a caller who feeds the
    * corpus in as `evals` gets an error naming the knob, not an
    * executor OOM. */
  private def prepared(evals: DataFrame, evalTextCol: String, n: Int,
                       fpp: Double, maxEvalNgrams: Long)
      : (DataFrame, Column => Column) = {
    val eg = evalNgrams(evals, evalTextCol, n)
    (eg, buildScreen(eg, fpp, maxEvalNgrams))
  }

  /** The screen→confirm hit table for one document frame against a
    * PREPARED eval side (gram table + probe): (idCol, n_hits), only
    * contaminated docs appear. Shared by the batch report and the
    * per-micro-batch streaming loop. */
  private[graft] def hitsAgainst(docs: DataFrame, idCol: String,
                                 textCol: String, eg: DataFrame,
                                 probe: Column => Column,
                                 n: Int): DataFrame =
    docs.select(col(idCol), grams(col(textCol), n).as("_grams"))
      .filter(probe(col("_grams")))
      .select(col(idCol), explode(col("_grams")).as("gram"))
      .join(broadcast(eg), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))

  /** Contaminated documents with evidence: (idCol, n_hits) where
    * n_hits = how many of the doc's DISTINCT n-grams appear in the eval
    * set. Only contaminated docs appear (n_hits >= 1). */
  def contaminationReport(docs: DataFrame, idCol: String, textCol: String,
                          evals: DataFrame, evalTextCol: String,
                          n: Int = 8, fpp: Double = 1e-4,
                          maxEvalNgrams: Long = 50L * 1000 * 1000)
      : DataFrame = {
    val (eg, probe) = prepared(evals, evalTextCol, n, fpp, maxEvalNgrams)
    hitsAgainst(docs, idCol, textCol, eg, probe, n)
  }

  /** Just the contaminated ids (exact). */
  def contaminatedIds(docs: DataFrame, idCol: String, textCol: String,
                      evals: DataFrame, evalTextCol: String,
                      n: Int = 8, fpp: Double = 1e-4,
                      maxEvalNgrams: Long = 50L * 1000 * 1000): DataFrame =
    contaminationReport(docs, idCol, textCol, evals, evalTextCol, n, fpp,
      maxEvalNgrams).select(col(idCol))

  /** The cleaned corpus: `docs` minus every contaminated row, exact.
    * The contaminated-id side is tiny (it was bloom-screened then
    * confirmed), so the anti-join broadcasts — the removal pass is one
    * map-side scan. On a snapshot-governed corpus prefer
    * [[Snapshot.deleteMatching]] with [[contaminatedIds]] as the doomed
    * keys: same semantics, but only affected files rewrite. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    evals: DataFrame, evalTextCol: String,
                    n: Int = 8, fpp: Double = 1e-4,
                    maxEvalNgrams: Long = 50L * 1000 * 1000): DataFrame = {
    val bad = contaminatedIds(docs, idCol, textCol, evals, evalTextCol,
      n, fpp, maxEvalNgrams)
    docs.join(broadcast(bad), Seq(idCol), "left_anti")
  }

  /** The report read from the benchmark's side: for each eval row,
    * how many corpus documents collide with it — the "which benchmarks
    * are burned" table a lab publishes next to its eval scores.
    * (eval id, n_docs); only leaked eval rows appear. */
  def evalLeakage(docs: DataFrame, docIdCol: String, textCol: String,
                  evals: DataFrame, evalIdCol: String, evalTextCol: String,
                  n: Int = 8, fpp: Double = 1e-4,
                  maxEvalNgrams: Long = 50L * 1000 * 1000): DataFrame = {
    val egById = evals
      .select(col(evalIdCol), explode(grams(col(evalTextCol), n)).as("gram"))
      .distinct()
    // the structure that actually BROADCASTS below is the (eval id,
    // gram) PAIR table — larger than the distinct-gram set when grams
    // recur across eval rows — so the loud guard covers it directly,
    // same knob, before the distinct-gram screen sizing
    val nPairs = egById.count()
    require(nPairs <= maxEvalNgrams,
      s"eval set produced $nPairs (eval id, n-gram) pairs > " +
        s"maxEvalNgrams=$maxEvalNgrams; evalLeakage broadcasts the " +
        "pair table — raise the cap only if executors hold it")
    // guard + sketch via the shared screen builder, sized on DISTINCT
    // grams (what the bloom actually inserts)
    val probe = buildScreen(egById.select(col("gram")).distinct(), fpp,
      maxEvalNgrams)
    val cands = docs
      .select(col(docIdCol), grams(col(textCol), n).as("_grams"))
      .filter(probe(col("_grams")))
    cands
      .select(col(docIdCol), explode(col("_grams")).as("gram"))
      .join(broadcast(egById), "gram")
      .groupBy(col(evalIdCol))
      .agg(countDistinct(col(docIdCol)).as("n_docs"))
  }
}
