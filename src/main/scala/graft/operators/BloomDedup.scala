package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.functions.{TextFunctions => T}

/** Bloom-filter membership dedup: drop batch rows whose normalized
  * text already exists in a (possibly huge) historical corpus, WITHOUT
  * joining against it. The corpus collapses to a bit array — built in
  * one pass with Spark's partial-aggregated sketch
  * (`df.stat.bloomFilter`, per-partition filters OR-merged on the
  * driver) — and the batch probe is then a map-side filter: ZERO
  * shuffle on either side at probe time, vs. an anti-join's shuffle of
  * both.
  *
  * When to use vs. the anti-join ([[Dedup.dropExactDups]] family) and
  * the persisted MinHash index: the bloom wins when the corpus key set
  * is huge but the FILTER fits executor memory — n·1.44·log2(1/fpp)
  * bits ≈ 1.2 GB per 10⁹ keys at 1% fpp — i.e. URL / doc-hash history
  * up to a few billion keys. Past that, fall back to the shuffled
  * anti-join (exact) or shard the filter. The price is one-sided
  * error: a false positive DROPS a genuinely new doc (never the
  * reverse), at the configured fpp; [[bloomDedupStats]] reports the
  * drop count so the loss is measured, not silent (the maxBucket
  * discipline). Determinism: Spark's sketch hashes with fixed seeds,
  * so the same corpus always yields the same filter — a planted
  * fixture's oracle is stable (`dd17_bloom_dedup`).
  */
object BloomDedup {

  /** The membership key: whitespace/case-normalized text (the exact-
    * dedup family's normalization, [[T.normalizeForDedup]]). */
  private def keyCol(text: Column): Column = T.normalizeForDedup(text)

  /** One-pass corpus sketch. `expectedItems` sizes the bit array —
    * overestimate freely (bits are cheap; undersizing inflates fpp). */
  def buildBloom(corpus: DataFrame, textCol: String,
                 expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    corpus.stat.bloomFilter(keyCol(col(textCol)), expectedItems, fpp)

  /** Serialized-once, deserialized-lazily-per-executor probe function:
    * the filter rides the closure as bytes (one copy per task
    * broadcast), reconstructed once per JVM — not per row. */
  private class Contains(bytes: Array[Byte])
      extends (String => Boolean) with Serializable {
    @transient private lazy val bf =
      BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    def apply(s: String): Boolean = s != null && bf.mightContain(s)
  }

  private def mightContain(bf: BloomFilter): Column => Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    // A UDF is justified here: BloomFilter.mightContain has no Column/
    // codegen equivalent — the sketch probe is the whole operator.
    val f = udf(new Contains(bos.toByteArray))
    (c: Column) => f(c)
  }

  /** Batch rows NOT present in the corpus filter (map-side, no
    * shuffle). False positives drop new docs at ≈ fpp. */
  def dropBloomMembers(batch: DataFrame, textCol: String,
                       bf: BloomFilter): DataFrame =
    batch.filter(!mightContain(bf)(keyCol(col(textCol))))

  /** Build-from-corpus + probe in one call. */
  def bloomDedup(batch: DataFrame, corpus: DataFrame, textCol: String,
                 expectedItems: Long, fpp: Double = 0.01): DataFrame =
    dropBloomMembers(batch, textCol, buildBloom(corpus, textCol, expectedItems, fpp))

  /** Accounting row: batch size, rows dropped by the filter, and the
    * filter's configured fpp (the expected share of those drops that
    * are collateral). */
  def bloomDedupStats(batch: DataFrame, corpus: DataFrame, textCol: String,
                      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val probe = mightContain(buildBloom(corpus, textCol, expectedItems, fpp))
    batch.select(probe(keyCol(col(textCol))).cast("int").as("_hit"))
      .agg(count(lit(1)).as("n_batch"),
        sum(col("_hit")).cast("long").as("n_dropped"),
        lit(fpp).as("fpp"))
  }
}
