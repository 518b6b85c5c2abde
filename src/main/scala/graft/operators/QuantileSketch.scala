package graft.operators

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable QUANTILE sketches (Apache DataSketches KLL) — the
  * percentile twin of [[SketchTable]]'s HLL distinct counts: per-key
  * per-batch sketches persist as a few-KB binary row each, and any
  * later "p50/p99 so far" is a MERGE of stored sketches — never a
  * re-scan and never the full-value-set state an exact quantile
  * needs. KLL guarantees ~1.7% rank error at the default k=200,
  * independent of n.
  *
  * The Spark surface is a custom typed [[Aggregator]] whose buffer is
  * the sketch's own serialized form (a few hundred bytes; the
  * per-row heapify/update/serialize round-trip is the demonstrative
  * simple form — a hot path would run `mapPartitions` with one
  * mutable sketch per partition and reduce the per-partition
  * results, the same physical shape with the same outputs).
  * `approx_percentile` covers the one-shot case (a11); this is the
  * PERSISTABLE form — the output bytes round-trip through parquet
  * and merge later, which the built-in cannot do.
  */
object QuantileSketch {

  /** KLL(k) over a double column, emitted as serialized sketch bytes. */
  final class KllAgg(k: Int) extends Aggregator[Double, Array[Byte], Array[Byte]] {
    require(k >= 8, s"k too small for KLL: $k")
    private def heapify(b: Array[Byte]): KllDoublesSketch =
      if (b.isEmpty) KllDoublesSketch.newHeapInstance(k)
      else KllDoublesSketch.heapify(Memory.wrap(b))
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], v: Double): Array[Byte] = {
      val sk = heapify(b); sk.update(v); sk.toByteArray
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
      if (b1.isEmpty) b2
      else if (b2.isEmpty) b1
      else { val sk = heapify(b1); sk.merge(heapify(b2)); sk.toByteArray }
    }
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column form: `kllAgg(k)` usable inside any groupBy.agg. */
  def kllAgg(valCol: Column, k: Int = 200): Column =
    udaf(new KllAgg(k)).apply(valCol)

  /** Rank-`q` estimate off serialized sketch bytes (driver or
    * executor side). Null or empty bytes — a left-join miss, or a key
    * whose stored rows were all empty buffers — yield NaN rather than
    * an NPE/parse error, so a sparse sketch table stays queryable.
    * INCLUSIVE rank semantics — matches DuckDB/Spark `percentile`'s
    * step behavior on discrete data closely enough for the tolerance
    * gates used in the queries. */
  def estimateQuantile(bytes: Array[Byte], q: Double): Double =
    if (bytes == null || bytes.isEmpty) Double.NaN
    else KllDoublesSketch.heapify(Memory.wrap(bytes)).getQuantile(q)

  private val quantileUdf =
    udf((b: Array[Byte], q: Double) => estimateQuantile(b, q))

  /** Column form of [[estimateQuantile]] (a scalar over a few hundred
    * bytes — UDF is fine off the hot path; the sketch itself is the
    * data-path object). */
  def quantileOf(sketch: Column, q: Double): Column =
    quantileUdf(sketch, lit(q))

  /** Per-key sketch rows of one batch — the persistable unit (same
    * batch-partitioned lifecycle as [[SketchTable]]). Hot-path form:
    * one MUTABLE KLL per (key × partition) in `mapPartitions` (no
    * per-row serialize round-trip — [[KllAgg]] stays as the
    * composable-in-any-agg form), then per-partition sketches merge
    * per key — the map-side-combine shape, a few hundred bytes per
    * key per partition on the shuffle. */
  def sketchRows(df: DataFrame, keyCol: String, valCol: String,
                 k: Int = 200): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(valCol).cast("double"))
      .as[(String, Double)]
      .mapPartitions { it =>
        val sks = scala.collection.mutable.HashMap.empty[String, KllDoublesSketch]
        it.foreach { case (key, v) =>
          sks.getOrElseUpdate(key, KllDoublesSketch.newHeapInstance(k)).update(v)
        }
        sks.iterator.map { case (key, sk) => (key, sk.toByteArray) }
      }
      .groupByKey(_._1)
      .mapGroups { (key, rows) =>
        val sk = KllDoublesSketch.newHeapInstance(k)
        rows.foreach(r =>
          sk.merge(KllDoublesSketch.heapify(Memory.wrap(r._2))))
        (key, sk.toByteArray)
      }
      .toDF("key", "sketch")
  }

  /** Merge stored per-batch sketch rows back to one sketch per key. */
  def mergeSketches(stored: DataFrame): DataFrame = {
    val spark = stored.sparkSession
    import spark.implicits._
    stored.select(col("key").cast("string"), col("sketch"))
      .as[(String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (key, rows) =>
        val merged = rows.map(_._2).filter(_.nonEmpty).reduceOption { (a, b) =>
          val sk = KllDoublesSketch.heapify(Memory.wrap(a))
          sk.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
          sk.toByteArray
        }
        (key, merged.getOrElse(Array.emptyByteArray))
      }
      .toDF("key", "sketch")
  }
}
