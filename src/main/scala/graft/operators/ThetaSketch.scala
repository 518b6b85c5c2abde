package graft.operators

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Theta sketches — distinct-count estimates that support SET
  * OPERATIONS: union, intersection, and difference (A-not-B). This is
  * the capability HLL ([[SketchTable]]) fundamentally lacks: HLL
  * registers union cleanly but cannot intersect, so "how many users
  * did BOTH sources see?" over 100 TB needs either a distinct-join
  * (full shuffle of every id) or a theta sketch per side and a
  * driver-side intersection over a few KB.
  *
  * Same posture as the other sketch operators: per-group sketches are
  * a few KB of binary, persistable and mergeable; estimates are
  * deterministic for the given inserted id sets (the sketch hashes
  * ids, no RNG); exact results below the sketch's nominal capacity
  * (default lgK=12 ⇒ 4096 retained ids), ~2.5% relative error above
  * it. The a15 query gates exact-vs-sketch overlap per source pair.
  */
object ThetaSketch {

  /** Theta update-sketch over long ids, emitted as compact bytes.
    *
    * The buffer is the sketch's own UPDATABLE serialization, so
    * `reduce` is one heapify + one update + one serialize — the same
    * O(1)-sketch-ops-per-row shape as [[QuantileSketch.KllAgg]], with
    * no per-row Union/compact round trip (the earlier form rebuilt and
    * unioned a fresh sketch per row, which at scale would quietly cost
    * ~10× — [[sketchRows]] remains the mapPartitions hot path; this is
    * the composable-in-any-agg form). `merge` unions (its output is a
    * compact image — fine: merge results only meet other merge results
    * or `finish`, never `reduce`, and [[Sketches.heapifySketch]] reads
    * both image kinds). `finish` compacts so downstream wrap/estimate
    * always sees the compact form. */
  final class ThetaAgg(lgK: Int) extends Aggregator[Long, Array[Byte], Array[Byte]] {
    require(lgK >= 4 && lgK <= 26, s"bad lgK: $lgK")
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], id: Long): Array[Byte] = {
      val sk =
        if (b.isEmpty) UpdateSketch.builder().setLogNominalEntries(lgK).build()
        else UpdateSketch.heapify(Memory.wrap(b))
      sk.update(id)
      sk.toByteArray
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
      if (b1.isEmpty) b2
      else if (b2.isEmpty) b1
      else {
        val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
        u.union(Sketches.heapifySketch(Memory.wrap(b1)))
        u.union(Sketches.heapifySketch(Memory.wrap(b2)))
        u.getResult.toByteArray
      }
    }
    override def finish(b: Array[Byte]): Array[Byte] =
      if (b.isEmpty) b
      else Sketches.heapifySketch(Memory.wrap(b)).compact().toByteArray
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column form for groupBy.agg. */
  def thetaAgg(idCol: Column, lgK: Int = 12): Column =
    udaf(new ThetaAgg(lgK)).apply(idCol)

  private def wrap(b: Array[Byte]): CompactSketch =
    Sketches.wrapSketch(Memory.wrap(b)).compact()

  /** Distinct estimate of one sketch. */
  def estimate(b: Array[Byte]): Double =
    if (b.isEmpty) 0.0 else wrap(b).getEstimate

  /** Distinct estimate of the INTERSECTION of two sketches. */
  def intersectionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val it: Intersection = SetOperation.builder().buildIntersection()
    it.intersect(wrap(a), wrap(b)).getEstimate
  }

  /** Distinct estimate of A \ B (ids in a's set but not b's). */
  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.isEmpty) return 0.0
    if (b.isEmpty) return estimate(a)
    SetOperation.builder().buildANotB().aNotB(wrap(a), wrap(b)).getEstimate
  }

  val estimateUdf = udf((b: Array[Byte]) => estimate(b))
  val intersectionUdf =
    udf((a: Array[Byte], b: Array[Byte]) => intersectionEstimate(a, b))
  val aNotBUdf = udf((a: Array[Byte], b: Array[Byte]) => aNotBEstimate(a, b))

  /** One theta sketch of `idCol` per `keyCol` group — the HOT-PATH
    * form: one MUTABLE UpdateSketch per (key × partition) inside
    * `mapPartitions` (no per-row serialize round-trip — that's what
    * makes [[ThetaAgg]] the composable-but-slow form), then the
    * per-partition compact sketches shuffle (a few KB per key per
    * partition, the map-side-combine shape) and union per key. */
  def sketchRows(df: DataFrame, keyCol: String, idCol: String,
                 lgK: Int = 12): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(idCol).cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val sks = scala.collection.mutable.HashMap.empty[String, UpdateSketch]
        it.foreach { case (k, id) =>
          sks.getOrElseUpdate(k,
            UpdateSketch.builder().setLogNominalEntries(lgK).build()).update(id)
        }
        sks.iterator.map { case (k, sk) => (k, sk.compact().toByteArray) }
      }
      .groupByKey(_._1)
      .mapGroups { (key, rows) =>
        val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
        rows.foreach(r => u.union(Sketches.wrapSketch(Memory.wrap(r._2))))
        (key, u.getResult.toByteArray)
      }
      .toDF("key", "sketch")
  }
}
