package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: elementwise mean of `Array[Float]` embedding
  * vectors (the custom-UDAF exercise SURVEY §7.2 step 7 reserves for
  * the north-star extension).
  *
  * Why an Aggregator and not `posexplode → avg → re-collect`: the
  * explode form multiplies the shuffle by `dim` (every vector becomes
  * 64 (cell, i, v) rows) and needs TWO aggregations to reassemble
  * order. This buffer does one partial aggregation per partition and
  * shuffles exactly one (sums[dim], count) pair per (cell × partition)
  * — at 100 TB that's a 64× reduction in shuffled rows for centroid
  * computation. Partial aggregation (`reduce`) and combiner (`merge`)
  * semantics come from the Aggregator contract, so map-side combine is
  * automatic.
  */
class VectorAvg(dim: Int) extends Aggregator[Array[Float], VectorAvg.Buf, Array[Double]] {
  import VectorAvg.Buf

  override def zero: Buf = Buf(new Array[Double](dim), 0L)

  override def reduce(b: Buf, v: Array[Float]): Buf = {
    // fail fast on malformed rows — zero-padding a short vector would
    // silently drag centroid components toward 0
    require(v.length == dim,
      s"VectorAvg(dim=$dim) fed a vector of length ${v.length}")
    var i = 0
    while (i < dim) { b.sums(i) += v(i); i += 1 }
    b.copy(n = b.n + 1)
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    a.copy(n = a.n + b.n)
  }

  override def finish(b: Buf): Array[Double] =
    if (b.n == 0) new Array[Double](dim)
    else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object VectorAvg {
  case class Buf(sums: Array[Double], n: Long)
}
