package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, FloatType}

/** Product-quantization expressions ([[graft.operators.Pq]]): the
  * vector → m-byte code ENCODE sweep and the code → approx-cosine ADC
  * scoring sweep. Both are fused one-pass native expressions with the
  * trained tables riding the task closure — the same zero-shuffle
  * scan-and-project shape as [[LinearScoreExpr]] and [[BpeEncodeExpr]]
  * — because both ARE the 100 TB data path: encoding compresses the
  * corpus 32×, and ADC scoring reads only the m-byte codes, never the
  * float vectors.
  */

/** array<float|double> (length >= dim) → binary of m bytes: byte s is
  * the index of the L2-nearest entry of subspace s's codebook
  * (`books(s)(j)` = a dim/m-length centroid). Ties break to the LOWEST
  * index — the deterministic argmin [[graft.operators.Pq]] trains
  * with. Short or null-element vectors yield NULL (the
  * [[NearestCellExpr]] posture), never a garbage code. */
case class PqEncodeExpr(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  require(books.nonEmpty && books.forall(_.nonEmpty), "empty codebooks")
  private val m = books.length
  private val sub = books(0)(0).length
  private val k = books(0).length
  require(books.forall(b => b.length == k && b.forall(_.length == sub)),
    "codebooks must be rectangular: m × k × (dim/m)")
  require(k <= 256, s"a byte code addresses at most 256 centroids: k=$k")
  private val dim = m * sub

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.elementType(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got ${child.dataType.simpleString}")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pq_encode"
  override def nullable: Boolean = true

  @transient private lazy val isFloat: Boolean =
    VectorExprs.elementType(child.dataType).contains(FloatType)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return null
    val out = new Array[Byte](m)
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
        while (t < sub) {
          if (arr.isNullAt(base + t)) return null
          val x = (if (isFloat) arr.getFloat(base + t).toDouble
                   else arr.getDouble(base + t)) - c(t)
          d += x * x
          t += 1
        }
        if (d < bestD) { bestD = d; best = j } // strict: ties → lowest j
        j += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** binary PQ code (m bytes) → double approximate cosine against the
  * query the lookup tables were built for: `dotTab(s)(j)` =
  * dot(query subvector s, codebook entry j), `sqTab(s)(j)` = that
  * entry's squared norm — so the score is table lookups and adds, no
  * float vector ever touched (asymmetric distance computation, Jégou
  * et al.). Zero-norm reconstructions or queries score 0.0, matching
  * the brute-force cosine's convention. Codes of the wrong length
  * yield NULL — a code from a different (m, k) model must surface,
  * not silently mis-look-up. */
case class PqAdcExpr(child: Expression, dotTab: Array[Array[Double]],
                     sqTab: Array[Array[Double]], qNorm: Double)
    extends UnaryExpression with CodegenFallback {

  require(dotTab.nonEmpty && dotTab.length == sqTab.length,
    "dot/sq tables must cover the same subspaces")
  private val m = dotTab.length
  private val k = dotTab(0).length
  require(dotTab.forall(_.length == k) && sqTab.forall(_.length == k),
    "lookup tables must be rectangular: m × k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary PQ codes, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val code = v.asInstanceOf[Array[Byte]]
    if (code.length != m) return null
    var dot = 0.0
    var sq = 0.0
    var s = 0
    while (s < m) {
      val j = java.lang.Byte.toUnsignedInt(code(s))
      if (j >= k) return null
      dot += dotTab(s)(j)
      sq += sqTab(s)(j)
      s += 1
    }
    val denom = qNorm * math.sqrt(sq)
    if (denom > 0) dot / denom else 0.0
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (binary RESIDUAL PQ code, IVF cell id) → double approximate cosine
  * against the query — the classic IVFADC decomposition (Jégou et al.
  * 2011 §IV): codes quantize r = x − cent(cell), so the reconstruction
  * is x̂ = cent + r̂ and the cosine decomposes into per-CELL scalars
  * plus the same m table lookups as [[PqAdcExpr]]:
  *
  *   dot(q, x̂)  = q·cent                      (per cell, driver-side)
  *              + Σₛ dotTab(s)(code(s))        (q·r̂, global tables)
  *   ‖x̂‖²       = ‖cent‖²                     (per cell)
  *              + 2·Σₛ cDotTab(cell)(s)(code(s)) (cent·r̂, per probed cell)
  *              + Σₛ sqTab(s)(code(s))         (‖r̂‖², global)
  *
  * The per-cell tables cover only the PROBED cells (nProbe × m × k
  * doubles — driver state in the codebook class); a row whose cell is
  * not in the probe set scores NULL, surfacing a scan that was not
  * cell-pruned rather than silently mis-scoring it. Wrong-width codes
  * yield NULL, the [[PqAdcExpr]] posture. */
case class PqResidualAdcExpr(code: Expression, cell: Expression,
    dotTab: Array[Array[Double]], sqTab: Array[Array[Double]], qNorm: Double,
    cellIds: Array[Int], qDotC: Array[Double], cNorm2: Array[Double],
    cDotTab: Array[Array[Array[Double]]])
    extends BinaryExpression with CodegenFallback {

  require(dotTab.nonEmpty && dotTab.length == sqTab.length,
    "dot/sq tables must cover the same subspaces")
  private val m = dotTab.length
  private val k = dotTab(0).length
  require(dotTab.forall(_.length == k) && sqTab.forall(_.length == k),
    "lookup tables must be rectangular: m × k")
  require(cellIds.length == qDotC.length && cellIds.length == cNorm2.length &&
    cellIds.length == cDotTab.length && cDotTab.forall(t =>
      t.length == m && t.forall(_.length == k)),
    "per-cell tables must cover the probed cells × m × k")

  override def left: Expression = code
  override def right: Expression = cell

  override def checkInputDataTypes(): TypeCheckResult =
    if (code.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary PQ codes, got ${code.dataType.simpleString}")
    else if (cell.dataType != org.apache.spark.sql.types.IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an int cell id, got ${cell.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_residual_adc"
  override def nullable: Boolean = true

  @transient private lazy val cellIndex: Map[Int, Int] =
    cellIds.zipWithIndex.toMap

  override def nullSafeEval(codeV: Any, cellV: Any): Any = {
    val c = codeV.asInstanceOf[Array[Byte]]
    if (c.length != m) return null
    val ci = cellIndex.getOrElse(cellV.asInstanceOf[Int], -1)
    if (ci < 0) return null // not a probed cell: never silently mis-score
    val cdt = cDotTab(ci)
    var dot = qDotC(ci)
    var sq = cNorm2(ci)
    var s = 0
    while (s < m) {
      val j = java.lang.Byte.toUnsignedInt(c(s))
      if (j >= k) return null
      dot += dotTab(s)(j)
      sq += 2.0 * cdt(s)(j) + sqTab(s)(j)
      s += 1
    }
    val denom = qNorm * math.sqrt(math.max(0.0, sq))
    if (denom > 0) dot / denom else 0.0
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(code = newLeft, cell = newRight)
}

/** array<float|double> (length >= dim) → array<double> of length dim:
  * y = R·x, the OPQ rotation applied in-plan before subspace split
  * ([[graft.operators.Opq]]). One fused pass, rotation matrix in the
  * task closure (dim² doubles — 32 KB at dim=64, the codebook class
  * of broadcast state). Short or null-element vectors yield NULL,
  * the [[PqEncodeExpr]] posture. */
case class RotateVecExpr(child: Expression, rot: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  private val dim = rot.length
  require(dim > 0 && rot.forall(_.length == dim),
    "rotation must be a square dim × dim matrix")

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.elementType(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got ${child.dataType.simpleString}")
    }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_opq_rotate"
  override def nullable: Boolean = true

  @transient private lazy val isFloat: Boolean =
    VectorExprs.elementType(child.dataType).contains(FloatType)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return null
    val x = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (arr.isNullAt(j)) return null
      x(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    val y = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      val row = rot(i)
      var s = 0.0
      var t = 0
      while (t < dim) { s += row(t) * x(t); t += 1 }
      y(i) = s
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(y)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** binary PQ code (m bytes) → array<double> of length dim: the
  * codebook reconstruction ŷ (subspace s's centroid `books(s)(code(s))`
  * concatenated). Cosine against a reconstruction IS the ADC cosine
  * ([[PqAdcExpr]] computes the same quantity from per-query lookup
  * tables) — this form exists for BATCH query paths, where the ADC
  * tables cannot be built driver-side per query and the scoring rides
  * `decode → cosine` in-plan instead. Wrong-width or null codes yield
  * NULL, the [[PqAdcExpr]] posture. */
case class PqDecodeExpr(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  require(books.nonEmpty && books.forall(_.nonEmpty), "empty codebooks")
  private val m = books.length
  private val sub = books(0)(0).length
  private val k = books(0).length
  require(books.forall(b => b.length == k && b.forall(_.length == sub)),
    "codebooks must be rectangular: m × k × (dim/m)")
  private val dim = m * sub

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary PQ codes, got ${other.simpleString}")
    }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_decode"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val code = v.asInstanceOf[Array[Byte]]
    if (code.length != m) return null
    val y = new Array[Double](dim)
    var s = 0
    while (s < m) {
      val j = code(s) & 0xff
      if (j >= k) return null // foreign code from a bigger model
      val c = books(s)(j)
      var t = 0
      while (t < sub) { y(s * sub + t) = c(t); t += 1 }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(y)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
