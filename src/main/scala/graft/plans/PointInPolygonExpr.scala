package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** Native Catalyst point-in-polygon expression — the codegen'd upgrade
  * of GeoFunctions.pointInPolygon's UDF form (SURVEY §4.3's "one
  * worthwhile custom rule" pairing: this expression + [[BoxPipRewrite]]).
  *
  * Why an Expression and not a UDF: (a) `doGenCode` emits a tight Java
  * loop inside whole-stage codegen — no boxing, no ClosureCleaner, no
  * function-call overhead per row; (b) as a first-class Catalyst node
  * it is visible to optimizer rules, which is what lets
  * [[BoxPipRewrite]] replace it with scan-pushable range predicates
  * when the ring is an axis-aligned box (readme.md:508-514 — the only
  * polygons the reference uses).
  *
  * Semantics: even-odd ray casting for general rings. When the ring IS
  * an axis-aligned box the expression evaluates closed-interval
  * containment instead (in BOTH eval and codegen), so the box→range
  * rewrite is exactly semantics-preserving, boundary points included.
  *
  * The ring ships as two literal coordinate vectors baked into the
  * generated code via reference objects — executors never look the
  * polygon up anywhere.
  */
case class PointInPolygonExpr(left: Expression, right: Expression,
                              ringLon: IndexedSeq[Double], ringLat: IndexedSeq[Double])
    extends BinaryExpression {

  require(ringLon.length == ringLat.length && ringLon.length >= 4,
    "ring must be a closed polygon: >= 4 (lon,lat) points, first == last")

  /** left = lon, right = lat (degrees). AbstractDataType is
    * private[sql], so the (double, double) contract is enforced via
    * checkInputDataTypes instead of ExpectsInputTypes. */
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (double, double), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_pip"

  /** Closed-interval bounds when the ring is an axis-aligned box. */
  @transient lazy val boxBounds: Option[(Double, Double, Double, Double)] =
    PointInPolygonExpr.axisAlignedBox(ringLon, ringLat)

  @transient private lazy val lonArr: Array[Double] = ringLon.toArray
  @transient private lazy val latArr: Array[Double] = ringLat.toArray

  override protected def nullSafeEval(lonV: Any, latV: Any): Any = {
    val lon = lonV.asInstanceOf[Double]
    val lat = latV.asInstanceOf[Double]
    boxBounds match {
      case Some((x0, x1, y0, y1)) =>
        lon >= x0 && lon <= x1 && lat >= y0 && lat <= y1
      case None => PointInPolygonExpr.rayCast(lonArr, latArr, lon, lat)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    boxBounds match {
      case Some((x0, x1, y0, y1)) =>
        nullSafeCodeGen(ctx, ev, (lon, lat) =>
          s"${ev.value} = $lon >= $x0 && $lon <= $x1 && $lat >= $y0 && $lat <= $y1;")
      case None =>
        val rl = ctx.addReferenceObj("ringLon", lonArr, "double[]")
        val rt = ctx.addReferenceObj("ringLat", latArr, "double[]")
        nullSafeCodeGen(ctx, ev, (lon, lat) => {
          val i = ctx.freshName("i")
          val j = ctx.freshName("j")
          val inside = ctx.freshName("inside")
          s"""
             |boolean $inside = false;
             |int $j = $rl.length - 1;
             |for (int $i = 0; $i < $rl.length; $i++) {
             |  if ((($rt[$i] > $lat) != ($rt[$j] > $lat)) &&
             |      ($lon < ($rl[$j] - $rl[$i]) * ($lat - $rt[$i]) / ($rt[$j] - $rt[$i]) + $rl[$i])) {
             |    $inside = !$inside;
             |  }
             |  $j = $i;
             |}
             |${ev.value} = $inside;
           """.stripMargin
        })
    }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PointInPolygonExpr {

  /** Even-odd ray cast (shared with the interpreted path). */
  def rayCast(ringLon: Array[Double], ringLat: Array[Double],
              lon: Double, lat: Double): Boolean = {
    var inside = false
    var j = ringLon.length - 1
    var i = 0
    while (i < ringLon.length) {
      if (((ringLat(i) > lat) != (ringLat(j) > lat)) &&
          (lon < (ringLon(j) - ringLon(i)) * (lat - ringLat(i)) /
            (ringLat(j) - ringLat(i)) + ringLon(i))) {
        inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Some(minLon, maxLon, minLat, maxLat) iff the closed ring traces an
    * axis-aligned rectangle: 5 points, first == last, every edge varies
    * in exactly one coordinate, and the corners span a full box. */
  def axisAlignedBox(ringLon: IndexedSeq[Double],
                     ringLat: IndexedSeq[Double]): Option[(Double, Double, Double, Double)] = {
    val n = ringLon.length
    if (n != 5 || ringLon(0) != ringLon(4) || ringLat(0) != ringLat(4)) return None
    val axisEdges = (0 until 4).forall { i =>
      val dLon = ringLon(i) != ringLon(i + 1)
      val dLat = ringLat(i) != ringLat(i + 1)
      dLon ^ dLat // each edge moves in exactly one axis
    }
    val lons = ringLon.take(4).distinct.sorted
    val lats = ringLat.take(4).distinct.sorted
    if (axisEdges && lons.length == 2 && lats.length == 2)
      Some((lons(0), lons(1), lats(0), lats(1)))
    else None
  }
}
