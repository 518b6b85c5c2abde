package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared tokenize→hash contract for the quality classifier
  * ([[graft.operators.QualityClassifier]]): lowercase whitespace
  * tokens (the [[graft.functions.TextFunctions.tokens]] split,
  * lowercased like langid), each hashed to one of `dim` buckets with
  * `MurmurHash3.stringHash(tok, seed)` — a pure function of the
  * characters, so the SAME text maps to the SAME bucket on every
  * executor, every JVM, every run. Train and score MUST agree on this
  * mapping; putting it in one place is what guarantees they do.
  */
object HashedBow {
  def bucket(tok: String, dim: Int, seed: Int): Int =
    java.lang.Math.floorMod(scala.util.hashing.MurmurHash3.stringHash(tok, seed), dim)

  /** Length-averaged hashed counts: x(b) = count_b / nTokens. The
    * averaging (fastText's trick) keeps |w·x| independent of document
    * length, so one learning rate works for tweets and books alike. */
  def featurize(s: String, dim: Int, seed: Int): Array[Double] = {
    val x = new Array[Double](dim)
    val toks = s.trim.split("\\s+")
    var n = 0
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) n += 1
      i += 1
    }
    if (n == 0) return x
    val inc = 1.0 / n
    i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty)
        x(bucket(toks(i).toLowerCase(java.util.Locale.ROOT), dim, seed)) += inc
      i += 1
    }
    x
  }
}

/** text → array<double> hashed-bag-of-words features (TRAINING path:
  * computed once per labeled doc, cached across gradient iterations).
  * Native expression for the same reason as [[NfcNormalizeExpr]]: a
  * Scala UDF would pay SerDe per row, and the labeled sample can
  * still be millions of docs.
  */
case class HashedBowExpr(child: Expression, dim: Int, seed: Int)
    extends UnaryExpression with CodegenFallback {
  require(dim > 0, s"dim must be positive: $dim")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_hashed_bow"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      HashedBow.featurize(v.asInstanceOf[UTF8String].toString, dim, seed))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → double P(label=1) under a trained linear model (SCORING
  * path — the one that runs over the full 100 TB corpus). Fused:
  * tokenize, hash, dot-product against the broadcast-in-closure
  * weights, and sigmoid in ONE pass over the string, with no feature
  * array ever materialized — per row this allocates only the token
  * split. Empty/whitespace text scores sigmoid(bias) (the model's
  * class prior), never a crash.
  */
case class LinearScoreExpr(child: Expression, bias: Double,
                           weights: Array[Double], seed: Int)
    extends UnaryExpression with CodegenFallback {
  require(weights.nonEmpty, "empty weight vector")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_quality_score"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val toks = s.trim.split("\\s+")
    var n = 0
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) n += 1
      i += 1
    }
    var z = bias
    if (n > 0) {
      val inc = 1.0 / n
      var dot = 0.0
      i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty)
          dot += weights(HashedBow.bucket(
            toks(i).toLowerCase(java.util.Locale.ROOT), weights.length, seed)) * inc
        i += 1
      }
      z += dot
    }
    1.0 / (1.0 + math.exp(-z))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
