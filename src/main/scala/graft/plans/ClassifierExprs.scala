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

  /** Lowercased non-empty tokens, in document order (bigrams need the
    * order, not just the multiset). */
  private[plans] def cleanTokens(s: String): Array[String] = {
    val raw = s.trim.split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) out += raw(i).toLowerCase(java.util.Locale.ROOT)
      i += 1
    }
    out.toArray
  }

  /** A word-BIGRAM feature is the space-joined token pair — tokens come
    * from a whitespace split, so the space is injective (no unigram
    * can collide with a bigram's string except through the hash, which
    * is the point of hashing). */
  private[plans] def bigram(a: String, b: String): String = a + " " + b

  /** Total gram count of an n-token doc at this n-gram order. */
  private[plans] def totalGrams(n: Int, wordNgrams: Int): Int =
    n + (if (wordNgrams >= 2 && n >= 2) n - 1 else 0)

  def featurize(s: String, dim: Int, seed: Int): Array[Double] =
    featurize(s, dim, seed, 1)

  /** Length-averaged hashed gram counts: x(b) = count_b / nGrams. The
    * averaging (fastText's trick) keeps |w·x| independent of document
    * length, so one learning rate works for tweets and books alike.
    * `wordNgrams` = 1 hashes unigrams only; 2 adds word bigrams (the
    * fastText default) — the feature that separates classes unigram
    * multisets can't ("new york" vs "york new"). Orders above 2 are
    * rejected: they explode the hashed space without a measured win. */
  def featurize(s: String, dim: Int, seed: Int, wordNgrams: Int): Array[Double] = {
    require(wordNgrams == 1 || wordNgrams == 2,
      s"wordNgrams must be 1 or 2: $wordNgrams")
    val x = new Array[Double](dim)
    val toks = cleanTokens(s)
    val total = totalGrams(toks.length, wordNgrams)
    if (total == 0) return x
    val inc = 1.0 / total
    var i = 0
    while (i < toks.length) {
      x(bucket(toks(i), dim, seed)) += inc
      i += 1
    }
    if (wordNgrams >= 2) {
      i = 0
      while (i < toks.length - 1) {
        x(bucket(bigram(toks(i), toks(i + 1)), dim, seed)) += inc
        i += 1
      }
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
case class HashedBowExpr(child: Expression, dim: Int, seed: Int,
                         wordNgrams: Int = 1)
    extends UnaryExpression with CodegenFallback {
  require(dim > 0, s"dim must be positive: $dim")
  require(wordNgrams == 1 || wordNgrams == 2,
    s"wordNgrams must be 1 or 2: $wordNgrams")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_hashed_bow"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      HashedBow.featurize(v.asInstanceOf[UTF8String].toString, dim, seed, wordNgrams))

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
                           weights: Array[Double], seed: Int,
                           wordNgrams: Int = 1)
    extends UnaryExpression with CodegenFallback {
  require(weights.nonEmpty, "empty weight vector")
  require(wordNgrams == 1 || wordNgrams == 2,
    s"wordNgrams must be 1 or 2: $wordNgrams")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_quality_score"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val toks = HashedBow.cleanTokens(s)
    val total = HashedBow.totalGrams(toks.length, wordNgrams)
    var z = bias
    if (total > 0) {
      val inc = 1.0 / total
      var dot = 0.0
      var i = 0
      while (i < toks.length) {
        dot += weights(HashedBow.bucket(toks(i), weights.length, seed)) * inc
        i += 1
      }
      if (wordNgrams >= 2) {
        i = 0
        while (i < toks.length - 1) {
          dot += weights(HashedBow.bucket(
            HashedBow.bigram(toks(i), toks(i + 1)), weights.length, seed)) * inc
          i += 1
        }
      }
      z += dot
    }
    1.0 / (1.0 + math.exp(-z))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
