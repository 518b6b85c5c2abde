package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.storage.StorageLevel

import graft.plans.{HashedBowExpr, LinearScoreExpr}

/** Trainable quality classifier — the fastText-shaped linear filter
  * every large-scale pretraining pipeline runs ("does this doc look
  * like the curated seed set?"): hashed bag-of-words features,
  * logistic regression trained by full-batch gradient descent, and a
  * fused one-pass scoring expression for the corpus sweep.
  *
  * 100 TB posture, by phase:
  *  - TRAIN runs over a bounded LABELED SAMPLE (seed corpus vs random
  *    crawl — thousands to millions of docs, never the corpus):
  *    features are computed once by a native expression and cached;
  *    each gradient step is ONE distributed aggregation whose partial
  *    states are (dim+1)-double buffers — map-side combined, a few KB
  *    per partition on the wire, nothing resembling the data volume.
  *    Driver state is the weight vector itself (dim+1 doubles), the
  *    same bounded-model precedent as the IVF centroids and unigram
  *    vocab.
  *  - SCORE is the data path: [[graft.plans.LinearScoreExpr]] fuses
  *    tokenize→hash→dot→sigmoid into one native expression with the
  *    weights riding the task closure (a few KB), so the corpus sweep
  *    is a zero-shuffle scan-and-project — the same shape as the
  *    Gopher/repetition gauges it composes with.
  *
  * Determinism: the token→bucket map is a pure function (see
  * [[graft.plans.HashedBow]]), features are exact per doc, and the
  * gradient is a sum of doubles whose partition order can vary — so
  * trained weights are stable to ULP-level float noise across runs.
  * Predicted LABELS are reproducible whenever |w·x + b| clears that
  * noise, which a separable training set guarantees by a huge margin;
  * raw probabilities should be rounded before any exact comparison
  * (the declared query pins labels, not probabilities).
  */
object QualityClassifier {

  /** Trained model: `weights(b)` multiplies the averaged count of
    * bucket `b`; `seed` AND `ngrams` are part of the model identity
    * (scoring with a different hash seed or n-gram order than training
    * would silently permute / truncate the feature space). `ngrams` = 1
    * hashes unigrams; 2 adds word bigrams (the fastText default order
    * — the feature that separates what unigram multisets can't). */
  final case class Model(bias: Double, weights: Array[Double], seed: Int,
                         ngrams: Int = 1) {
    def dim: Int = weights.length

    /** P(label=1) of a text Column — null text scores as empty (class
      * prior), matching the langid null posture. */
    def prob(text: Column): Column =
      column(LinearScoreExpr(
        expression(coalesce(text, lit(""))), bias, weights, seed, ngrams))

    /** Literal spec for the SQL surface
      * (`graft_quality_score(text, '<spec>')`): "seed ngrams bias
      * w1 … wd", whitespace-separated — the [[graft.operators.Bpe
      * .mergesSpec]] pattern, so a model trained in Scala serves
      * SQL-only consumers as a pasted literal. Double.toString
      * round-trips exactly through parseDouble, so the SQL scorer is
      * bit-identical to this model. */
    def spec: String =
      (Seq(seed.toString, ngrams.toString, bias.toString) ++
        weights.map(_.toString)).mkString(" ")
  }

  /** Parse a [[Model.spec]] literal back into a model (the SQL
    * function's driver-side half). */
  def parseModelSpec(spec: String): Model = {
    val parts = spec.trim.split("\\s+").filter(_.nonEmpty)
    require(parts.length >= 4,
      s"model spec must be 'seed ngrams bias w1 [w2 …]', got ${parts.length} fields")
    Model(parts(2).toDouble, parts.drop(3).map(_.toDouble),
      parts(0).toInt, parts(1).toInt)
  }

  /** Hashed-BoW feature Column (training-path surface; scoring never
    * materializes features — see [[Model.prob]]). */
  def features(text: Column, dim: Int, seed: Int = 42, ngrams: Int = 1): Column =
    column(HashedBowExpr(expression(coalesce(text, lit(""))), dim, seed, ngrams))

  /** One gradient step's distributed state: grad(0) is the bias
    * slot, grad(i+1) pairs with weights(i); `loss` is the summed
    * log-loss of the CURRENT iterate (diagnostic, driver-side). */
  final case class Grad(grad: Array[Double], n: Long, loss: Double)

  /** Full-batch logistic gradient at the closure-captured iterate
    * (bias, w). Buffer = result shape; reduce/merge are elementwise —
    * the Aggregator contract gives map-side combine, so each
    * partition ships one (dim+1)-double buffer per step. */
  private final class GradAgg(bias: Double, w: Array[Double])
      extends Aggregator[(Double, Array[Double]), Grad, Grad] {
    override def zero: Grad = Grad(new Array[Double](w.length + 1), 0L, 0.0)

    override def reduce(b: Grad, row: (Double, Array[Double])): Grad = {
      val (y, x) = row
      require(x.length == w.length,
        s"feature dim ${x.length} != model dim ${w.length}")
      var z = bias
      var i = 0
      while (i < x.length) { z += w(i) * x(i); i += 1 }
      val p = 1.0 / (1.0 + math.exp(-z))
      val r = p - y
      b.grad(0) += r
      i = 0
      while (i < x.length) { b.grad(i + 1) += r * x(i); i += 1 }
      // clamp keeps the diagnostic finite when the model saturates
      val pc = math.min(math.max(p, 1e-12), 1.0 - 1e-12)
      Grad(b.grad, b.n + 1,
        b.loss - (y * math.log(pc) + (1.0 - y) * math.log(1.0 - pc)))
    }

    override def merge(a: Grad, b: Grad): Grad = {
      var i = 0
      while (i < a.grad.length) { a.grad(i) += b.grad(i); i += 1 }
      Grad(a.grad, a.n + b.n, a.loss + b.loss)
    }

    override def finish(g: Grad): Grad = g
    override def bufferEncoder: Encoder[Grad] = Encoders.product[Grad]
    override def outputEncoder: Encoder[Grad] = Encoders.product[Grad]
  }

  /** Train on `df`'s (`textCol`, `labelCol` ∈ {0,1}) sample. Returns
    * the model and the per-iteration mean log-loss (head = the
    * untrained model's loss — a caller asserting `loss.last <
    * loss.head` has a convergence gate for free). */
  def trainWithLoss(df: DataFrame, textCol: String, labelCol: String,
                    dim: Int = 256, iters: Int = 60, lr: Double = 5.0,
                    seed: Int = 42, ngrams: Int = 1): (Model, Seq[Double]) = {
    require(iters > 0 && lr > 0 && dim > 0, s"bad (iters=$iters, lr=$lr, dim=$dim)")
    val spark = df.sparkSession
    import spark.implicits._
    val featsDf = df
      .select(col(labelCol).cast("double").as("y"),
        features(col(textCol), dim, seed, ngrams).as("x"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Loud contract check before any gradient math: a null label would
    // die deep in the tuple encoder with an opaque NPE, and an
    // out-of-range label (a score column, a multi-class id) would
    // train a silently garbage model — the worst failure mode for the
    // thing that filters the corpus. One cheap agg over the cached
    // sample.
    val badLabels = featsDf
      .filter(col("y").isNull || !col("y").isin(0.0, 1.0)).count()
    if (badLabels > 0) {
      featsDf.unpersist(blocking = false)
      throw new IllegalArgumentException(
        s"labelCol '$labelCol' must be 0/1 and non-null: $badLabels bad rows")
    }
    val feats = featsDf.as[(Double, Array[Double])]
    try {
      var bias = 0.0
      val w = new Array[Double](dim)
      val losses = Seq.newBuilder[Double]
      var it = 0
      while (it < iters) {
        // w.clone: the closure must capture THIS iterate, not mutate
        // under in-flight tasks of a concurrent caller
        val g = feats.select(new GradAgg(bias, w.clone()).toColumn).head()
        require(g.n > 0, "empty training set")
        losses += g.loss / g.n
        bias -= lr * g.grad(0) / g.n
        var i = 0
        while (i < dim) { w(i) -= lr * g.grad(i + 1) / g.n; i += 1 }
        it += 1
      }
      (Model(bias, w, seed, ngrams), losses.result())
    } finally featsDf.unpersist(blocking = false)
  }

  def train(df: DataFrame, textCol: String, labelCol: String,
            dim: Int = 256, iters: Int = 60, lr: Double = 5.0,
            seed: Int = 42, ngrams: Int = 1): Model =
    trainWithLoss(df, textCol, labelCol, dim, iters, lr, seed, ngrams)._1

  /** Corpus sweep: adds P(label=1) as `probCol` — one fused native
    * expression, zero shuffle. */
  def score(df: DataFrame, textCol: String, model: Model,
            probCol: String = "quality_prob"): DataFrame =
    df.withColumn(probCol, model.prob(col(textCol)))

  /** Score + thresholded integer prediction (1 = positive class). */
  def classify(df: DataFrame, textCol: String, model: Model,
               threshold: Double = 0.5, probCol: String = "quality_prob",
               predCol: String = "pred"): DataFrame =
    score(df, textCol, model, probCol)
      .withColumn(predCol, when(col(probCol) >= threshold, 1).otherwise(0))
}
