package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned MODEL REGISTRY on the manifest family — the artifact side
  * of the training pipeline: every trainable in the repo serializes to
  * a spec string ([[QualityClassifier.Model.spec]], [[Bpe.mergesSpec]],
  * the sampling/id-hash seeds), and a registry is just a
  * batch-partitioned table of (name, kind, spec) rows whose commits go
  * through [[Snapshot]] — so model publication inherits the exact
  * machinery data gets: atomic publish (a half-written model is never
  * visible), exactly-once registration under retried training jobs
  * (run id = batch id), TIME TRAVEL (score tonight's batch with last
  * week's model by pinning its manifest version), retention of old
  * runs, and vacuum.
  *
  * Scale posture: a registry is metadata — one tiny row per
  * registration, read once per scoring job and carried in the closure.
  * The models themselves stay strings by design (the repo's fused
  * scoring expressions take literal specs), so "load the model" is a
  * manifest read + one filter, never a join on the data path.
  */
object ModelRegistry {

  /** Register `spec` under `name` as training run `runId`. First
    * registration creates + snapshot-enables the registry; later ones
    * commit through [[Snapshot.stagedAppend]] — a redelivered runId is
    * a no-op (exactly-once under at-least-once training-job retries).
    * Returns whether this call actually registered. */
  def register(spark: SparkSession, path: String, name: String,
               kind: String, spec: String, runId: Long): Boolean = {
    import spark.implicits._
    require(runId >= 0, s"run ids start at 0: $runId")
    val row = Seq((name, kind, spec)).toDF("name", "kind", "spec")
    if (!Snapshot.isEnabled(spark, path)) {
      row.write.mode("overwrite").parquet(s"$path/batch_id=$runId")
      Snapshot.enable(spark, path)
      true
    } else Snapshot.stagedAppend(spark, path, runId) {
      row.write.mode("overwrite").parquet(s"$path/batch_id=$runId")
    }
  }

  /** All registrations of `name`, newest run first. */
  def history(spark: SparkSession, path: String, name: String): DataFrame =
    Snapshot.read(spark, path).filter(col("name") === name)
      .orderBy(col("batch_id").cast("long").desc)

  /** The newest live spec for `name` — what a scoring job loads. Loud
    * when absent: scoring with a silently-missing model is a pipeline
    * bug. */
  def latestSpec(spark: SparkSession, path: String, name: String): String =
    history(spark, path, name).select("spec").head(1).headOption
      .map(_.getString(0))
      .getOrElse(throw new IllegalStateException(
        s"no model '$name' registered under $path"))

  /** The spec `name` had at manifest `version` — model time travel,
    * with the same expiry contract as any pinned reader ([[Snapshot
    * .readAt]]): vacuumed runs fail loudly. */
  def specAt(spark: SparkSession, path: String, name: String,
             version: Long): String =
    Snapshot.readAt(spark, path, version).filter(col("name") === name)
      .orderBy(col("batch_id").cast("long").desc)
      .select("spec").head(1).headOption
      .map(_.getString(0))
      .getOrElse(throw new IllegalStateException(
        s"no model '$name' in manifest v$version of $path"))
}
