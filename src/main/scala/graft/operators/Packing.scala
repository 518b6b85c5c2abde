package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget bins (the
  * context windows of a pretraining batch) — the last transform before
  * tokenized examples ship to a trainer.
  *
  * Distributed shape: a global greedy pack is a sequential recurrence
  * (bin state depends on every earlier doc), so the scalable version
  * shards first — each shard packs independently with a per-partition
  * greedy loop, and bins are (shard, bin) pairs. That is the standard
  * large-corpus compromise: packing quality is within a doc of optimal
  * per shard, coordination is zero, and the recurrence never leaves a
  * partition. This is one of the rare genuinely imperative
  * per-partition kernels where typed `mapPartitions` is the right tool
  * (SURVEY §"custom operators", preference (d)) — the loop IS the
  * semantics, not a missed declarative form.
  *
  * Within a shard, docs pack in ascending id order (hash repartition is
  * deterministic and each partition sorts before the loop), so the
  * assignment is reproducible run to run for a fixed `shards`. Docs
  * larger than the budget get a bin of their own (`oversize` = 1) —
  * flagged, not dropped or split, so the caller can route them to a
  * chunking pass.
  */
object Packing {

  final case class PackedDoc(doc_id: Long, n_tokens: Long, shard: Int,
                             bin: Long, oversize: Int)

  /** (doc_id, n_tokens, shard, bin, oversize) — greedy first-close
    * packing of `tokenCol` into `budget`-token bins, `shards`-way
    * parallel. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, shards: Int = 200): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("_1"),
        col(tokenCol).cast("long").as("_2"))
      .as[(Long, Long)]
      .repartition(shards, col("_1"))
      .sortWithinPartitions("_1")
      .mapPartitions { it =>
        val shard = TaskContext.getPartitionId()
        var bin = 0L
        var fill = 0L
        it.map { case (id, n) =>
          // close the current bin when this doc would overflow it
          if (fill > 0 && fill + n > budget) { bin += 1; fill = 0L }
          fill += n
          PackedDoc(id, n, shard, bin, if (n > budget) 1 else 0)
        }
      }
      .toDF()
  }

  /** Bin-level fill accounting over [[packSequences]] output: one row
    * per (shard, bin) with its token fill and utilization — the gauge
    * a pipeline watches to size `budget` (chronic low utilization
    * means docs are long relative to the window; chronic 1.0 plus
    * oversize rows means they need chunking). */
  def packingStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("fill"),
        max(col("oversize")).as("has_oversize"))
      .withColumn("utilization",
        round(least(col("fill").cast("double") / budget.toDouble, lit(1.0)), 4))

  /** The chunking pass [[packSequences]]' oversize flag routes to:
    * split each document into ⌈n/budget⌉ budget-sized chunks (the last
    * chunk takes the remainder) — one explode over a generated index
    * range, pure column expressions, no shuffle. Re-pack the output
    * (chunk ids are (doc_id, chunk)) to place the tail chunks. */
  def chunkOversize(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val n = col(tokenCol).cast("long")
    df.select(col(idCol).cast("long").as("doc_id"), n.as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("chunk",
        // Column `/` is fractional even on longs — floor for the count
        explode(sequence(lit(0L), floor((col("n_tokens") - 1L) / budget))))
      .select(col("doc_id"), col("chunk"),
        least(lit(budget), col("n_tokens") - col("chunk") * budget)
          .as("chunk_tokens"))
  }
}
