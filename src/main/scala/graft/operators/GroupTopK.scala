package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic top-k rows per group — "the 3 longest documents per
  * source", "a user's first N events" — WITHOUT the window-sort plan.
  * `row_number() OVER (PARTITION BY g ORDER BY s)` shuffles and sorts
  * EVERY row to the window exchange before discarding all but k per
  * group; this keys the bounded [[TopKByScoreAny]] buffer instead, so
  * at most k rows per (group × input partition) ever shuffle — the
  * `TakeOrderedAndProject` bound, per group (see the TopKByScore
  * scaladoc for the 100 TB arithmetic).
  */
object GroupTopK {

  /** Top-k (group, id, score) rows: score descending, ties to the
    * smaller id. The group column may be any type (keyed by its string
    * form); id must be long-castable, score double-castable. */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                   scoreCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("_g"),
        col(idCol).cast("long").as("_id"),
        col(scoreCol).cast("double").as("_s"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .agg(new TopKByScoreAny(k).toColumn.name("hits"))
      .flatMap { case (g, hits) => hits.map(h => (g, h.id, h.sim)) }
      .toDF(groupCol, idCol, "score")
  }
}
