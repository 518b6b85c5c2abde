package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (the 100 TB safety valves the builder
  * prompt calls out: "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join splitting (on by default in GraftSession) handles
  * skew it can SEE — post-shuffle partition sizes. Salting is the
  * static complement for keys known to be pathological (the "null key"
  * or "empty string" giants of real pipelines): it rewrites the join
  * so a hot key's rows spread across `salts` shuffle partitions
  * instead of hammering one.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side's rows salted
    * across `salts` sub-keys and the small side replicated once per
    * salt. Result-identical to `big.join(small, key)`: each big row
    * carries exactly one salt, each small row exists for every salt,
    * so every matching pair appears exactly once.
    *
    * Shuffle math: the hot key's big-side rows divide over `salts`
    * partitions; the small side grows ×`salts` (fine — it's small; if
    * it weren't, broadcast or AQE is the right tool instead).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full outer would emit each UNMATCHED small-side row once
    // per salt (the small side is replicated); only joins that preserve
    // the big side's row identity keep the result-identical contract
    require(!Set("right", "rightouter", "full", "outer", "fullouter")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got $joinType " +
        "(the replicated small side would duplicate unmatched rows)")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)).cast("int"))
    // generators can't nest inside other expressions — explode bare,
    // the int/long join-key coercion is automatic
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(key) === saltedSmall(key) &&
          saltedBig("_salt") === saltedSmall("_salt"),
        joinType)
      .drop(saltedSmall(key))
      .drop(saltedBig("_salt")).drop(saltedSmall("_salt"))
  }
}
