package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset DRIFT detection — the monitoring step after [[Profile]]'s
  * "what is in this table": given a REFERENCE snapshot (last month's
  * corpus, the training distribution) and a CURRENT snapshot (today's
  * crawl, the serving distribution), quantify per-column distribution
  * shift so a pipeline can gate ingest ("refuse the batch if the
  * language mix moved") or trigger retraining.
  *
  * Two standard divergences per column, both over the same observed
  * key space (floor-division bins for numeric columns — exactly
  * [[Profile.histogram]]'s binning — and raw values for categorical):
  *
  *  - **PSI** (population stability index, the credit-scoring
  *    standard): `Σ (p_i − q_i) · ln(p_i / q_i)` with ε-smoothing on
  *    both fractions so keys absent from one side contribute a large
  *    finite penalty instead of ∞. Conventional bands: < 0.1 stable,
  *    0.1–0.25 moderate, ≥ 0.25 shifted.
  *  - **JSD** (Jensen–Shannon divergence, natural log): symmetric,
  *    bounded by ln 2, zero iff identical; computed on the raw
  *    (unsmoothed) fractions with the 0·ln0 = 0 convention, so it is
  *    exact for disjoint supports where PSI's value is ε-dependent.
  *
  * Scale posture: ONE scan per side for ALL columns — each side
  * explodes every row into (col_name, key) pairs that partial-agg
  * down to per-key counts before the single shuffle (the
  * [[Profile.columnProfile]] one-scan trick, paid once per snapshot
  * rather than once per column). The joined per-key frame then
  * reduces to one row per column; totals attach via a broadcast of
  * the per-column count rows. Nothing driver-side, no windows, no
  * per-column jobs. Nulls are excluded from each column's
  * distribution (they are [[Profile.columnProfile]]'s department).
  *
  * High-cardinality caveat (scaladoc contract, loud): keys are the
  * GROUPED shuffle key, so a free-text column used as "categorical"
  * degenerates to near-row-cardinality groups. Pre-bucket such
  * columns (numeric widths here; hash-mod or topK upstream) — the
  * same discipline every sketch table in this repo applies.
  */
object Drift {

  /** Standard PSI verdict bands. */
  private def band(psi: Column): Column =
    when(psi < 0.1, "stable").when(psi < 0.25, "moderate").otherwise("shifted")

  /** (col_name, key, n) per-key counts for every requested column in
    * ONE scan: numeric columns keyed by `floor(value / width)` (the
    * [[Profile.histogram]] bin), categorical by the raw value string. */
  private def keyed(df: DataFrame, numeric: Seq[(String, Long)],
      categorical: Seq[String]): DataFrame = {
    val entries: Seq[Column] =
      numeric.map { case (c, w) =>
        require(w > 0, s"bin width must be positive for $c: $w")
        struct(lit(c).as("col_name"),
          floor(col(c).cast("double") / w).cast("string").as("key"))
      } ++
        categorical.map(c =>
          struct(lit(c).as("col_name"), col(c).cast("string").as("key")))
    df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.key").as("key"))
      .filter(col("key").isNotNull)
      .groupBy("col_name", "key")
      .agg(count(lit(1)).as("n"))
  }

  /** One report row per column: `(col_name, n_ref, n_cur, psi, jsd,
    * verdict)` with psi/jsd rounded to 4 decimals (the repo oracle
    * convention). Columns listed in `numeric` (name → bin width) are
    * histogram-binned; `categorical` columns compare raw values. A
    * column with no non-null values on EITHER side has no keys and is
    * absent from the report; one-sided emptiness reports the
    * ε-smoothed maximum PSI and JSD = ln 2. */
  def driftReport(ref: DataFrame, cur: DataFrame,
      numeric: Seq[(String, Long)], categorical: Seq[String],
      eps: Double = 1e-6): DataFrame = {
    require(numeric.nonEmpty || categorical.nonEmpty, "no columns to compare")
    require(eps > 0 && eps < 1e-3, s"eps must be a small positive fraction: $eps")
    val allCols = numeric.map(_._1) ++ categorical
    require(allCols.distinct.size == allCols.size,
      s"duplicate columns in drift spec: $allCols")

    // The per-key frames are TINY (≤ columns × observed keys) but each
    // feeds two consumers (the join and the totals), and without a
    // persist each consumer would re-run the full input scan — 4 scans
    // of a 100 TB table instead of 2. Persist the aggregated frames,
    // checkpoint the (always-small) report, release.
    val r = keyed(ref, numeric, categorical)
      .withColumnRenamed("n", "n_ref_k")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c = keyed(cur, numeric, categorical)
      .withColumnRenamed("n", "n_cur_k")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val joined = r.join(c, Seq("col_name", "key"), "full_outer")
      .na.fill(0L, Seq("n_ref_k", "n_cur_k"))

    // Per-column totals: tiny (one row per column), broadcast back
    // onto the per-key frame so fractions compute without a window.
    val totals = joined.groupBy("col_name")
      .agg(sum("n_ref_k").as("n_ref"), sum("n_cur_k").as("n_cur"))

    val p = when(col("n_ref") > 0, col("n_ref_k").cast("double") / col("n_ref"))
      .otherwise(0.0)
    val q = when(col("n_cur") > 0, col("n_cur_k").cast("double") / col("n_cur"))
      .otherwise(0.0)
    val ps = greatest(p, lit(eps)) // smoothed, PSI only
    val qs = greatest(q, lit(eps))
    val m = (p + q) / 2
    // 0·ln0 = 0 via the zero guards; m = 0 only where both p,q = 0,
    // which the guards also zero out.
    val jsdTerm = (when(p > 0, p * log(p / m)).otherwise(0.0) +
      when(q > 0, q * log(q / m)).otherwise(0.0)) / 2

    val report = joined.join(broadcast(totals), "col_name")
      .groupBy("col_name")
      .agg(first(col("n_ref")).as("n_ref"), first(col("n_cur")).as("n_cur"),
        sum((ps - qs) * log(ps / qs)).as("psi_raw"),
        sum(jsdTerm).as("jsd_raw"))
      .select(col("col_name"), col("n_ref"), col("n_cur"),
        round(col("psi_raw"), 4).as("psi"),
        round(col("jsd_raw"), 4).as("jsd"),
        band(col("psi_raw")).as("verdict"))
      .localCheckpoint(true)
    r.unpersist(blocking = false)
    c.unpersist(blocking = false)
    report
  }
}
