package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional extension
  * of the 1-D range layout (`s6_range_pruning`): interleave the bits of
  * two quantized dimensions into one clustering key, range-partition
  * and sort the data by it, and every written file's min/max footer
  * stats become TIGHT ON BOTH DIMENSIONS at once. A reader filtering a
  * box on (a, b) then skips every file whose stats miss the box —
  * file/row-group pruning that a single-dimension sort can only give
  * for its own leading column.
  *
  * Why this matters at 100 TB: a lat/lon (or time/tenant, or
  * length/score) box query over a linearly-laid-out table must scan
  * the full selectivity of the LEADING dimension (10% of lat ⇒ 10% of
  * files, whatever the lon filter is); the Z layout scans ≈ the
  * PRODUCT of the selectivities plus curve-boundary noise. The gauge
  * (`zorder_scan_frac` vs `linear_scan_frac`, ZOrderSpec + bench)
  * measures exactly that ratio from the written files' own stats — no
  * reader internals involved, so the evidence transfers to any
  * stats-pruning engine (parquet row-group skipping, Delta/Iceberg
  * file skipping, …).
  *
  * Everything is pure integer Column arithmetic (quantize → bit
  * interleave → one `repartitionByRange` + `sortWithinPartitions`):
  * codegen'd, one range exchange total, no UDF, no driver loop.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative long columns
    * (a in the even positions, b in the odd): the Morton index
    * `z = Σ_i ((a>>i & 1) << 2i | (b>>i & 1) << (2i+1))`. Builds a
    * balanced OR tree of shift/mask terms — 2·bits leaf expressions,
    * all inside whole-stage codegen. `bits ≤ 31` keeps z < 2^62. */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Quantize a numeric column from `[lo, hi]` onto the integer grid
    * `[0, 2^bits)`, clamping out-of-range values to the edge cells
    * (out-of-range data degrades pruning, never correctness — the
    * residual filter still applies). */
  def quantize(v: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, s"empty quantize range [$lo, $hi]")
    val cells = 1L << bits
    least(lit(cells - 1), greatest(lit(0L),
      floor((v - lit(lo)) / lit(hi - lo) * lit(cells.toDouble)).cast("long")))
  }

  /** Write `df` to `path` clustered by the Z-curve over `(aCol, bCol)`:
    * ONE range exchange on the interleaved key into `nFiles` output
    * partitions, each internally sorted by it. The z key itself is not
    * persisted — it is re-derivable, and the pruning value lives in
    * the files' min/max stats on the ORIGINAL columns. */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String,
                    aLo: Double, aHi: Double, bLo: Double, bHi: Double,
                    bits: Int, nFiles: Int, path: String): Unit = {
    val z = interleave(
      quantize(col(aCol), aLo, aHi, bits),
      quantize(col(bCol), bLo, bHi, bits), bits)
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order `df` INTO a snapshot-GOVERNED layout: quantize +
    * interleave as [[writeZOrdered]], but split the curve into
    * `nBatches` Z-CONTIGUOUS batches committed under the manifest
    * protocol, so the MANIFEST zone maps (not just file footers) carry
    * tight per-batch envelopes on BOTH dimensions — batch-level data
    * skipping a reader gets before touching any footer, and the layout
    * [[BloomIndex.readPointRanges]] intersects with bloom sidecars.
    *
    * Protocol: an empty schema-seed batch (-1) bootstraps the
    * manifest, every Z-bucket then commits through
    * [[Snapshot.stagedAppend]] (zone stats ride each commit), and the
    * statless seed is retired — EVERY live batch ends up stat-ful,
    * unlike an enable-listed layout whose first batch is forever
    * blind (the rt5 contrast). Build step: one persist of the keyed
    * rows, one exact-quantile pass for the curve split points
    * (driver state: nBatches−1 longs), one column-pruned write per
    * bucket. Returns the live batch ids. */
  def writeZOrderedGoverned(df: DataFrame, aCol: String, bCol: String,
                            aLo: Double, aHi: Double, bLo: Double, bHi: Double,
                            bits: Int, nBatches: Int, path: String,
                            filesPerBatch: Int = 1,
                            splitPoints: Option[Seq[Long]] = None): Seq[Long] = {
    require(nBatches >= 1, s"nBatches must be >= 1: $nBatches")
    val spark = df.sparkSession
    val z = interleave(
      quantize(col(aCol), aLo, aHi, bits),
      quantize(col(bCol), bLo, bHi, bits), bits)
    val keyed = df.withColumn("_z", z)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // curve split points: caller-pinned (deterministic layouts —
      // e.g. quadrant-aligned cuts for a fixture oracle), else exact
      // quantiles so batches balance on the observed z distribution
      val cuts = splitPoints.map(_.distinct.sorted).getOrElse(
        keyed.stat.approxQuantile("_z",
          (1 until nBatches).map(_.toDouble / nBatches).toArray, 0.0)
          .map(_.toLong).distinct.sorted.toSeq)
      def bucket(i: Int): DataFrame = {
        val inLo = if (i == 0) lit(true) else col("_z") >= lit(cuts(i - 1))
        val inHi = if (i == cuts.length) lit(true) else col("_z") < lit(cuts(i))
        keyed.filter(inLo && inHi)
          .repartitionByRange(filesPerBatch, col("_z"))
          .sortWithinPartitions("_z")
          .drop("_z")
      }
      val n = cuts.length + 1
      // STAGE FIRST (review r17): the source may BE this path (an
      // in-place re-layout), so every bucket is FULLY WRITTEN to a
      // sibling staging dir before anything is deleted — the reset can
      // never destroy rows it has not yet copied (and a persisted-
      // block loss can never recompute from deleted files). A crash
      // before the flip leaves the original table untouched plus a
      // sweepable stage dir.
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val stage = new org.apache.hadoop.fs.Path(
        s"$path.__zstage-${java.util.UUID.randomUUID()}")
      var resetDone = false
      try {
        (0 until n).foreach(i =>
          bucket(i).write.mode("overwrite").parquet(s"$stage/batch_id=$i"))
        val schema = df.schema // captured before the reset
        // build = TABLE RESET (the storage family's convention): a
        // previous life at this path would otherwise make enable()
        // adopt the OLD manifest and stagedAppend NO-OP on every
        // already-committed id — silently serving the old dataset.
        // Pinned readers do not survive a rebuild (SketchTable.build).
        // point of no return is the delete's START, not its return: a
        // recursive delete failing PARTWAY leaves the original table
        // half-destroyed, and sweeping the staged full copy then would
        // be the exact row loss this flag exists to prevent (review
        // r17 pass 2) — so flip the flag first. And partial failure is
        // signalled by a FALSE RETURN as often as by a throw (the
        // Hadoop FileSystem contract) — silently continuing would let
        // enable() adopt a surviving old manifest, every stagedAppend
        // no-op against its committed history, and the "success" path
        // sweep the staged buckets: REQUIRE the delete.
        resetDone = true
        val target = new org.apache.hadoop.fs.Path(path)
        require(fs.delete(target, true) || !fs.exists(target),
          s"table reset could not fully delete $path — staged buckets " +
            s"preserved at $stage")
        // schema-only seed bootstraps the manifest so every DATA batch
        // can commit via stagedAppend and carry zone stats
        // (repartition forces one empty part file whose FOOTER
        // carries the schema — a 0-partition write would leave
        // enable() nothing to sweep)
        spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
          .repartition(1).write.mode("overwrite")
          .parquet(s"$path/batch_id=-1")
        Snapshot.enable(spark, path)
        (0 until n).foreach { i =>
          Snapshot.stagedAppend(spark, path, i.toLong) {
            // the staged bucket MOVES into place — zone stats compute
            // from the renamed dir inside the commit; the data is read
            // zero times after the reset
            require(fs.rename(new org.apache.hadoop.fs.Path(s"$stage/batch_id=$i"),
              new org.apache.hadoop.fs.Path(s"$path/batch_id=$i")),
              s"stage flip failed for batch $i under $path")
          }
        }
        Snapshot.retainFrom(spark, path, 0L, includeBuild = true)
        // sweep the (now-empty) stage dir ONLY on success
        fs.delete(stage, true)
      } catch {
        case e: Throwable =>
          // before the reset the original table is intact and the
          // stage is garbage — sweep it. AFTER the reset the staged
          // buckets are the SOLE copy of every not-yet-renamed batch,
          // so a flip failure (seed write, enable, a commit conflict,
          // a failed rename) must LEAVE the stage dir for recovery —
          // the previous finally-delete turned any flip failure into
          // permanent row loss for an in-place re-layout (review r17)
          if (!resetDone) fs.delete(stage, true)
          else throw new IllegalStateException(
            s"z-relayout of $path failed mid-flip; staged buckets " +
              s"preserved for recovery at $stage", e)
          throw e
      }
      (0 until n).map(_.toLong)
    } finally keyed.unpersist(blocking = false)
  }

  /** Per-file [min,max] envelopes of two columns for a written layout,
    * computed in ONE job via `input_file_name` — the exact information
    * a stats-pruning reader uses, measured from the outside. */
  def fileEnvelopes(df: DataFrame, aCol: String, bCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(aCol).as("a_min"), max(aCol).as("a_max"),
        min(bCol).as("b_min"), max(bCol).as("b_max"))

  /** Fraction of a layout's files whose stats envelope intersects the
    * box `[aLo,aHi] × [bLo,bHi]` — the scan fraction a stats-pruning
    * reader pays for that box. Driver receives two counts. */
  def boxScanFraction(df: DataFrame, aCol: String, bCol: String,
                      aLo: Double, aHi: Double,
                      bLo: Double, bHi: Double): Double = {
    val env = fileEnvelopes(df, aCol, bCol)
      .agg(count(lit(1)).as("total"),
        sum(when(col("a_max") >= aLo && col("a_min") <= aHi &&
          col("b_max") >= bLo && col("b_min") <= bHi, 1L).otherwise(0L))
          .as("hit"))
      .head()
    val total = env.getLong(0)
    // empty layout: zero files, `sum` is NULL — a scan of nothing
    // touches nothing, not NaN/NPE
    if (total == 0L) 0.0 else env.getLong(1).toDouble / total.toDouble
  }
}
