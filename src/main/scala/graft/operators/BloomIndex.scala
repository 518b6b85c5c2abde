package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-batch BLOOM secondary index for POINT LOOKUPS on a
  * snapshot-governed table — the equality-predicate complement to the
  * manifest's zone maps ([[Snapshot.readRange]]): zone maps prune
  * range scans when values correlate with batch layout; blooms prune
  * `col = v` lookups on HIGH-CARDINALITY columns whose values scatter
  * across every batch's min/max span (user ids, document hashes —
  * zone maps can never prune those).
  *
  * Same storage-layer lineage as the reference's index ensure step
  * (readme.md:200-205, its collection-level lookup index) — rebuilt
  * here as file-based sidecar sketches over the repo's manifest
  * protocol rather than a server-side B-tree.
  *
  * Design, and why it holds at 100 TB:
  *  - One bloom PER BATCH per indexed column, persisted beside the
  *    data (`_bloomidx/<column>/batch_<id>.bloom`). Batch directories
  *    are IMMUTABLE once published (the Snapshot contract), so a
  *    batch's bloom is immutable too: cache it forever, never
  *    invalidate. Folds/merges make NEW batch ids — their blooms
  *    build on the next [[refresh]]; the retired ids' sidecars are
  *    swept there as well.
  *  - A lookup consults the blooms (metadata-scale IO: ~1 MB per
  *    million rows at 1% fpp, loaded once into a process-wide cache
  *    keyed by immutable (path, column, batch)) and reads ONLY the
  *    admitting batches. A false positive costs one extra batch scan,
  *    never a wrong row — the equality filter still applies to every
  *    row read.
  *  - Batches WITHOUT a bloom (appended since the last refresh) are
  *    always read — conservatively correct, exactly like stats-less
  *    batches under zone maps. [[refresh]] is incremental: it builds
  *    only the missing sidecars, each from one column-pruned scan of
  *    its own batch.
  *  - Build is distributed: `df.stat.bloomFilter` is a
  *    partial-aggregated sketch merge (executors hash, driver ORs
  *    bitsets); nothing row-scale ever sits on the driver.
  */
object BloomIndex {

  /** Process-wide sidecar cache. Safe because batch content — and so
    * its bloom — is immutable; entries for retired batches are merely
    * unused. Tests may [[clearCache]]. */
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Long), BloomFilter]

  private[graft] def clearCache(): Unit = cache.clear()

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def bloomFile(path: String, column: String, b: Long): Path =
    new Path(s"$path/_bloomidx/$column/batch_$b.bloom")

  private def columnType(spark: SparkSession, path: String,
                         m: Snapshot.Manifest,
                         column: String): org.apache.spark.sql.types.DataType =
    m.schemaJson.map(j => Snapshot.structOf(j)(column).dataType)
      .getOrElse(Snapshot.readBatches(spark, path, m).schema(column).dataType)

  private def requireSupported(dt: org.apache.spark.sql.types.DataType,
                               column: String): Unit = {
    import org.apache.spark.sql.types._
    require(Seq(ByteType, ShortType, IntegerType, LongType, StringType)
      .contains(dt),
      s"bloom index needs an integral or string column; '$column' is " +
        dt.simpleString)
  }

  /** Build the missing per-batch blooms for `column` (one
    * column-pruned scan per NEW batch — batches already indexed cost
    * nothing), sweep sidecars of retired batches, return how many
    * were built. `fpp` trades sidecar size for extra-batch-scan
    * probability; the default 1% costs ~1.2 MB per million rows. */
  def refresh(spark: SparkSession, path: String, column: String,
              fpp: Double = 0.01): Int = {
    val m = Snapshot.latest(spark, path).getOrElse(
      throw new IllegalStateException(
        s"$path is not snapshot-enabled — bloom sidecars key off manifest batches"))
    requireSupported(columnType(spark, path, m, column), column)
    val fs = fsFor(spark, path)
    val live = m.batches.toSet
    // sweep sidecars for batches no longer live (folded/retired)
    val dir = new Path(s"$path/_bloomidx/$column")
    if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("batch_") && n.endsWith(".bloom")) {
        val id = n.stripPrefix("batch_").stripSuffix(".bloom")
        if (id.toLongOption.exists(b => !live.contains(b)))
          fs.delete(st.getPath, false)
      }
    }
    var built = 0
    m.batches.foreach { b =>
      val f = bloomFile(path, column, b)
      if (!fs.exists(f)) {
        val one = Snapshot.readBatches(spark, path, m.copy(batches = Seq(b)))
          .select(col(column)).filter(col(column).isNotNull)
        val n = math.max(1L, one.count())
        val bf = one.stat.bloomFilter(column, n, fpp)
        // crash-safe sidecar publish: write aside, rename into place
        val tmp = new Path(f.getParent, s".${f.getName}.tmp")
        val out = fs.create(tmp, true)
        try bf.writeTo(out) finally out.close()
        if (!fs.rename(tmp, f)) {
          fs.delete(tmp, false)
          require(fs.exists(f), s"bloom sidecar publish failed for $f")
        }
        built += 1
      }
    }
    built
  }

  private def loadBloom(spark: SparkSession, path: String, column: String,
                        b: Long): Option[BloomFilter] =
    cache.get((path, column, b)).orElse {
      val fs = fsFor(spark, path)
      val f = bloomFile(path, column, b)
      if (!fs.exists(f)) None
      else {
        val in = fs.open(f)
        val bf = try BloomFilter.readFrom(in) finally in.close()
        cache.putIfAbsent((path, column, b), bf)
        Some(bf)
      }
    }

  /** The lookup's batch decision, exposed for the physical-pruning
    * pins: (batches to read, batches the blooms excluded). No-bloom
    * batches land on the read side. */
  private[graft] def candidateBatches(spark: SparkSession, path: String,
                                      column: String,
                                      value: Any): (Seq[Long], Seq[Long]) = {
    val m = Snapshot.latest(spark, path).getOrElse(
      throw new IllegalStateException(s"$path is not snapshot-enabled"))
    m.batches.partition { b =>
      loadBloom(spark, path, column, b).forall(_.mightContain(value))
    }
  }

  /** Bloom-pruned POINT LOOKUP: rows with `column = value`, reading
    * only the batches whose bloom admits the value (plus any batch
    * not yet refreshed). The decision is metadata-only — cached
    * sidecars, no data-file IO for excluded batches; parquet's own
    * pushdown still applies inside the batches read. */
  def readPoint(spark: SparkSession, path: String, column: String,
                value: Any): DataFrame = {
    val m = Snapshot.latest(spark, path).getOrElse(
      throw new IllegalStateException(
        s"$path is not snapshot-enabled — readPoint resolves through manifest batches"))
    requireSupported(columnType(spark, path, m, column), column)
    val (keep, _) = candidateBatches(spark, path, column, value)
    val cond = col(column) === lit(value)
    if (keep.isEmpty) m.schemaJson match {
      case Some(j) => // schema-only empty frame: zero file IO
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          Snapshot.structOf(j))
          .withColumn("batch_id", lit(null).cast("int")).filter(cond)
      case None =>
        Snapshot.readBatches(spark, path, m).limit(0).filter(cond)
    }
    else Snapshot.readBatches(spark, path, m.copy(batches = keep)).filter(cond)
  }
}
