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
  *    are immutable WITHIN a manifest lineage (the Snapshot contract),
  *    so a sidecar is cacheable — but the `build` lifecycle is a
  *    table RESET that reuses ids at the same path, so both the cache
  *    key and the read path validate against the sidecar/batch-dir
  *    mtimes (see [[refresh]]/loadBloom). Folds/merges make NEW batch
  *    ids — their blooms build on the next [[refresh]]; the retired
  *    ids' sidecars are swept there as well.
  *  - A lookup consults the blooms (metadata-scale IO: ~1 MB per
  *    million rows at 1% fpp, loaded once into a process-wide cache
  *    keyed by immutable (path, column, batch)) and reads ONLY the
  *    admitting batches. A false positive costs one extra batch scan,
  *    never a wrong row — the equality filter still applies to every
  *    row read.
  *  - Batches WITHOUT a bloom (appended since the last refresh) are
  *    always read — conservatively correct, exactly like stats-less
  *    batches under zone maps. [[refresh]] is incremental: it builds
  *    only the missing/stale sidecars, ALL in one column-pruned
  *    grouped pass (two jobs total, however many batches are new).
  *  - Build is distributed: the per-batch bloom aggregation is a
  *    partial-aggregated sketch merge (executors hash, reducers OR
  *    bitsets); nothing row-scale ever sits on the driver.
  */
object BloomIndex {

  /** Process-wide sidecar cache, keyed by (path, column, batch,
    * CONTENT STAMP — the batch-dir fingerprint the sidecar was built
    * against, or the sidecar mtime for pre-stamp sidecars). Batch
    * directories are immutable WITHIN a manifest lineage, but the
    * storage family's `build` lifecycle is a TABLE RESET that reuses
    * batch -1 (and ingest retries overwrite `batch_id=N`) at the same
    * path — a bloom from the previous life must never answer for the
    * new one (it could wrongly EXCLUDE a batch that now holds the
    * probed value: a missing row, not an over-read — r16 advice). The
    * stamp in the key makes any rebuilt sidecar a cache miss; entries
    * for retired batches or old lives are merely unused. Tests may
    * [[clearCache]]. */
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Long, Long), BloomFilter]

  private[graft] def clearCache(): Unit = cache.clear()

  /** Cache entries held for one (path, column, batch) — spec hook for
    * the superseded-token eviction contract (must stay 1 across
    * rebuild cycles, never accrete one bloom per table life). */
  private[graft] def cachedTokens(path: String, column: String, b: Long): Int =
    cache.keysIterator.count { case (p, c, bb, _) =>
      p == path && c == column && bb == b }

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

  /** Sidecar mtime, or None when absent. */
  private def sidecarMtime(fs: FileSystem, f: Path): Option[Long] =
    try Some(fs.getFileStatus(f).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }

  /** The batch data directory's mtime, or None when the directory is
    * gone (physically pruned / vacuumed — a sidecar can't be stale
    * against content that no longer exists). */
  private def batchDirMtime(fs: FileSystem, path: String, b: Long): Option[Long] =
    try Some(fs.getFileStatus(new Path(s"$path/batch_id=$b"))
      .getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }

  /** CONTENT fingerprint of a batch directory: order-independent hash
    * over every data file's (name, length, mtime). This — not the
    * directory mtime — is what staleness compares against: part-file
    * names carry per-write UUIDs, so ANY rewrite of the batch changes
    * the fingerprint even within one mtime tick, and on object stores
    * whose "directory" statuses are synthetic the FILE statuses are
    * still real (review r17). None when the directory is gone. */
  private def dirFingerprint(fs: FileSystem, path: String, b: Long): Option[Long] =
    try {
      val h = fs.listStatus(new Path(s"$path/batch_id=$b"))
        .filterNot(st => st.getPath.getName.startsWith("_") ||
          st.getPath.getName.startsWith("."))
        .map(st => scala.util.hashing.MurmurHash3.productHash(
          (st.getPath.getName, st.getLen, st.getModificationTime)).toLong)
        .foldLeft(0L)(_ ^ _)
      Some(h)
    } catch { case _: java.io.FileNotFoundException => None }

  private def fpFile(f: Path): Path = new Path(f.getParent, f.getName + ".fp")

  /** The fingerprint the sidecar was built against, recorded beside it
    * ([[refresh]] captures it BEFORE scanning, so a batch overwritten
    * mid-refresh reads as stale on the next lookup instead of being
    * trusted forever). None: pre-fingerprint sidecar or unreadable. */
  private def readFp(fs: FileSystem, f: Path): Option[Long] =
    try {
      val in = fs.open(fpFile(f))
      val s = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      s.trim.toLongOption
    } catch { case _: java.io.IOException => None }

  private def writeFp(fs: FileSystem, f: Path, fp: Long): Unit = {
    val out = fs.create(fpFile(f), true)
    try out.write(fp.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Is the sidecar trustworthy for the batch's CURRENT content — and
    * if so, under which CACHE TOKEN? Fingerprint-stamped sidecars
    * compare content fingerprints (token = the stamp); a legacy
    * sidecar without a stamp falls back to the mtime ordering (token =
    * its mtime; a sidecar older than its batch dir is from a previous
    * life of the path — `build` = table reset reuses ids). A gone
    * batch dir can't contradict its sidecar. None = absent or stale.
    * One combined check: callers get freshness AND the token from a
    * single metadata pass instead of re-reading the stamp (review
    * r17 — the per-lookup IO is the feature's cost, pay it once). */
  private def sidecarToken(fs: FileSystem, path: String, column: String,
                           b: Long): Option[Long] = {
    val f = bloomFile(path, column, b)
    val mt = sidecarMtime(fs, f)
    if (mt.isEmpty) return None // no sidecar at all
    readFp(fs, f) match {
      case Some(stamped) =>
        if (dirFingerprint(fs, path, b).forall(_ == stamped)) Some(stamped)
        else None
      case None =>
        if (batchDirMtime(fs, path, b).exists(_ > mt.get)) None
        else Some(mt.get)
    }
  }

  /** Typed per-batch bloom aggregation: ONE distributed pass builds
    * every missing batch's filter at once, each sized from the
    * per-batch counts map (the buffer is created lazily on the first
    * reduced row, so the key-independent `zero` stays null). Partials
    * merge like any sketch — executors hash, reducers OR bitsets. */
  private final class BatchBloomAgg[T](sizes: Map[Long, Long], fpp: Double,
      put: (BloomFilter, T) => Unit)
    extends org.apache.spark.sql.expressions.Aggregator[(Long, T), BloomFilter, Array[Byte]] {
    def zero: BloomFilter = null
    def reduce(buf: BloomFilter, a: (Long, T)): BloomFilter = {
      // 64-item floor: a filter sized for a near-empty batch is ~10
      // bits and its EFFECTIVE fpp is far above the nominal one (7 of
      // 10 bits set by a single element admit most probes); the floor
      // costs ~80 bytes and keeps tiny batches genuinely prunable
      val bf = if (buf == null)
        BloomFilter.create(math.max(64L, sizes.getOrElse(a._1, 1L)), fpp)
      else buf
      put(bf, a._2)
      bf
    }
    def merge(x: BloomFilter, y: BloomFilter): BloomFilter =
      if (x == null) y else if (y == null) x else { x.mergeInPlace(y); x }
    def finish(r: BloomFilter): Array[Byte] = {
      val bf = if (r == null) BloomFilter.create(1L, fpp) else r
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[BloomFilter] =
      org.apache.spark.sql.Encoders.javaSerialization(classOf[BloomFilter])
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** Crash-safe sidecar publish: write aside, rename into place. */
  private def writeSidecar(fs: FileSystem, f: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(f.getParent, s".${f.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    // a STALE sidecar may already sit at f (rebuild-over-reset):
    // rename does not overwrite, so clear it first — a crash between
    // the delete and the rename leaves no sidecar, which reads
    // conservatively (never the stale bloom)
    if (fs.exists(f)) fs.delete(f, false)
    if (!fs.rename(tmp, f)) {
      fs.delete(tmp, false)
      require(fs.exists(f), s"bloom sidecar publish failed for $f")
    }
  }

  /** Build the per-batch blooms for `column` that are missing OR STALE
    * (sidecar older than its batch directory — a previous life of the
    * path), sweep sidecars of retired batches, return how many were
    * built. `fpp` trades sidecar size for extra-batch-scan
    * probability; the default 1% costs ~1.2 MB per million rows.
    *
    * TWO jobs regardless of how many batches need building (r16
    * verdict #3 — was 2 driver-serial jobs PER batch): one grouped
    * count sizes every filter, then one grouped [[BatchBloomAgg]]
    * pass builds them all; `batch_id` stays the partition column so
    * both group map-side within each batch's own files. The built
    * bytes transit the driver (~1.2 MB per million rows each) only to
    * be published with the crash-safe per-sidecar rename — a cold
    * multi-thousand-batch build should refresh in manifest slices. */
  def refresh(spark: SparkSession, path: String, column: String,
              fpp: Double = 0.01): Int = {
    val m = Snapshot.latest(spark, path).getOrElse(
      throw new IllegalStateException(
        s"$path is not snapshot-enabled — bloom sidecars key off manifest batches"))
    val dt = columnType(spark, path, m, column)
    requireSupported(dt, column)
    val fs = fsFor(spark, path)
    val live = m.batches.toSet
    // sweep sidecars for batches no longer live (folded/retired)
    val dir = new Path(s"$path/_bloomidx/$column")
    if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("batch_") &&
          (n.endsWith(".bloom") || n.endsWith(".bloom.fp"))) {
        val id = n.stripPrefix("batch_").stripSuffix(".fp").stripSuffix(".bloom")
        if (id.toLongOption.exists(b => !live.contains(b)))
          fs.delete(st.getPath, false)
      }
    }
    val missing = m.batches.filter(b => sidecarToken(fs, path, column, b).isEmpty)
    if (missing.isEmpty) return 0
    // fingerprints captured BEFORE the scan: if a batch is overwritten
    // while the build jobs run, the published stamp describes the OLD
    // listing and the next lookup reads the sidecar as stale instead
    // of trusting a bloom of rows that no longer exist (review r17)
    val fps = missing.map(b => b -> dirFingerprint(fs, path, b)).toMap
    import spark.implicits._
    val rows = Snapshot.readBatches(spark, path, m.copy(batches = missing))
      .select(col("batch_id").cast("long").as("_b"), col(column))
      .filter(col(column).isNotNull)
    // job 1: per-batch sizes (the manifest carries min/max zone stats,
    // not row counts, so sizing is one grouped count — map-side
    // combined, `missing.size` longs to the driver)
    val sizes = rows.groupBy("_b").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // job 2: every bloom in one grouped aggregation
    val built: Map[Long, Array[Byte]] =
      (if (dt == org.apache.spark.sql.types.StringType)
        rows.select(col("_b"), col(column).cast("string").as("_v"))
          .as[(Long, String)].groupByKey(_._1)
          .agg(new BatchBloomAgg[String](sizes, fpp,
            (bf, v) => bf.putString(v)).toColumn.name("bloom"))
          .collect()
      else
        // integral types hash as longs — the same convention
        // `df.stat.bloomFilter` used for the pre-r17 sidecars, so
        // mightContain(value) stays compatible across both eras
        rows.select(col("_b"), col(column).cast("long").as("_v"))
          .as[(Long, Long)].groupByKey(_._1)
          .agg(new BatchBloomAgg[Long](sizes, fpp,
            (bf, v) => bf.putLong(v)).toColumn.name("bloom"))
          .collect()).toMap
    missing.foreach { b =>
      // a batch with zero non-null values still gets a sidecar (an
      // always-excluding empty bloom) so refresh stays idempotent
      val bytes = built.getOrElse(b, {
        val bos = new java.io.ByteArrayOutputStream()
        BloomFilter.create(1L, fpp).writeTo(bos)
        bos.toByteArray
      })
      val f = bloomFile(path, column, b)
      writeSidecar(fs, f, bytes)
      fps.getOrElse(b, None).foreach(fp => writeFp(fs, f, fp))
    }
    missing.size
  }

  private def loadBloom(spark: SparkSession, path: String, column: String,
                        b: Long): Option[BloomFilter] = {
    val fs = fsFor(spark, path)
    val f = bloomFile(path, column, b)
    // REBUILD SAFETY (r16 advice, hardened r17): a sidecar whose
    // content stamp mismatches the batch directory's CURRENT listing
    // describes a previous life of this path — treat it as absent
    // (conservative full read of the batch) until refresh rebuilds it.
    // The stamp rides the cache key, so a stale cached bloom can never
    // be consulted either. Cost: a listing + a tiny stamp read per
    // batch per lookup instead of a pure cache hit — namenode-scale
    // IO, the price of never silently dropping rows after a reset.
    sidecarToken(fs, path, column, b) match {
      case None => None
      case Some(token) =>
        cache.get((path, column, b, token)).orElse {
          // a concurrent refresh republishing this sidecar can race
          // the open into writeSidecar's delete→rename window: the
          // contract everywhere in this file is "cannot decide → read
          // the batch conservatively", never a query failure
          try {
            val in = fs.open(f)
            val bf = try BloomFilter.readFrom(in) finally in.close()
            // a NEW token for this (path, column, batch) supersedes
            // every older life's entry — evict them, or a long-lived
            // server over a periodically-rebuilt table accretes one
            // ~MB bloom per rebuild forever (review r17 #4); eviction
            // rides the rare miss path, never the hit path. The token
            // is always the CURRENT on-disk stamp read moments ago in
            // sidecarToken (no reader holds a long-lived stale token),
            // so the only way an old-token insert evicts a new-token
            // entry is a lookup STRADDLING a refresh — one transient
            // extra miss that the straggler's own next lookup heals.
            cache.keysIterator
              .filter { case (p, c, bb, t) =>
                p == path && c == column && bb == b && t != token }
              .foreach(cache.remove)
            cache.putIfAbsent((path, column, b, token), bf)
            Some(bf)
          } catch { case _: java.io.IOException => None }
        }
    }
  }

  /** The lookup's batch decision, exposed for the physical-pruning
    * pins: (batches to read, batches the blooms excluded). No-bloom
    * batches land on the read side. */
  private[graft] def candidateBatches(spark: SparkSession, path: String,
                                      column: String, value: Any,
                                      within: Option[Snapshot.Manifest] = None)
      : (Seq[Long], Seq[Long]) = {
    // `within`: readers that already resolved a manifest pass it so
    // the batch decision and the read use ONE snapshot — a concurrent
    // reset/fold between two latest() calls would otherwise mix
    // schemas/batch sets (the readPointRanges race, same fix)
    val m = within.orElse(Snapshot.latest(spark, path)).getOrElse(
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
    val (keep, _) = candidateBatches(spark, path, column, value, Some(m))
    Snapshot.readKeepOrEmpty(spark, path, m, keep, col(column) === lit(value))
  }

  /** COMPOSED pruned lookup — every metadata structure the storage
    * layer maintains for the predicate, intersected BEFORE any file
    * IO: `pointCol = value` consults the per-batch bloom sidecars,
    * each `(rangeCol, lo, hi)` consults the manifest zone maps
    * ([[Snapshot.rangeScreen]]), and only batches surviving EVERY
    * screen are read. The screens run cheapest-first: zone maps are
    * pure manifest lookups, so bloom sidecars load only for
    * zone-surviving batches. On a Z-ordered governed layout
    * ([[ZOrder.writeZOrderedGoverned]]) the zone envelopes are tight
    * on BOTH curve dimensions at once, so a 2-D box plus a point id
    * reads ≈ the one batch that can hold the row — the `rt9` query
    * pins the physical dir count. A structure that cannot decide
    * (stats-less batch, unrefreshed bloom) keeps its batch readable:
    * conservative, never wrong, like each screen alone. */
  def readPointRanges(spark: SparkSession, path: String, pointCol: String,
                      value: Any,
                      ranges: Seq[(String, BigDecimal, BigDecimal)]): DataFrame = {
    val m = Snapshot.latest(spark, path).getOrElse(
      throw new IllegalStateException(
        s"$path is not snapshot-enabled — composed reads resolve through " +
          "manifest batches"))
    requireSupported(columnType(spark, path, m, pointCol), pointCol)
    // every screen resolves against the SAME manifest snapshot — a
    // concurrent fold between screens must not empty the intersection
    val (keep, rangeCond) = Snapshot.screenAll(spark, path, m, ranges)
    val cond = rangeCond.foldLeft(col(pointCol) === lit(value))(_ && _)
    val keepBloom = keep.filter(b =>
      loadBloom(spark, path, pointCol, b).forall(_.mightContain(value)))
    Snapshot.readKeepOrEmpty(spark, path, m, keepBloom, cond)
  }
}
