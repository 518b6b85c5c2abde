package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic small-files compaction for partitioned parquet datasets —
  * the standing operational problem of every long-lived 100 TB table:
  * thousands of micro-batch appends leave partition directories full
  * of KB-scale files, and from then on EVERY reader pays task-per-file
  * scheduling and footer-per-file planning, while the NameNode/object
  * store pays the listing. (The per-index compactions — MinHash, IVF,
  * posting — fold their OWN batch layouts; this is the table-generic
  * form.)
  *
  * Design:
  *  - File sizes come from a driver-side listing (pure metadata,
  *    O(files) — the same listing any reader's planning already does).
  *    Each partition directory gets `ceil(bytes / targetBytes)` output
  *    files, so a directory already at target size rewrites to itself
  *    and a fragmented one collapses.
  *  - The rewrite is ONE job: rows get a deterministic shard id
  *    (`xxhash64(whole row) % nFiles(partition)` — content-derived, no
  *    RNG, so a re-run shards identically), then `repartition(partition
  *    cols + shard)` co-locates each output file's rows and
  *    `partitionBy` lands them. Shuffle volume = the data being
  *    compacted, which is the floor for any rewrite. The per-dir file
  *    count is an UPPER bound, not an exact count: two shards of one
  *    partition can hash into the same task and merge into one larger
  *    file — always the harmless direction for a compactor. A
  *    directory whose target is 1 lands as exactly 1 file (all its
  *    rows share one shuffle key), which is what the oracle pins.
  *  - OUT-OF-PLACE only (`outPath` must differ from `inPath`): reading
  *    and overwriting the same directory in one job is the classic
  *    self-overwrite loss. At scale the swap is a catalog/location
  *    pointer flip; here it's the caller's `rename` — or, for the
  *    batch-partitioned index/sketch family, [[Snapshot.compactLive]]'s
  *    atomic manifest flip, which needs no swap at all.
  *
  * Equality contract: compaction never changes CONTENT — row multiset
  * and schema (partition columns included) are identical before and
  * after; only the file layout moves. CompactionSpec pins it.
  *
  * EXCLUDED: BUCKETED catalog tables (the `j5_bucketed_join` layout).
  * Bucketing is a files-to-bucket-ids correspondence recorded in the
  * catalog: file names carry the bucket id, and every row must sit in
  * the file of `hash(bucket cols) % nBuckets`. This compactor shards
  * by a CONTENT hash of all columns and renames files freely — on a
  * bucketed table that silently breaks the correspondence, and the
  * exchange-free joins bucketing exists for would return WRONG results
  * (Spark trusts the catalog and skips the shuffle). Compact bucketed
  * tables by re-running their `bucketBy` write — the bucket layout IS
  * the sharding — never through this path.
  */
object Compaction {

  /** Per-partition-directory layout stats: `partition` is the
    * relative dir ("" for an unpartitioned root), sizes in bytes. */
  final case class DirStats(partition: String, nFiles: Long, bytes: Long)

  /** List data files under `path`, grouped by partition directory
    * (any dir level containing `=`-style or plain subdirs — we group
    * by the file's parent relative to the root). Hidden/metadata
    * files (`_SUCCESS`, `.crc`) are excluded. */
  def dirStats(spark: SparkSession, path: String): Seq[DirStats] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val acc = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    val rootUri = fs.makeQualified(root).toUri
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        val rel = rootUri.relativize(fs.makeQualified(f.getPath.getParent).toUri)
          .getPath.stripSuffix("/")
        // skip files under hidden (_/.-prefixed) DIRECTORIES too —
        // `_batch_ledger/…/part-*.parquet`, `_manifests/` staging:
        // Spark's own discovery never reads them, so the compactor
        // must neither count nor rewrite them (the recursive listFiles
        // walks into them regardless of the per-FILE hidden check)
        val hiddenDir = rel.split("/").exists(seg =>
          seg.startsWith("_") || seg.startsWith("."))
        if (!hiddenDir) {
          val (n, b) = acc.getOrElse(rel, (0L, 0L))
          acc(rel) = (n + 1, b + f.getLen)
        }
      }
    }
    acc.toSeq.map { case (p, (n, b)) => DirStats(p, n, b) }
      .sortBy(_.partition)
  }

  /** Compact `inPath` into `outPath` aiming at `targetBytes` per file
    * per partition directory. `partitionCols` must match the input's
    * layout (empty for an unpartitioned dataset). Returns the
    * before/after stats as a DataFrame:
    * (partition, files_before, bytes_before, files_after, target_files).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long, partitionCols: Seq[String] = Nil): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    // FULLY QUALIFIED comparison: raw Paths treat "/x", "file:///x", and
    // "x/../x" as different spellings of the same directory, and any of
    // those aliases would slip past a literal check straight into the
    // self-overwrite the out-of-place contract exists to prevent.
    // makeQualified resolves scheme/authority/workdir; URI.normalize
    // collapses the dot segments makeQualified leaves alone.
    def qualified(p: String) = {
      val hp = new Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(hp).toUri.normalize()
    }
    require(qualified(inPath) != qualified(outPath),
      s"out-of-place only: outPath must differ from inPath (both resolve " +
        s"to ${qualified(inPath)} — see scaladoc)")
    val before = dirStats(spark, inPath)
    if (partitionCols.isEmpty)
      require(before.forall(_.partition.isEmpty),
        s"input has partition subdirectories (${before.map(_.partition).mkString(", ")}) " +
          "— pass partitionCols, or the layout would be silently flattened")
    val targets: Map[String, Int] = before.map { d =>
      d.partition -> math.max(1, math.ceil(d.bytes.toDouble / targetBytes).toInt)
    }.toMap

    // Session clone scoping two read/write semantics the rewrite needs:
    // partition values stay STRINGS (inference would read hour=00 as
    // int 0 and re-write the dir as hour=0 — a silent layout rename
    // that would also desync the stats ledger), and the caller's
    // session conf stays untouched.
    val sess = org.apache.spark.sql.graftbridge.ColumnBridge.cloneSession(spark)
    sess.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val df = sess.read.parquet(inPath)

    // Deterministic content hash for shard assignment. Map-typed
    // columns (top-level or nested) are unhashable by xxhash64; the
    // shard only needs determinism, so rows fall back to to_json of
    // the full struct when any column contains a map.
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def containsMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: ArrayType => containsMap(a.elementType)
      case _ => false
    }
    def contentHash(cols: Seq[String]): Column = {
      val hs = df.schema.fields.filter(f => cols.contains(f.name))
      if (hs.exists(f => containsMap(f.dataType)))
        xxhash64(to_json(struct(cols.map(col).toIndexedSeq: _*)))
      else xxhash64(struct(cols.map(col).toIndexedSeq: _*))
    }

    if (partitionCols.isEmpty) {
      val n = targets.getOrElse("", 1)
      df.withColumn("_shard", pmod(contentHash(df.columns.toIndexedSeq), lit(n.toLong)))
        .repartition(n, col("_shard"))
        .drop("_shard")
        .write.mode("overwrite").parquet(outPath)
    } else {
      // Per-row partition-dir key from the file the row CAME from —
      // input_file_name's parent relative to the root — so the keys
      // here and the listing's keys are the same strings by
      // construction (re-deriving the dir name from the VALUES would
      // break on hive-escaped values and null partitions). The
      // literal targets map is partition-count-bounded driver state,
      // the same size class as the listing itself; a miss is
      // structurally impossible, and raise_error makes sure it could
      // never silently degrade to 1 file if that ever changes.
      val root = new Path(inPath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // scheme spellings differ between makeQualified ("file:/x") and
      // input_file_name ("file:///x") — anchor on the PATH portion,
      // which both agree on; a failed locate degrades to a key the
      // targets map cannot contain, which the raise_error below turns
      // into a loud failure instead of a silent 1-file collapse
      val rootPath = fs.makeQualified(root).toUri.getPath.stripSuffix("/") + "/"
      val fileCol = input_file_name()
      val dirExpr = regexp_replace(
        fileCol.substr(locate(rootPath, fileCol) + lit(rootPath.length),
          lit(1 << 20)),
        "/[^/]*$", "")
      val targetExpr = element_at(
        map(targets.toSeq.sortBy(_._1).flatMap { case (k, v) =>
          Seq(lit(k), lit(v.toLong)) }: _*), dirExpr)
      val guarded = when(targetExpr.isNull,
        raise_error(concat(lit("compaction: unlisted partition dir "), dirExpr)))
        .otherwise(targetExpr)
      val dataCols = df.columns.filterNot(partitionCols.contains).toIndexedSeq
      val shard = pmod(contentHash(dataCols), guarded)
      // EXPLICIT partition count — one task per intended output file.
      // Column-only repartition would let AQE coalesce the shuffle
      // back to advisory-sized partitions (measured: 3 shards → 1
      // task → 1 file), silently undoing the whole point.
      val totalFiles = math.max(1, targets.values.sum)
      df.withColumn("_shard", shard)
        .repartition(totalFiles, partitionCols.map(col) :+ col("_shard"): _*)
        .drop("_shard")
        .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(outPath)
    }

    val after = dirStats(spark, outPath)
    import spark.implicits._
    val b = before.map(d => (d.partition, d.nFiles, d.bytes,
      targets(d.partition).toLong))
      .toDF("partition", "files_before", "bytes_before", "target_files")
    val a = after.map(d => (d.partition, d.nFiles))
      .toDF("partition", "files_after")
    b.join(a, Seq("partition"), "left").na.fill(0L, Seq("files_after"))
      .orderBy("partition")
  }
}
