package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *    pointer flip; here it's the caller's `rename`.
  *
  * Equality contract: compaction never changes CONTENT — row multiset
  * and schema (partition columns included) are identical before and
  * after; only the file layout moves. CompactionSpec pins it.
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
        val (n, b) = acc.getOrElse(rel, (0L, 0L))
        acc(rel) = (n + 1, b + f.getLen)
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
    require(new Path(inPath) != new Path(outPath),
      "out-of-place only: outPath must differ from inPath (see scaladoc)")
    val before = dirStats(spark, inPath)
    // nFiles per partition dir, keyed the way the data names it
    val targets: Map[String, Int] = before.map { d =>
      d.partition -> math.max(1, math.ceil(d.bytes.toDouble / targetBytes).toInt)
    }.toMap
    val df = spark.read.parquet(inPath)

    if (partitionCols.isEmpty) {
      val n = math.max(1, targets.values.headOption.getOrElse(1))
      df.withColumn("_shard", pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)),
          lit(n.toLong)))
        .repartition(n, col("_shard"))
        .drop("_shard")
        .write.mode("overwrite").parquet(outPath)
    } else {
      // partition dir name exactly as the writer lays it out, so the
      // listing's keys and the data's keys agree (escaping aside —
      // values here are simple scalars; exotic values would need
      // ExternalCatalogUtils escaping). The literal targets map is
      // partition-count-bounded driver state — the same size class as
      // the listing itself.
      val dirExpr = concat_ws("/",
        partitionCols.map(c => concat(lit(c + "="), col(c).cast("string"))): _*)
      val targetExpr = element_at(
        map(targets.toSeq.sortBy(_._1).flatMap { case (k, v) =>
          Seq(lit(k), lit(v.toLong)) }: _*), dirExpr)
      val dataCols = df.columns.filterNot(partitionCols.contains)
      val shard = pmod(xxhash64(struct(dataCols.map(col).toIndexedSeq: _*)),
        coalesce(targetExpr, lit(1L)))
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
