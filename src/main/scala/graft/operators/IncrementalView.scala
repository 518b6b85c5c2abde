package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CONSOLIDATED materialized view over a snapshot-governed base table,
  * maintained by DELETE-AWARE incremental refresh — the classic
  * incremental-view-maintenance recipe (affected-group recomputation)
  * on top of this family's version diffs, closing the loop the
  * per-batch [[MaterializedAgg]] rollup leaves open: that rollup
  * follows APPENDS one batch at a time and stands down after COW
  * folds until a resync, whereas a consolidated view follows the
  * base's FULL mutation stream — appends, retention, COW
  * merge/delete — with work proportional to the CHANGED GROUPS, never
  * the base history.
  *
  * Layout: one governed table holding ONE ROW PER GROUP with the
  * [[MaterializedAgg]] partial-stat columns (row count; per value
  * column non-null count / sum / min / max). The view definition
  * (keys, values) and the SYNCED BASE VERSION persist beside it, so
  * `refresh(spark, basePath, viewPath)` needs only the two paths.
  *
  * Refresh algorithm (one [[Snapshot.diffVersions]] call + one pruned
  * base scan + ONE atomic fold commit):
  *  1. diff the base between the synced version and its head — net
  *     row-level changes over the whole window, however many commits
  *     it spans; a compaction in the window contributes NOTHING (the
  *     diffVersions contract), so maintenance-only windows are free.
  *  2. the distinct group keys of the diff are the AFFECTED GROUPS.
  *  3. recompute exactly those groups from the base PINNED AT the
  *     window's end version (snapshot-consistent: the refreshed view
  *     equals `aggregate(base@toVersion)` even under concurrent
  *     writers), via a semi-join the scan pushes down.
  *  4. replace the affected groups' view rows with the recomputed
  *     totals in one fold-flip commit — groups whose rows all vanished
  *     simply have no recomputed row and drop out atomically.
  *
  * Every affected group is RECOMPUTED, including insert-only ones that
  * pure partial-merging could patch cheaper, for two load-bearing
  * reasons: min/max are not invertible under deletes (any IVM of them
  * needs group recomputation anyway), and recomputing from the pinned
  * base makes refresh IDEMPOTENT — a crash between the view commit
  * and the sync-pointer write merely re-runs the same window onto the
  * same values, where a partial-ADD would double-count it. The cost
  * story at 100 TB: the diff reads only the window's symmetric-
  * difference dirs, the recompute scans only rows whose groups
  * changed (zone maps / partition pruning on key-ordered bases cut
  * the probe further), and the shuffle carries affected-group rows
  * only — against a full rebuild's full-table scan + full shuffle.
  *
  * Float caveat shared with [[MaterializedAgg]]: SUM of doubles is
  * reorder-sensitive; feed integer units for hash-stable totals.
  */
object IncrementalView {

  /** Outcome of one [[refresh]]: the version window applied, groups
    * whose totals were recomputed (and survive), and groups dropped
    * because none of their rows survived the window. */
  final case class RefreshStats(fromVersion: Long, toVersion: Long,
                                refreshedGroups: Long, droppedGroups: Long)

  private final case class ViewDef(keys: Seq[String], values: Seq[String],
                                   syncedVersion: Long)

  private def defFile(viewPath: String) =
    new org.apache.hadoop.fs.Path(viewPath, "_view_def.json")

  private def writeDef(spark: SparkSession, viewPath: String,
                       d: ViewDef): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val ks = root.putArray("keys"); d.keys.foreach(ks.add)
    val vs = root.putArray("values"); d.values.foreach(vs.add)
    root.put("syncedVersion", d.syncedVersion)
    // atomic overwrite-swap: a crash mid-update must leave SOME def
    // readable — the sync pointer is allowed to lag (refresh is
    // idempotent), never to vanish
    Snapshot.atomicOverwrite(spark.sessionState.newHadoopConf(),
      defFile(viewPath), mapper.writeValueAsString(root))
  }

  private def readDef(spark: SparkSession, viewPath: String): ViewDef = {
    val f = defFile(viewPath)
    val fs = f.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(f), s"$viewPath is not an incremental view " +
      "(no _view_def.json) — build(...) it first")
    val in = fs.open(f)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    def arr(n: String): Seq[String] = {
      val it = node.get(n).elements()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next().asText()
      b.result()
    }
    ViewDef(arr("keys"), arr("values"), node.get("syncedVersion").asLong())
  }

  private def requireBase(spark: SparkSession, basePath: String): Snapshot.Manifest =
    Snapshot.latest(spark, basePath).getOrElse(throw new IllegalStateException(
      s"$basePath is not snapshot-enabled — an incremental view follows " +
        "its base's manifest versions"))

  /** Build (or rebuild) the view: one full aggregate of the base's
    * live rows at its current version, landed as a table reset and
    * snapshot-enabled (refresh commits through the manifest protocol).
    * Returns the synced base version. */
  def build(spark: SparkSession, basePath: String, viewPath: String,
            keys: Seq[String], values: Seq[String]): Long = {
    val bm = requireBase(spark, basePath)
    val totals = MaterializedAgg.partialRows(
      Snapshot.readBatches(spark, basePath, bm).drop("batch_id"),
      keys, values)
    Snapshot.withTableReset(spark, viewPath) {
      totals.withColumn("batch_id", lit(-1L))
        .write.partitionBy("batch_id").mode("overwrite").parquet(viewPath)
    }
    if (!Snapshot.isEnabled(spark, viewPath)) Snapshot.enable(spark, viewPath)
    writeDef(spark, viewPath, ViewDef(keys, values, bm.version))
    bm.version
  }

  /** Delete-aware incremental refresh (see the object doc for the
    * algorithm and why affected groups recompute rather than
    * partial-merge). No-ops — zero data IO past one manifest read —
    * when the base hasn't moved or the window's net diff is empty
    * (e.g. compaction-only). Fails loudly when the base's version
    * went BACKWARDS (a rebuild reset its history): the view must be
    * re-built, silently re-syncing would fabricate totals. */
  def refresh(spark: SparkSession, basePath: String,
              viewPath: String): RefreshStats = {
    val d = readDef(spark, viewPath)
    val bm = requireBase(spark, basePath)
    val (fromV, toV) = (d.syncedVersion, bm.version)
    if (toV == fromV) return RefreshStats(fromV, toV, 0L, 0L)
    require(toV > fromV,
      s"base $basePath is at v$toV but the view synced v$fromV — the " +
        "base history was reset/rebuilt; rebuild the view")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val diff = Snapshot.diffVersions(spark, basePath, fromV, toV)
    val touched = diff.select(d.keys.map(col): _*).distinct().persist(lvl)
    try {
      if (touched.count() == 0L) { // maintenance-only window
        writeDef(spark, viewPath, d.copy(syncedVersion = toV))
        return RefreshStats(fromV, toV, 0L, 0L)
      }
      // recompute the affected groups from the base PINNED at toV —
      // snapshot-consistent under concurrent base writers; the
      // semi-join keeps only affected-group rows in the aggregate
      val recomputed = MaterializedAgg.partialRows(
        Snapshot.readAt(spark, basePath, toV).drop("batch_id")
          .join(touched, d.keys, "left_semi"),
        d.keys, d.values).persist(lvl)
      try {
        val nRefreshed = recomputed.count()
        val nDropped = touched
          .join(recomputed.select(d.keys.map(col): _*), d.keys, "left_anti")
          .count()
        val vm = Snapshot.latest(spark, viewPath).getOrElse(
          throw new IllegalStateException(
            s"$viewPath lost its manifests — rebuild the view"))
        val viewLive = Snapshot.readBatches(spark, viewPath, vm)
        // view batches holding an affected group's row must fold
        val affected = viewLive.join(touched, d.keys, "left_semi")
          .select(col("batch_id").cast("long")).distinct()
          .collect().map(_.getLong(0)).toSeq.sorted
        val survivors = (
          if (affected.isEmpty) recomputed
          else viewLive.filter(col("batch_id").isin(affected: _*))
            .join(touched, d.keys, "left_anti").drop("batch_id")
            .unionByName(recomputed))
        if (affected.nonEmpty && nRefreshed == 0L && survivors.isEmpty) {
          // pure vanish emptying whole view batches: manifest-only edit
          Snapshot.commitEdit(spark, viewPath, vm, remove = affected,
            allowConcurrentAdds = false)
        } else if (affected.nonEmpty || nRefreshed > 0L) {
          // ONE atomic fold-flip: replaced groups + dropped groups land
          // together; readers see the old view or the new one, never a
          // half-refreshed mix
          val foldId = Snapshot.freshFoldId(spark, viewPath, vm)
          survivors.write.mode("overwrite")
            .parquet(s"$viewPath/batch_id=$foldId")
          Snapshot.commitEdit(spark, viewPath, vm, add = Seq(foldId),
            remove = affected,
            newStats = Map(foldId ->
              Snapshot.computeBatchStats(spark, viewPath, foldId)),
            allowConcurrentAdds = false, removeIsFold = true)
        }
        // sync pointer LAST: a crash before this line re-runs the same
        // window onto the same recomputed values (idempotent)
        writeDef(spark, viewPath, d.copy(syncedVersion = toV))
        RefreshStats(fromV, toV, nRefreshed, nDropped)
      } finally recomputed.unpersist(blocking = false)
    } finally touched.unpersist(blocking = false)
  }

  /** The view's totals, reader-shaped like [[MaterializedAgg.read]]
    * (`n_rows`, `<v>_cnt/_sum/_min/_max/_avg` per value column) — but
    * with NO merge aggregate: the table already holds one consolidated
    * row per group, so this is a pure projection. */
  def read(spark: SparkSession, viewPath: String): DataFrame = {
    val d = readDef(spark, viewPath)
    val stored = Snapshot.read(spark, viewPath)
    stored.select((d.keys.map(col) :+
      col(MaterializedAgg.RowsCol).as("n_rows")) ++ d.values.flatMap { v =>
      Seq(col(s"${v}__cnt").as(s"${v}_cnt"),
        col(s"${v}__sum").as(s"${v}_sum"),
        col(s"${v}__min").as(s"${v}_min"),
        col(s"${v}__max").as(s"${v}_max"),
        when(col(s"${v}__cnt") > 0,
          col(s"${v}__sum").cast("double") / col(s"${v}__cnt"))
          .as(s"${v}_avg"))
    }: _*)
  }

  /** Spec hook: the base version the view last synced. */
  private[graft] def syncedVersion(spark: SparkSession, viewPath: String): Long =
    readDef(spark, viewPath).syncedVersion

  /** Spec hook: roll the sync pointer back (simulating a crash between
    * the view commit and the pointer write). */
  private[graft] def rollbackSync(spark: SparkSession, viewPath: String,
                                  toVersion: Long): Unit = {
    val d = readDef(spark, viewPath)
    writeDef(spark, viewPath, d.copy(syncedVersion = toVersion))
  }
}
