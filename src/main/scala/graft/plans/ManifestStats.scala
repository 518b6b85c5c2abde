package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** MANIFEST STATS → CATALYST STATISTICS for governed reads: a
  * snapshot-governed scan already KNOWS its exact row count — every
  * committed batch carries one in the manifest (`__rows`,
  * [[graft.operators.Snapshot.RowsStatKey]]) — yet a bare parquet plan
  * reports only compressed FILE BYTES as `sizeInBytes`. At scale that
  * estimate is the dangerous one: dictionary/RLE-compressed parquet
  * understates in-memory size by 10-100×, so a "small" dimension can
  * clear `spark.sql.autoBroadcastJoinThreshold` on disk bytes and then
  * OOM the driver when its 2M rows deserialize. This rule makes the
  * join-strategy decision stats-driven: `Snapshot.readBatches`
  * registers (exact batch-dir set → manifest row count) at plan-build
  * time, and the rule rewrites the matching `LogicalRelation` to carry
  * `CatalogStatistics(rowCount, rowCount × deserialized row width)` —
  * Catalyst's own `defaultSize` convention — so broadcasts flip ON
  * when the true row count is small and OFF when it is large, with no
  * hints anywhere. Pruned reads ([[graft.operators.Snapshot.readRange]]
  * and friends) register their SURVIVING batch subset with the subset's
  * row sum, so zone-map pruning and join planning compound.
  *
  * The rewrite only ATTACHES statistics (a `CatalogTable` whose only
  * live field is `stats`) — the relation, output, and scan are
  * untouched, so pushdown/pruning pins (PlanAuditSpec) are unaffected.
  * Registration is keyed by the qualified root-path SET: a relation
  * over any other path set — including the same table read WITHOUT
  * governance — is left alone. Idempotent under the fixed-point
  * optimizer batch (`catalogTable.isEmpty` guard). */
object ManifestStatsRule extends Rule[LogicalPlan] {

  /** qualified batch-dir set → total manifest row count. Bounded:
    * pruned reads mint a key per surviving subset, so the map is
    * cleared at a cap instead of growing with query history (a miss
    * only costs falling back to file-size estimates). */
  private val reg = TrieMap.empty[Set[String], Long]
  private val MaxEntries = 1024

  private[graft] def register(dirs: Set[String], rows: Long): Unit = {
    if (reg.size >= MaxEntries) reg.clear()
    reg.put(dirs, rows)
  }

  private[graft] def clear(): Unit = reg.clear()

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case lr: LogicalRelation if lr.catalogTable.isEmpty =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          reg.get(fs.location.rootPaths.map(_.toString).toSet) match {
            case Some(rows) =>
              // deserialized-size estimate: Catalyst's defaultSize per
              // output attribute + 8 bytes of row overhead (the
              // LocalRelation/EstimationUtils convention)
              val width = lr.output.map(_.dataType.defaultSize).sum + 8
              val stats = CatalogStatistics(
                sizeInBytes = BigInt(rows) * width,
                rowCount = Some(BigInt(rows)))
              lr.copy(catalogTable = Some(CatalogTable(
                identifier = TableIdentifier("graft_governed_scan"),
                tableType = CatalogTableType.EXTERNAL,
                storage = CatalogStorageFormat.empty,
                schema = fs.schema,
                stats = Some(stats))))
            case None => lr
          }
        case _ => lr
      }
  }
}
