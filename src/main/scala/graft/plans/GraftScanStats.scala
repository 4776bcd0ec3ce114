package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter

/** Restores manifest statistics to v2 catalog scans: the graft scan is
  * a `V1Scan` bridge, and Spark's `V2ScanRelationPushDown` wraps every
  * `V1Scan` in a `V1ScanWrapper` that implements ONLY `Scan` — so
  * `DataSourceV2ScanRelation.computeStats`'s
  * `case r: SupportsReportStatistics` never fires and every graft
  * catalog table reports `spark.sql.defaultSizeInBytes` (= never
  * auto-broadcast, however small or however hard the manifest pruned).
  * This rule swaps the wrapper for [[StatsV1ScanWrapper]], a drop-in
  * subclass that ALSO forwards `estimateStatistics()` to the wrapped
  * graft scan — planner pattern matches on the `V1ScanWrapper` case
  * class (instanceof + field accessors) keep working unchanged.
  *
  * The numbers flow from `SnapshotTable.scanEstimate`: exact per-file
  * manifest row counts of the POST-pushdown pruned file set, minus
  * fully-covered delete vectors, times the projection's default width
  * — so a filtered dimension read of a huge table reports its pruned
  * size and joins broadcast without hints. Estimates only round up.
  */
final case class GraftScanStats(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: DataSourceV2ScanRelation => r.scan match {
      case w: V1ScanWrapper if !w.isInstanceOf[StatsV1ScanWrapper] &&
          w.v1Scan.isInstanceOf[SupportsReportStatistics] =>
        r.copy(scan = new StatsV1ScanWrapper(w.v1Scan, w.handledFilters,
          w.pushedDownOperators))
      case _ => r
    }
  }
}

/** `V1ScanWrapper` + statistics forwarding. Subclassing the case class
  * is deliberate: `DataSourceV2Strategy` destructures the wrapper with
  * the case-class extractor, which accepts subclasses, so the physical
  * planning path is byte-identical — the ONLY observable change is
  * that `computeStats` now finds `SupportsReportStatistics`.
  */
final class StatsV1ScanWrapper(v1: V1Scan, handled: Seq[Filter],
    ops: PushedDownOperators) extends V1ScanWrapper(v1, handled, ops)
    with SupportsReportStatistics {

  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    v1.asInstanceOf[SupportsReportStatistics].estimateStatistics()

  // MUST break case-class equality with the plain wrapper: TreeNode
  // .transform keeps the ORIGINAL node when the rewritten one compares
  // equal (fastEquals), and the inherited equals ignores the subclass —
  // without this the swap in GraftScanStats silently never applies.
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(that: Any): Boolean = that match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _ => false
  }
}
