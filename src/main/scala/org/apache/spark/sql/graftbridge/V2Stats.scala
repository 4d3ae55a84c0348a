package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation,
  PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter

/** [[V1ScanWrapper]] forwarding `estimateStatistics` to the wrapped
  * scan. Spark's pushdown wraps every [[V1Scan]] in a plain
  * `V1ScanWrapper`, which does NOT implement
  * [[SupportsReportStatistics]] — so a V1-bridged V2 table silently
  * loses its reported statistics right after pushdown and every scan
  * costs `defaultSizeInBytes` (= never broadcastable) to the join
  * planner. The subclass keeps the case-class `unapply`/type matches
  * used by `DataSourceV2Strategy` intact while restoring the stats
  * interface. */
class StatsV1ScanWrapper(v1Scan: V1Scan with SupportsReportStatistics,
                         handledFilters: Seq[Filter],
                         pushedDownOperators: PushedDownOperators)
    extends V1ScanWrapper(v1Scan, handledFilters, pushedDownOperators)
    with SupportsReportStatistics {
  override def estimateStatistics(): Statistics = v1Scan.estimateStatistics()

  /** Distinct from the plain wrapper under case-class equality —
    * without this, `TreeNode.transform`'s `fastEquals` sees the
    * stats-bearing replacement as "unchanged" and silently drops it. */
  override def canEqual(that: Any): Boolean = that.isInstanceOf[StatsV1ScanWrapper]
}

/** Optimizer rule restoring reported statistics to V1-bridged scans
  * (see [[StatsV1ScanWrapper]]). Runs after the V2 pushdown rules:
  * inject via `SparkSessionExtensions.injectPreCBORule`, or append to
  * `spark.experimental.extraOptimizations` on a running session. */
object RestoreV1ScanStatistics extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r @ DataSourceV2ScanRelation(_, w: V1ScanWrapper, _, _, _)
        if !w.isInstanceOf[StatsV1ScanWrapper] &&
          w.v1Scan.isInstanceOf[SupportsReportStatistics] =>
      r.copy(scan = new StatsV1ScanWrapper(
        w.v1Scan.asInstanceOf[V1Scan with SupportsReportStatistics],
        w.handledFilters, w.pushedDownOperators))
  }
}
