package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.queries.DeltaQueries
import graft.sources.AgencyLake

/** Dynamic-partition-pruning evidence for the snapshot lake (SURVEY §2.1
  * S5 scale note). Static pruning covers the reference's literal-date
  * reads; this spec pins the RUNTIME path: when the dates of interest
  * come from a dim-table filter (unknowable at plan time), Catalyst must
  * inject a dynamicpruning subquery on the fact scan's importdate
  * partition column so only the matching importdate= directories are
  * listed — the difference between scanning 2 weeks and scanning years
  * of history at 100 TB. Same plan-assertion style as BucketedJoinSpec
  * and AqeSkewJoinSpec.
  */
class DppSpec extends SparkSpec {

  test("dim-driven snapshot read plans a dynamicpruning partition filter") {
    val res = DeltaQueries.queries("delta_history_dpp")(spark, sfDir)
    val rows = res.collect()

    // the dim selects history dates 1 and 2 of 4 (r_regionkey 0 and 1)
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      AgencyLake.historyDates.take(2))

    val qe = res.queryExecution
    val planStr = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p                        => p.toString
    }
    assert(planStr.contains("dynamicpruningexpression"),
      s"expected a dynamicpruning partition filter in:\n$planStr")

    // the fact scan must have LISTED only the two matching partitions —
    // pruning that merely filters rows post-scan would not move the
    // selected-partition count. Query stages are leaves to TreeNode
    // .collect, so walk them explicitly.
    def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
      val children = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      (p match {
        case s: FileSourceScanExec => Seq(s)
        case _ => Nil
      }) ++ children.flatMap(allScans)
    }
    val scans = allScans(qe.executedPlan)
    val factScan = scans
      .find(_.metadata.get("PartitionFilters").exists(_.nonEmpty))
      .getOrElse(fail(s"no partition-filtered scan in:\n$planStr"))
    val selected = factScan.metrics.get("numPartitions")
      .map(_.value)
      .getOrElse(fail("fact scan has no numPartitions metric"))
    assert(selected == 2,
      s"expected 2 of ${AgencyLake.historyDates.size} partitions selected, got $selected")
  }
}
