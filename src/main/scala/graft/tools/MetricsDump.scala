package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.SparkEntry

/** Operator-level metrics for one declared query: execute it, then walk
  * the (post-AQE) physical plan printing each operator's SQLMetrics —
  * output rows, shuffle bytes, spill sizes, peak memory. This is the
  * evidence layer between PlanCheck (static plan shape) and Bench (end
  * wall-clock): WHERE the rows and bytes actually went. A spill metric
  * > 0 on a local run is the early warning that the same stage breaks
  * executor memory at cluster scale.
  *
  * Usage: runMain graft.tools.MetricsDump <sfDir> <queryName>
  */
object MetricsDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-metrics")
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // collect() (not count()) so THIS queryExecution's operators run and
    // accumulate metrics — count() plans a separate Aggregate on top and
    // leaves the inspected plan's metrics at zero
    val n = df.collect().length
    println(s"=== $name ($n result rows)")
    def walk(p: SparkPlan, depth: Int): Unit = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      val interesting = p.metrics.toSeq
        .filter { case (_, m) => m.value > 0 }
        .sortBy(_._1)
        .map { case (k, m) => s"$k=${m.value}" }
      if (interesting.nonEmpty || inner.isEmpty)
        println("  " + ("  " * depth) + p.nodeName + ": " +
          interesting.mkString(", "))
      inner.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
