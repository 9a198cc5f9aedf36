package graft.tools


import graft.SparkEntry

/** Plan-evidence utility: prints scan-level pruning/pushdown details for
  * one or all declared queries. Used to assert (not assume) that the
  * flagship delta executes partition-pruned scans — the reference's one
  * real optimization (agency-delta.go:165-166) — and that filters/columns
  * reach the parquet reader.
  *
  * Usage: runMain graft.tools.PlanCheck <sfDir> [queryName]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only = args.lift(1)
    val spark = graft.GraftSession.local("4", "graft-plancheck")
    spark.sparkContext.setLogLevel("ERROR")

    val names = only.map(Seq(_)).getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      println(s"=== $name")
      val seg = """(PartitionFilters|PushedFilters|ReadSchema): \[[^\]]*\]""".r
      plan.linesIterator.filter(_.contains("FileScan")).foreach { l =>
        val parts = seg.findAllIn(l).mkString(", ")
        println("  scan: " + (if (parts.nonEmpty) parts else l.trim.take(180)))
      }
      // DSv2 scans (the lake connector): the Scan's own description is
      // the evidence line — projected cols, rowgroups planned/total,
      // files pruned by partition tuples and by manifest stats, pushed
      // filters
      plan.linesIterator.filter(_.contains("BatchScan")).foreach { l =>
        println("  scan: " + l.trim.dropWhile(_ == '+').dropWhile(c =>
          c == '-' || c == ' ').take(260))
      }
      plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("Cartesian"))
        .foreach(l => println("  join: " +
          l.dropWhile(c => !c.isLetter).takeWhile(_ != ',').take(120)))
    }
    spark.stop()
  }
}
