package graft.tools

import org.apache.spark.sql.functions._

/** Decode-path microbench: CTAS `orders` into a connector table once,
  * then time FULL row scans (a residual filter keeps the metadata
  * aggregate from short-circuiting the read). Isolates the
  * PartitionReader's value-decode cost from fixture/planning noise —
  * the number that moves when the read path changes.
  *
  * Usage: runMain graft.tools.ScanBench <sfDir> [runs=5]
  */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.local(cpus, "graft-scanbench")
    import graft.sources.dsv2.LakeCatalogs
    LakeCatalogs.register(spark)
    val ns = LakeCatalogs.ns(sfDir)
    val tbl = s"${LakeCatalogs.CatalogName}.$ns.scanbench_orders"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    graft.Tables(spark, sfDir, "orders").writeTo(tbl).create()
    // wide decode: every column of every row crosses the reader
    val q = spark.table(tbl)
      .where(col("o_orderkey") >= 0L) // residual: forces the row scan
      .agg(count(lit(1)), sum("o_custkey"),
        sum(length(col("o_orderstatus"))),
        min("o_orderdate"), sum(col("o_totalprice")))
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val r = q.collect()
      println(f"SCANB run$i ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        s"row=${r.head}")
    }
    println("SCANB plan " + q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Scan")).mkString(" | "))
    spark.stop()
  }
}
