package graft.tools


import graft.SparkEntry

/** Hotspot profiling utility: run one declared query N times in a warm
  * session and print per-run wall seconds — separates one-time costs
  * (derived-lake materialization, codegen) from steady-state execution,
  * which is what Bench's timed pass measures.
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <queryName> [runs]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus, "graft-timequery")
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"TIMEQ run$i%d ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n%d")
    }
    spark.stop()
  }
}
