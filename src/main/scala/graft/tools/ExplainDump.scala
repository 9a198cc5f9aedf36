package graft.tools

import graft.SparkEntry

/** Plan-artifact utility: write `explain("formatted")` output for the
  * named declared queries to files — the before/after plan evidence an
  * optimization round commits (plans/rNN/<query>_<tag>.txt). The dump
  * is the INITIAL formatted plan (the shape `df.explain("formatted")`
  * prints: scans with PushedFilters/ReadSchema, join strategies,
  * Exchange placement, WholeStageCodegen spans); AQE's runtime
  * re-optimizations (coalesced reads, skew splits) are additive on top
  * and carry their own spec pins where they matter.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(outDir)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    // stop() in finally: a bad query name or a throwing fixture must
    // not leave non-daemon Spark threads holding the JVM open
    try names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote ${name}_$tag.txt (${s.length} chars)")
    } finally spark.stop()
  }
}
