package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver test tables (TESTDATA.md): one parquet per table
  * under `sfDir`. All queries resolve inputs through here so the read path
  * (format, options) is controlled in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
