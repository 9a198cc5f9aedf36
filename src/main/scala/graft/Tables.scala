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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
      // rejects by default; read the raw int64 nanos and rebuild a
      // microsecond TimestampType column (exact integer truncation,
      // matching DuckDB's CAST(ts AS TIMESTAMP)).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
