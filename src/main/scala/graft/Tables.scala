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

  /** Conf the session must carry to read the `events` table —
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects unless it may surface the raw int64 nanos. Set at session
    * CONSTRUCTION (Verify / Bench / the test builder all do), not
    * per-read: it is not a datasource option, and mutating session conf
    * inside a reader is racy under concurrent reads.
    */
  val nanosConf: (String, String) =
    ("spark.sql.legacy.parquet.nanosAsLong", "true")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // read the raw int64 nanos (see nanosConf) and rebuild a
      // microsecond TimestampType column (exact integer truncation,
      // matching DuckDB's CAST(ts AS TIMESTAMP)).
      require(spark.conf.getOption(nanosConf._1).contains(nanosConf._2),
        s"session must set ${nanosConf._1}=${nanosConf._2} at construction " +
          "to read the events table")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
