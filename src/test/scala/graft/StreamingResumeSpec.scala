package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Checkpoint-resume semantics of the file-source streams: a restarted
  * query with the SAME checkpoint must process only files that arrived
  * since the last run, exactly once — the property that makes the
  * weekly-drop pipeline (reference Readme.md:8) safe to run as a
  * resumable stream: each run picks up the new week, never re-ingests
  * history, and a crash between runs loses nothing.
  */
class StreamingResumeSpec extends SparkSpec {

  test("AvailableNow restart from checkpoint ingests only new files, exactly once") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-resume").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(src))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("batch", StringType)))

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // week 1 arrives, first run ingests it
    (0L until 100L).map((_, "w1")).toDF("id", "batch")
      .coalesce(1).write.mode("append").parquet(src)
    runOnce()
    val afterFirst = spark.read.schema(schema).parquet(out)
    assert(afterFirst.count() == 100)

    // week 2 arrives; the resumed run must add exactly it, not re-read w1
    (100L until 150L).map((_, "w2")).toDF("id", "batch")
      .coalesce(1).write.mode("append").parquet(src)
    runOnce()
    val afterSecond = spark.read.schema(schema).parquet(out)
    assert(afterSecond.count() == 150, "must append only the new file")
    val byBatch = afterSecond.groupBy("batch").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBatch == Map("w1" -> 100L, "w2" -> 50L),
      s"exactly-once per arrival, got $byBatch")
    // ids unique: nothing double-ingested across the restart
    assert(afterSecond.select("id").distinct().count() == 150)
  }
}
