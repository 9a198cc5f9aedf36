package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.TimestampType

/** The r8 regression, made un-regressable: the driver regenerated the lake
  * and `events.ts` flipped from int64 TIMESTAMP(NANOS) to TIMESTAMP(MICROS)
  * — the batch reader errored loudly, but the streaming queries' hand-written
  * LongType schemas read the micros as if they were nanos and produced
  * 0/wrong rows with NO error. This spec writes the SAME tiny events fixture
  * in every encoding a generator has shipped (int64-nanos, timestamp_ntz
  * micros, utc-adjusted timestamp) and asserts the one shared reader
  * ([[Tables.normalizeEventsTs]] / [[Tables.eventsStream]]) yields identical
  * batch AND streaming results from all of them — and that an encoding
  * outside the family fails loud with the column named.
  */
class TsEncodingSpec extends SparkSpec {

  /** Micro-fixture: 96 events, 1 minute apart, fixed epoch-micros values. */
  private def base: DataFrame =
    spark.range(0, 96).select(
      col("id").as("event_id"),
      (lit(1700000000000000L) + col("id") * 60L * 1000000L).as("ts_us"),
      (col("id") % 7).as("user_id"),
      element_at(array(lit("view"), lit("click"), lit("purchase")),
        (col("id") % 3 + 1).cast("int")).as("event_type"),
      (col("id") * 1.5).as("value"),
      lit("{}").as("props"))

  /** Write `df` as a SINGLE `events.parquet` FILE under a fresh dir —
    * the exact physical layout of the driver lake (a file, not a
    * directory), which is what `pathGlobFilter` matches in the stream
    * reader.
    */
  private def writeFixture(df: DataFrame, name: String): String = {
    val root = Files.createTempDirectory(s"graft-tsenc-$name")
    val tmp = root.resolve("_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written for $name"))
    Files.move(part, root.resolve("events.parquet"))
    Files.list(tmp).iterator().asScala.foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(tmp)
    root.toString
  }

  private def cols(ts: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
    Seq(col("event_id"), ts.as("ts"), col("user_id"), col("event_type"),
      col("value"), col("props"))

  private lazy val nanosDir = writeFixture(
    base.select(cols((col("ts_us") * 1000L).cast("long")): _*), "nanos")
  private lazy val ntzDir = writeFixture(
    base.select(cols(timestamp_micros(col("ts_us")).cast("timestamp_ntz")): _*), "ntz")
  private lazy val tzDir = writeFixture(
    base.select(cols(timestamp_micros(col("ts_us"))): _*), "tz")
  private lazy val allDirs = Seq("nanos" -> nanosDir, "ntz" -> ntzDir, "tz" -> tzDir)

  test("batch: every shipped ts encoding normalizes to identical TimestampType micros") {
    val expected = base.select(col("event_id"), col("ts_us")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    allDirs.foreach { case (name, dir) =>
      val got = Tables(spark, dir, "events")
      assert(got.schema("ts").dataType == TimestampType,
        s"$name: ts should normalize to TimestampType")
      val vals = got.select(col("event_id"), unix_micros(col("ts"))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(vals == expected, s"$name: normalized micros differ from source")
    }
  }

  test("streaming: the shared reader yields the same windowed counts from every encoding") {
    val results = allDirs.map { case (name, dir) =>
      val qn = s"tsenc_$name"
      spark.streams.active.filter(_.name == qn).foreach(_.stop())
      val q = Tables.eventsStream(spark, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .count()
        .select(col("window.start").as("h"), col("event_type"), col("count"))
        .writeStream.outputMode("complete").format("memory").queryName(qn)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = spark.table(qn).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
      name -> rows
    }
    val batchRows = Tables(spark, nanosDir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type")).count()
      .select(col("window.start"), col("event_type"), col("count")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
    assert(batchRows.nonEmpty, "fixture produced no windows")
    results.foreach { case (name, rows) =>
      assert(rows == batchRows,
        s"$name: streamed windows diverge from batch (${rows.size} vs ${batchRows.size})")
    }
  }

  test("an encoding outside the family fails loud with the column named") {
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventsTs(base.select(cols(col("ts_us").cast("double")): _*))
    }
    assert(e.getMessage.contains("events.ts"))
  }

  test("lake schema guard passes on the driver testdata and names drift") {
    Tables.assertLakeSchemas(spark, sfDir)
    // drifted lake: events.ts written as a string — the guard must name it
    val bad = Files.createTempDirectory("graft-badlake")
    Tables.names.foreach { t =>
      val src = if (t == "events")
        Tables(spark, sfDir, "events").limit(5)
          .withColumn("ts", col("ts").cast("string"))
      else spark.read.parquet(s"$sfDir/$t.parquet").limit(5)
      src.coalesce(1).write.mode("overwrite")
        .parquet(bad.resolve(s"$t.parquet").toString)
    }
    val e = intercept[IllegalStateException] {
      Tables.assertLakeSchemas(spark, bad.toString)
    }
    assert(e.getMessage.contains("events.ts"), e.getMessage)
  }
}
