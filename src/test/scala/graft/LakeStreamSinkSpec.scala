package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.sources.dsv2.{GraftCatalog, LakeLog, LakeWrite}

/** Streaming INTO the versioned lake: `writeStream.toTable` commits one
  * manifest per epoch, tagged `(queryId, epochId)` so a replayed epoch
  * is a clean no-op — the lake table is an exactly-once streaming sink,
  * closing the loop with the commit-replaying streaming source.
  */
class LakeStreamSinkSpec extends SparkSpec {

  private var n = 0
  private def withCatalog[A](f: (String, String) => A): A = {
    val root = Files.createTempDirectory("graft-sink").toString
    n += 1
    val cat = s"sinkcat$n"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  test("lake-to-lake pipe: the stream drains source commits into epoch " +
       "commits on the target; resume moves only the new delta") {
    withCatalog { (cat, root) =>
      val ckpt = Files.createTempDirectory("graft-sink-ck").toString
      spark.sql(s"CREATE TABLE $cat.db.src (k BIGINT, v STRING)")
      spark.sql(s"CREATE TABLE $cat.db.dst (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO $cat.db.src SELECT id, 'a' FROM range(100)")
      spark.sql(s"INSERT INTO $cat.db.src SELECT id, 'b' FROM range(100, 140)")

      def pipe(): Unit = {
        val q = spark.readStream.table(s"$cat.db.src")
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .toTable(s"$cat.db.dst")
        q.awaitTermination()
      }
      pipe()
      assert(spark.table(s"$cat.db.dst").count() == 140)
      // the target's history is epoch commits, one per micro-batch
      val ops = LakeLog.versions(s"$root/db/dst")
        .map(LakeLog.snapshotAt(s"$root/db/dst", _).operation)
      assert(ops.count(_.startsWith("stream_epoch(")) >= 1, ops.toString)

      spark.sql(s"INSERT INTO $cat.db.src SELECT id, 'c' FROM range(140, 150)")
      pipe()
      val rows = spark.table(s"$cat.db.dst")
      assert(rows.count() == 150, "resume adds only the new commit")
      assert(rows.select("k").distinct().count() == 150, "no replays")
      // and the piped table is itself streamable — the loop closes
      val out = Files.createTempDirectory("graft-sink-out").toString
      val q2 = spark.readStream.table(s"$cat.db.dst")
        .writeStream.format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
      assert(spark.read.parquet(s"$out/data").count() == 150)
    }
  }

  test("a replayed epoch is a no-op: same (query, epoch) commits once, " +
       "the replay's staged files are swept, rows never double") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.r (k BIGINT)")
      val dir = s"$root/db/r"
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))
      val write = new LakeWrite(dir, schema, replaceFiles = null,
        "append", queryId = "q-test")
      val sw = write.toStreaming
      def stageEpoch(): Array[org.apache.spark.sql.connector.write.WriterCommitMessage] = {
        val factory = sw.createStreamingWriterFactory(null)
        val w = factory.createWriter(0, 0L, 0L)
        (0 until 10).foreach(i => w.write(
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](i.toLong))))
        Array(w.commit())
      }
      sw.commit(0L, stageEpoch())
      assert(spark.table(s"$cat.db.r").count() == 10)
      // replay of epoch 0 (driver restart re-runs the last batch)
      sw.commit(0L, stageEpoch())
      assert(spark.table(s"$cat.db.r").count() == 10, "replay must no-op")
      val staging = new java.io.File(s"$dir/_staging")
      assert(!staging.exists() || staging.listFiles().isEmpty,
        "replay residue must be swept")
      // a NEW epoch from the same query still lands
      sw.commit(1L, stageEpoch())
      assert(spark.table(s"$cat.db.r").count() == 20)
    }
  }
}
