package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.write.WriterCommitMessage

import graft.sources.dsv2.{EpochFileMessage, EpochStreamingWrite}

/** The epoch-commit protocol of the custom DSv2 streaming sink, exercised
  * directly at the StreamingWrite seam (the query-level oracle already
  * proves the happy path publishes every row exactly once):
  *
  *   - a COMMITTED epoch's marker makes a REPLAYED commit a no-op — the
  *     re-staged files are discarded, nothing is double-published;
  *   - ABORT removes staged files without touching published data;
  *   - the end-to-end run publishes one marker per data micro-batch.
  */
class Dsv2EpochSinkSpec extends SparkSpec {

  private val schema = org.apache.spark.sql.types.StructType.fromDDL(
    "id LONG, v LONG, tag STRING")

  private def stage(root: String, name: String): String = {
    val p = java.nio.file.Paths.get(root, "_staging", name)
    Files.createDirectories(p.getParent)
    Files.writeString(p, "1,2,t1\n")
    p.toString
  }

  test("a replayed epoch commit is a no-op: the marker wins, re-staged " +
       "files are discarded, nothing is double-published") {
    val root = Files.createTempDirectory("epoch-sink").toString
    val w = new EpochStreamingWrite(root, schema)
    val first = stage(root, "e7-p0-t0")
    w.commit(7L, Array[WriterCommitMessage](EpochFileMessage(first, 1L)))
    val dataDir = java.nio.file.Paths.get(root, "data")
    assert(Files.list(dataDir).count() == 1)
    assert(Files.exists(java.nio.file.Paths.get(root, "_commits", "7")))

    // failure between sink-commit and checkpoint-advance → Spark re-runs
    // the epoch: same data re-staged under a new task attempt
    val replay = stage(root, "e7-p0-t1")
    w.commit(7L, Array[WriterCommitMessage](EpochFileMessage(replay, 1L)))
    assert(Files.list(dataDir).count() == 1, "replay double-published")
    assert(!Files.exists(java.nio.file.Paths.get(replay)),
      "replayed staging file not cleaned up")
  }

  test("a replay after a crash mid-publish (renames done, marker missing) " +
       "sweeps the residue and republishes idempotently") {
    val root = Files.createTempDirectory("epoch-sink").toString
    val w = new EpochStreamingWrite(root, schema)
    // simulate the interrupted first attempt: two parts already renamed
    // into data/, driver died before writing _commits/3
    val dataDir = java.nio.file.Paths.get(root, "data")
    Files.createDirectories(dataDir)
    Files.writeString(dataDir.resolve("epoch-3-part-0.csv"), "9,9,stale\n")
    Files.writeString(dataDir.resolve("epoch-3-part-1.csv"), "8,8,stale\n")
    // the replay stages only ONE part (repartitioned retry) — without the
    // residue sweep, part-1 from the dead attempt would survive under the
    // new marker as a sealed duplicate
    val replay = stage(root, "e3-p0-t1")
    w.commit(3L, Array[WriterCommitMessage](EpochFileMessage(replay, 1L)))
    val visible = Files.list(dataDir).iterator().asScala
      .map(_.getFileName.toString).toSeq
      .filterNot(_.startsWith(".")).sorted
    assert(visible == Seq("epoch-3-part-0.csv"),
      s"residue survived the replayed commit: $visible")
    assert(Files.readString(dataDir.resolve("epoch-3-part-0.csv")) ==
      "1,2,t1\n", "replayed part holds the stale attempt's bytes")
    assert(Files.exists(java.nio.file.Paths.get(root, "_commits", "3")))
  }

  test("abort removes staged files and leaves published data untouched") {
    val root = Files.createTempDirectory("epoch-sink").toString
    val w = new EpochStreamingWrite(root, schema)
    val ok = stage(root, "e1-p0-t0")
    w.commit(1L, Array[WriterCommitMessage](EpochFileMessage(ok, 1L)))
    val failed = stage(root, "e2-p0-t0")
    w.abort(2L, Array[WriterCommitMessage](
      EpochFileMessage(failed, 1L), EpochFileMessage(null, 0L)))
    assert(!Files.exists(java.nio.file.Paths.get(failed)))
    assert(Files.list(java.nio.file.Paths.get(root, "data")).count() == 1)
    assert(!Files.exists(java.nio.file.Paths.get(root, "_commits", "2")))
  }

  test("a clusterby sink declares RequiresDistributionAndOrdering: Spark " +
       "plans the exchange pre-write and no key spans two published files") {
    val root = Files.createTempDirectory("epoch-sink-clustered").toString
    val q = spark.readStream
      .format("graft.sources.dsv2.RangeStreamSource")
      .option("end", "10000").option("batchRows", "10000")
      .load()
      .select("id", "v", "tag")
      .writeStream
      .outputMode("append")
      .format("graft.sources.dsv2.EpochSink")
      .option("path", s"$root/out")
      .option("clusterby", "tag")
      .option("orderby", "id")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val dataDir = java.nio.file.Paths.get(root, "out", "data")
    val files = Files.list(dataDir).iterator().asScala.toSeq
      .filterNot(_.getFileName.toString.startsWith("."))
    // 5 tag values clustered into tasks: within this single-epoch run
    // each tag's rows live in EXACTLY one file (the one-key-per-task
    // lake layout)...
    val parsed = files.map { f =>
      f -> Files.readAllLines(f).iterator().asScala.toSeq
        .filter(_.nonEmpty).map(_.split(','))
    }.toMap
    val tagToFiles = parsed.toSeq.flatMap { case (f, lines) =>
      lines.map(_(2) -> f)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(tagToFiles.keySet.size == 5)
    tagToFiles.foreach { case (tag, fs) =>
      assert(fs.size == 1, s"tag $tag spans ${fs.size} files")
    }
    // ...and requiredOrdering really sorted within the task by
    // [tag, id]: a file may legally hold several clustered tags, but
    // each tag's run is contiguous and id-ascending (without the
    // declared ordering the exchange interleaves the 8 source splits
    // out of order)
    parsed.foreach { case (f, lines) =>
      val tagRuns = lines.map(_(2))
      assert(tagRuns == tagRuns.sorted,
        s"$f tags not contiguous/sorted: ${tagRuns.distinct}")
      lines.groupBy(_(2)).foreach { case (tag, rows) =>
        val ids = rows.map(_(0).toLong)
        assert(ids == ids.sorted,
          s"$f tag $tag not id-sorted: ${ids.take(8)}...")
      }
    }
    val total = parsed.values.map(_.size).sum
    assert(total == 10000)
  }

  test("the end-to-end sink run publishes one commit marker per data " +
       "micro-batch and no staging residue") {
    val n = SparkEntry.queries("stream_dsv2_sink")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(n == 100000L)
    // the query roots its sink at streamDir("dsv2_sink", sfDir) — same
    // (query, sf dir) key every streaming query uses
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft-stream", s"dsv2_sink-$key", "out")
    // visible entries only — Hadoop's checksummed local FS shadows every
    // file with a hidden .<name>.crc sibling
    def visible(dir: java.nio.file.Path): Seq[String] =
      if (!Files.exists(dir)) Seq.empty
      else {
        val s = Files.list(dir)
        try s.iterator().asScala.map(_.getFileName.toString).toSeq
          .filterNot(_.startsWith("."))
        finally s.close()
      }
    // 100000 rows / 20000-row admission cap = 5 committed epochs
    assert(visible(root.resolve("_commits")).sorted ==
      Seq("0", "1", "2", "3", "4"))
    assert(visible(root.resolve("_staging")).isEmpty,
      "staging files survived the run")
  }
}
