package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.sources.dsv2.{GraftCatalog, LakeLog}

/** Named refs on the snapshot log: Iceberg-style immutable TAGS that
  * resolve in `VERSION AS OF`, survive expire (a tag is a retention
  * promise), and serve as streaming backfill cursors via the
  * `startingVersion` option.
  */
class LakeTagSpec extends SparkSpec {

  private var n = 0
  private def withCatalog[A](f: (String, String) => A): A = {
    val root = Files.createTempDirectory("graft-tag").toString
    n += 1
    val cat = s"tagcat$n"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  test("CALL tag pins a name; VERSION AS OF resolves it; tags are " +
       "immutable until dropped; CALL tags lists them") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.t SELECT id FROM range(100)")
      spark.sql(s"DELETE FROM $cat.db.t WHERE k < 40")

      spark.sql(s"CALL $cat.system.tag('db.t', 'baseline', 1)")
      assert(spark.sql(
        s"SELECT * FROM $cat.db.t VERSION AS OF 'baseline'").count() == 100)
      assert(spark.table(s"$cat.db.t").count() == 60, "head unaffected")

      // immutable: retagging the same name fails loud
      val e = intercept[Exception] {
        spark.sql(s"CALL $cat.system.tag('db.t', 'baseline', 2)")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("immutable")), s"wrong: ${e.getMessage}")

      spark.sql(s"CALL $cat.system.tag('db.t', 'after-clean', 2)")
      val listed = spark.sql(s"CALL $cat.system.tags('db.t')").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(listed == Map("baseline" -> 1L, "after-clean" -> 2L))

      assert(spark.sql(s"CALL $cat.system.drop_tag('db.t', 'baseline')")
        .head.getBoolean(0))
      intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.db.t VERSION AS OF 'baseline'")
          .collect()
      }
      // dropped name can be re-pinned elsewhere
      spark.sql(s"CALL $cat.system.tag('db.t', 'baseline', 2)")
    }
  }

  test("expire keeps tagged snapshots alive — manifests AND data files — " +
       "and reclaims them only after the tag drops") {
    withCatalog { (cat, root) =>
      val dir = s"$root/db/e"
      spark.sql(s"CREATE TABLE $cat.db.e (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.e SELECT id FROM range(50)")
      spark.sql(s"DELETE FROM $cat.db.e WHERE k >= 25 AND k < 40") // v2
      spark.sql(s"INSERT INTO $cat.db.e SELECT id FROM range(50, 60)") // v3
      spark.sql(s"CALL $cat.system.tag('db.e', 'keepme', 1)")

      val (dropped1, _) = graft.operators.LakeSnapshots.expire(dir, 1, graceMs = 0L)
      assert(dropped1 == 2,
        s"v0 and v2 expire; tagged v1 and head v3 survive: $dropped1")
      // the tag still time-travels, with its data files intact
      assert(spark.sql(
        s"SELECT * FROM $cat.db.e VERSION AS OF 'keepme'").count() == 50)
      assert(spark.table(s"$cat.db.e").count() == 45, "head intact")

      spark.sql(s"CALL $cat.system.drop_tag('db.e', 'keepme')")
      val (dropped2, deleted2) = graft.operators.LakeSnapshots.expire(dir, 1, graceMs = 0L)
      assert(dropped2 == 1 && deleted2 > 0,
        s"untagged snapshot now reclaims files: ($dropped2, $deleted2)")
      assert(spark.table(s"$cat.db.e").count() == 45, "head intact")
    }
  }

  test("startingVersion (id or tag) starts a fresh stream at that commit " +
       "— the backfill cursor — and the checkpoint resumes past it") {
    withCatalog { (cat, _) =>
      val out = Files.createTempDirectory("graft-tag-out").toString
      spark.sql(s"CREATE TABLE $cat.db.s (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.s SELECT id FROM range(100)")        // v1
      spark.sql(s"INSERT INTO $cat.db.s SELECT id FROM range(100, 150)")   // v2
      spark.sql(s"CALL $cat.system.tag('db.s', 'cutover', 2)")
      spark.sql(s"INSERT INTO $cat.db.s SELECT id FROM range(150, 160)")   // v3

      def drain(opts: Map[String, String]): Unit = {
        var r = spark.readStream
        opts.foreach { case (k, v) => r = r.option(k, v) }
        val q = r.table(s"$cat.db.s")
          .writeStream.format("parquet")
          .option("path", s"$out/data")
          .option("checkpointLocation", s"$out/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drain(Map("startingVersion" -> "cutover"))
      val first = spark.read.parquet(s"$out/data")
      assert(first.count() == 60, s"v2+v3 only, got ${first.count()}")
      assert(first.agg(org.apache.spark.sql.functions.min("k"))
        .head.getLong(0) == 100, "v1 must be skipped")

      spark.sql(s"INSERT INTO $cat.db.s SELECT id FROM range(160, 170)")   // v4
      drain(Map("startingVersion" -> "cutover")) // resumed: option ignored
      assert(spark.read.parquet(s"$out/data").count() == 70,
        "resume adds only v4, no re-read of the backfill range")
    }
  }
}
