package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.sources.dsv2.{GraftCatalog, LakeLog}

/** The SQL `CALL` maintenance surface over the lake catalog
  * (`graft_lake.system.history/rollback/expire/compact`) and the
  * `dataChange=false` compaction contract: same rows, new layout,
  * invisible to incremental consumers.
  */
class LakeProcedureSpec extends SparkSpec {

  private var n = 0
  private def withCatalog[A](f: (String, String) => A): A = {
    val root = Files.createTempDirectory("graft-proc").toString
    n += 1
    val cat = s"proccat$n"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  test("CALL compact bins small files as a dataChange=false commit: " +
       "fewer files, identical rows, old layout still time-travelable") {
    withCatalog { (cat, root) =>
      val dir = s"$root/db/c"
      // the TIMESTAMP column is a regression pin: the staging write
      // used Spark's default INT96 timestamp encoding, which the
      // connector's reader rejects — one compact made the table
      // permanently unreadable
      spark.sql(s"CREATE TABLE $cat.db.c (k BIGINT, v STRING, ts TIMESTAMP)")
      // 3 appends × 8-way repartition = 24 small files
      (0 until 3).foreach { i =>
        spark.range(i * 1000, (i + 1) * 1000)
          .selectExpr("id AS k", "concat('v', id) AS v",
            "timestamp_micros(1700000000000000 + id) AS ts")
          .repartition(8).createOrReplaceTempView("proc_c_batch")
        spark.sql(s"INSERT INTO $cat.db.c SELECT * FROM proc_c_batch")
      }
      val before = LakeLog.current(dir).get.files.size
      assert(before == 24, s"fixture expects 24 small files, got $before")

      val res = spark.sql(
        s"CALL $cat.system.compact('db.c', ${64L << 20})").collect()
      assert(res.length == 1)
      assert(res(0).getInt(0) == 24, "files_before")
      val after = res(0).getInt(1)
      assert(after < 24 && after >= 1, s"compaction must shrink: $after")

      val head = LakeLog.current(dir).get
      assert(head.operation == "compact" && !head.dataChange)
      assert(head.files.size == after)
      // contents byte-identical under the new layout — including the
      // TIMESTAMP column read back THROUGH the connector
      assert(spark.table(s"$cat.db.c").count() == 3000)
      assert(spark.table(s"$cat.db.c").agg(org.apache.spark.sql.functions
        .sum(col("k"))).head.getLong(0) == (0L until 3000L).sum)
      val t7 = spark.sql(s"SELECT ts FROM $cat.db.c WHERE k = 7")
        .head.getTimestamp(0)
      assert(t7.toInstant.toEpochMilli == 1700000000000L + 0,
        s"timestamp mangled by the rewrite: $t7")
      // the pre-compact snapshot still reads the OLD 24-file layout
      val v3 = spark.sql(s"SELECT * FROM $cat.db.c VERSION AS OF 3")
      assert(v3.count() == 3000)
      assert(LakeLog.snapshotAt(dir, 3L).files.size == 24)
    }
  }

  test("the streaming source skips compaction commits natively — no " +
       "skipChangeCommits needed — and later appends still flow") {
    withCatalog { (cat, root) =>
      val out = Files.createTempDirectory("graft-proc-out").toString
      spark.sql(s"CREATE TABLE $cat.db.s (k BIGINT)")
      spark.range(100).selectExpr("id AS k").repartition(6)
        .createOrReplaceTempView("proc_s_w1")
      spark.sql(s"INSERT INTO $cat.db.s SELECT * FROM proc_s_w1")

      def drain(): Unit = {
        val q = spark.readStream.table(s"$cat.db.s")
          .writeStream.format("parquet")
          .option("path", s"$out/data")
          .option("checkpointLocation", s"$out/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drain()
      assert(spark.read.parquet(s"$out/data").count() == 100)

      // maintenance between drains: a replace commit, but dataChange=false
      spark.sql(s"CALL $cat.system.compact('db.s', ${64L << 20})")
      assert(!LakeLog.current(s"$root/db/s").get.dataChange)
      spark.range(100, 130).selectExpr("id AS k")
        .createOrReplaceTempView("proc_s_w2")
      spark.sql(s"INSERT INTO $cat.db.s SELECT * FROM proc_s_w2")
      drain() // must NOT throw and must NOT re-emit compacted rows
      val rows = spark.read.parquet(s"$out/data")
      assert(rows.count() == 130, "append after compaction flows once")
      assert(rows.select("k").distinct().count() == 130, "no replays")
    }
  }

  test("CALL zorder clusters the layout so footer stats prune on EVERY " +
       "listed dimension — and stays a dataChange=false rewrite") {
    withCatalog { (cat, root) =>
      val dir = s"$root/db/z"
      spark.sql(s"CREATE TABLE $cat.db.z (x INT, y INT, payload BIGINT)")
      // insertion order clusters NEITHER dim: x cycles fast, y hops
      graft.sources.dsv2.LakeTableIO.rowGroupBytes = 8L << 10
      try spark.sql(
        s"""INSERT INTO $cat.db.z
           |SELECT CAST(id % 128 AS INT), CAST((id * 37) % 128 AS INT), id
           |FROM range(16384)""".stripMargin)
      finally graft.sources.dsv2.LakeTableIO.rowGroupBytes = 128L << 20

      def planned(c: String, v: Int): (Int, Int) = {
        val q = spark.sql(s"SELECT payload FROM $cat.db.z WHERE $c = $v")
        val desc = q.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.scan.description()
        }.mkString("\n")
        val m = "rowgroups=(\\d+)/(\\d+)".r.findFirstMatchIn(desc).get
        (m.group(1).toInt, m.group(2).toInt)
      }
      val (px0, pt0) = planned("x", 5)
      assert(pt0 >= 8, s"fixture needs many row groups, got $pt0")
      assert(px0 > pt0 * 3 / 4,
        s"scattered layout must defeat pruning on x: $px0/$pt0")

      val res = spark.sql(
        s"CALL $cat.system.zorder('db.z', 'x,y', 4)").collect()
      assert(res.head.getInt(1) == 4, s"target files: ${res.head}")
      val head = LakeLog.current(dir).get
      assert(head.operation.startsWith("zorder") && !head.dataChange)

      val (px1, pt1) = planned("x", 5)
      val (py1, _) = planned("y", 9)
      assert(px1 < pt1, s"z-order must prune on x: $px1/$pt1")
      assert(py1 < pt1, s"z-order must prune on y: $py1/$pt1")
      // same rows, same answers
      assert(spark.table(s"$cat.db.z").count() == 16384)
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.z WHERE x = 5")
        .head.getLong(0) == 128)
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.z WHERE y = 9")
        .head.getLong(0) == 128)
    }
  }

  test("single-column zorder clusters too (regression: the Int shift " +
       "for bits=32 wrapped and normalized every row to bucket zero)") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.z1 (k BIGINT)")
      graft.sources.dsv2.LakeTableIO.rowGroupBytes = 8L << 10
      try spark.sql(
        s"""INSERT INTO $cat.db.z1
           |SELECT (id * 2654435761) % 100000 FROM range(16384)""".stripMargin)
      finally graft.sources.dsv2.LakeTableIO.rowGroupBytes = 128L << 20
      spark.sql(s"CALL $cat.system.zorder('db.z1', 'k', 4)")
      val q = spark.sql(s"SELECT k FROM $cat.db.z1 WHERE k < 1000")
      val desc = q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.description()
      }.mkString
      val m = "rowgroups=(\\d+)/(\\d+)".r.findFirstMatchIn(desc).get
      assert(m.group(1).toInt < m.group(2).toInt,
        s"single-col cluster must prune: $desc")
      assert(spark.table(s"$cat.db.z1").count() == 16384)
    }
  }

  test("CALL history renders the audit trail; rollback and expire " +
       "return their outcomes as result rows") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.h (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.h SELECT id FROM range(50)")
      spark.sql(s"DELETE FROM $cat.db.h WHERE k < 10")

      val hist = spark.sql(s"CALL $cat.system.history('db.h')")
        .orderBy("version").collect()
      assert(hist.map(_.getString(1)).toSeq ==
        Seq("create", "append", "delete"))
      assert(hist.forall(_.getBoolean(6)), "DML commits carry dataChange")

      val rb = spark.sql(s"CALL $cat.system.rollback('db.h', 1)").collect()
      assert(rb.head.getLong(0) == 3L, "rollback commits a new head")
      assert(spark.table(s"$cat.db.h").count() == 50)

      val ex = spark.sql(s"CALL $cat.system.expire('db.h', 1)").collect()
      assert(ex.head.getInt(0) == 3, "three manifests expired")
      assert(spark.table(s"$cat.db.h").count() == 50, "head intact")
    }
  }

  test("hostile identifiers cannot escape the catalog root, and all-digit " +
       "ref names are rejected before they can shadow snapshot ids") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.safe (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.safe SELECT id FROM range(5)")
      // `..` as a table name would resolve to the catalog root itself —
      // DROP TABLE would then recursively delete EVERY table
      intercept[Exception] {
        spark.sql(s"DROP TABLE $cat.db.`..`")
      }
      intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.db.`a/b`").collect()
      }
      assert(spark.table(s"$cat.db.safe").count() == 5, "root intact")
      // all-digit tag/branch names would be shadowed by (or shadow)
      // numeric VERSION AS OF resolution
      intercept[Exception] {
        spark.sql(s"CALL $cat.system.tag('db.safe', '123', 1)").collect()
      }
      intercept[Exception] {
        spark.sql(s"CALL $cat.system.branch('db.safe', '42')").collect()
      }
    }
  }

  test("a failed multi-change ALTER leaves neither a half-applied schema " +
       "nor phantom audit commits") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.al (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO $cat.db.al SELECT id, 'x' FROM range(5)")
      val before = LakeLog.versions(s"$root/db/al").size
      // second column collides — the whole statement must be a no-op
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.al ADD COLUMNS (a INT, v INT)")
      }
      assert(spark.table(s"$cat.db.al").schema.fieldNames.toSeq ==
        Seq("k", "v"), "schema must be untouched")
      assert(LakeLog.versions(s"$root/db/al").size == before,
        "no phantom alter_* commits for changes that never happened")
    }
  }

  test("unknown procedures and wrong namespaces fail loud") {
    withCatalog { (cat, _) =>
      val e1 = intercept[Exception] {
        spark.sql(s"CALL $cat.system.vacuum('db.x')").collect()
      }
      assert(e1.getMessage.contains("no such procedure") ||
        Option(e1.getCause).exists(_.getMessage.contains("no such procedure")),
        s"wrong error: ${e1.getMessage}")
      intercept[Exception] {
        spark.sql(s"CALL $cat.other.history('db.x')").collect()
      }
    }
  }
}
