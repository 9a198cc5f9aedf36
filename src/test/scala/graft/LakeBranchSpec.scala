package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.sources.dsv2.{GraftCatalog, LakeLog}

/** Writable branches on the snapshot log — the write-audit-publish
  * workflow: stage commits on a branch (`db.t.branch_<name>` spelling,
  * same DML surface as main), audit them via the branch read
  * (`VERSION AS OF '<name>'`), publish with
  * `CALL system.fast_forward` only while main still sits at the fork
  * point, or drop the branch and main never saw a byte.
  */
class LakeBranchSpec extends SparkSpec {

  private var n = 0
  private def withCatalog[A](f: (String, String) => A): A = {
    val root = Files.createTempDirectory("graft-br").toString
    n += 1
    val cat = s"brcat$n"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  test("write-audit-publish: branch writes stay invisible to main, the " +
       "branch read audits them, fast_forward publishes atomically") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO $cat.db.t SELECT id, 'base' FROM range(100)")
      spark.sql(s"CALL $cat.system.branch('db.t', 'dev')")

      // WRITE: DML through the branch spelling — insert AND row-level op
      spark.sql(s"INSERT INTO $cat.db.t.branch_dev " +
        "SELECT id, 'staged' FROM range(100, 130)")
      spark.sql(s"UPDATE $cat.db.t.branch_dev SET v = 'fixed' WHERE k < 10")
      assert(spark.table(s"$cat.db.t").count() == 100,
        "main must not see branch writes")
      assert(spark.table(s"$cat.db.t")
        .where(col("v") === "fixed").count() == 0)

      // AUDIT: the branch read sees the staged state
      val audit = spark.sql(s"SELECT * FROM $cat.db.t VERSION AS OF 'dev'")
      assert(audit.count() == 130)
      assert(audit.where(col("v") === "fixed").count() == 10)
      val listed = spark.sql(s"CALL $cat.system.branches('db.t')").collect()
      assert(listed.length == 1 && listed(0).getString(0) == "dev")

      // PUBLISH: fast-forward lands both branch commits on main
      val ff = spark.sql(s"CALL $cat.system.fast_forward('db.t', 'dev')")
      assert(ff.head.getInt(0) == 2, "insert + update published")
      val main = spark.table(s"$cat.db.t")
      assert(main.count() == 130)
      assert(main.where(col("v") === "fixed").count() == 10)
      assert(spark.sql(s"CALL $cat.system.branches('db.t')").count() == 0,
        "published branch is dropped")
      // main history carries the branch commits as ordinary versions
      assert(spark.sql(s"SELECT * FROM $cat.db.t VERSION AS OF 2")
        .count() == 130)
    }
  }

  test("fast_forward conflicts when main advanced past the fork point — " +
       "branch work is preserved for replay, main is untouched") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.c (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.c SELECT id FROM range(50)")
      spark.sql(s"CALL $cat.system.branch('db.c', 'dev')")
      spark.sql(s"INSERT INTO $cat.db.c.branch_dev SELECT id FROM range(50, 60)")
      // main advances under the branch
      spark.sql(s"INSERT INTO $cat.db.c SELECT id FROM range(100, 105)")

      val e = intercept[Exception] {
        spark.sql(s"CALL $cat.system.fast_forward('db.c', 'dev')").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("fork point")), s"wrong: ${e.getMessage}")
      assert(spark.table(s"$cat.db.c").count() == 55, "main untouched")
      assert(spark.sql(s"SELECT * FROM $cat.db.c VERSION AS OF 'dev'")
        .count() == 60, "branch work preserved")
    }
  }

  test("abandoned branch: drop_branch discards staged work; expire then " +
       "reclaims its files, but not before") {
    withCatalog { (cat, root) =>
      val dir = s"$root/db/a"
      spark.sql(s"CREATE TABLE $cat.db.a (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.a SELECT id FROM range(50)")
      spark.sql(s"CALL $cat.system.branch('db.a', 'bad')")
      spark.sql(s"INSERT INTO $cat.db.a.branch_bad SELECT id FROM range(1000, 1100)")

      // the staged file is protected from expire while the branch lives
      val (_, deleted1) = graft.operators.LakeSnapshots.expire(dir, 1, graceMs = 0L)
      assert(deleted1 == 0, "live branch files must survive the vacuum")
      assert(spark.sql(s"SELECT * FROM $cat.db.a VERSION AS OF 'bad'")
        .count() == 150)

      spark.sql(s"CALL $cat.system.drop_branch('db.a', 'bad')")
      assert(spark.table(s"$cat.db.a").count() == 50, "main never saw it")
      val (_, deleted2) = graft.operators.LakeSnapshots.expire(dir, 1, graceMs = 0L)
      assert(deleted2 > 0, "dropped branch's staged files are reclaimed")
      assert(spark.table(s"$cat.db.a").count() == 50)
    }
  }

  test("branch names collide with nothing: tag/branch namespaces are " +
       "mutually exclusive; streaming a branch fails loud") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.x (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.x SELECT id FROM range(10)")
      spark.sql(s"CALL $cat.system.tag('db.x', 'pinned', 1)")
      intercept[Exception] {
        spark.sql(s"CALL $cat.system.branch('db.x', 'pinned')").collect()
      }
      spark.sql(s"CALL $cat.system.branch('db.x', 'live')")
      intercept[Exception] {
        spark.sql(s"CALL $cat.system.tag('db.x', 'live', 1)").collect()
      }
      val e = intercept[Exception] {
        val q = spark.readStream.table(s"$cat.db.x.branch_live")
          .writeStream.format("noop")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("fast-forward")), s"wrong: ${e.getMessage}")
    }
  }
}
