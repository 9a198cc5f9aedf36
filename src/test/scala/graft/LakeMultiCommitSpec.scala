package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.dsv2.{GraftCatalog, LakeLog, LakeTx}

/** Multi-table atomic commit ([[graft.sources.dsv2.LakeTx]]): the
  * decide-point is ONE marker rename, apply is idempotent per table,
  * and recovery finishes what a crash interrupted — so a transaction
  * can never settle half-applied.
  */
class LakeMultiCommitSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def withCatalog[A](f: (String, String) => A): A = {
    val root = Files.createTempDirectory("graft-mtx").toString
    n += 1
    val cat = s"mtxcat$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  private def mk(cat: String, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.$name")
    spark.sql(s"CREATE TABLE $cat.db.$name (k BIGINT, v STRING)")
  }

  test("happy path: one transaction lands appends in BOTH tables; the " +
       "marker is gone and each table carries the txn-tagged commit") {
    withCatalog { (cat, root) =>
      mk(cat, "a"); mk(cat, "b")
      val dfa = (0L until 10L).map(i => (i, s"a$i")).toDF("k", "v")
      val dfb = (0L until 5L).map(i => (i, s"b$i")).toDF("k", "v")
      val txid = LakeTx.commit(root, Seq(
        LakeTx.stageAppend(spark, dfa, s"$root/db/a", "append"),
        LakeTx.stageAppend(spark, dfb, s"$root/db/b", "append")))
      assert(spark.table(s"$cat.db.a").count() == 10)
      assert(spark.table(s"$cat.db.b").count() == 5)
      assert(!new java.io.File(s"$root/_txn/tx-$txid.json").exists(),
        "completed transaction marker must be forgotten")
      Seq("a", "b").foreach { t =>
        val ops = LakeLog.versions(s"$root/db/$t")
          .map(LakeLog.snapshotAt(s"$root/db/$t", _).operation)
        assert(ops.count(_ == s"txn($txid)") == 1, s"$t: $ops")
      }
    }
  }

  test("crash between the two applies: one table committed, the marker " +
       "still present — recovery finishes the OTHER table exactly once " +
       "and re-running recovery is a no-op (all-or-nothing, idempotent)") {
    withCatalog { (cat, root) =>
      mk(cat, "a"); mk(cat, "b")
      val sa = LakeTx.stageAppend(spark,
        (0L until 10L).map(i => (i, s"a$i")).toDF("k", "v"),
        s"$root/db/a", "append")
      val sb = LakeTx.stageAppend(spark,
        (0L until 5L).map(i => (i, s"b$i")).toDF("k", "v"),
        s"$root/db/b", "append")
      // simulate the crash window: marker written (tx IS decided),
      // first table applied, then the driver dies
      val txid = java.util.UUID.randomUUID().toString
      LakeTx.writeMarker(root, txid, Seq(sa, sb))
      LakeTx.applyOne(txid, sa)
      assert(spark.table(s"$cat.db.a").count() == 10)
      assert(spark.table(s"$cat.db.b").count() == 0,
        "b not yet applied — the crash window")
      // recovery (run by any later commit on the root) finishes b
      assert(LakeTx.recover(root) == 1)
      assert(spark.table(s"$cat.db.a").count() == 10,
        "a must not double-apply")
      assert(spark.table(s"$cat.db.b").count() == 5)
      // idempotent: nothing left to do, no version churn
      val vsA = LakeLog.versions(s"$root/db/a")
      val vsB = LakeLog.versions(s"$root/db/b")
      assert(LakeTx.recover(root) == 0)
      assert(LakeLog.versions(s"$root/db/a") == vsA)
      assert(LakeLog.versions(s"$root/db/b") == vsB)
    }
  }

  test("crash BEFORE the marker: staged files are invisible orphans in " +
       "both tables, recovery has nothing to do, and expire reclaims " +
       "the stage") {
    withCatalog { (cat, root) =>
      mk(cat, "a"); mk(cat, "b")
      val sa = LakeTx.stageAppend(spark,
        (0L until 10L).map(i => (i, s"a$i")).toDF("k", "v"),
        s"$root/db/a", "append")
      LakeTx.stageAppend(spark,
        (0L until 5L).map(i => (i, s"b$i")).toDF("k", "v"),
        s"$root/db/b", "append")
      // no marker: the transaction never happened
      assert(LakeTx.recover(root) == 0)
      assert(spark.table(s"$cat.db.a").count() == 0)
      assert(spark.table(s"$cat.db.b").count() == 0)
      // the staged bytes are on disk but in no manifest
      assert(sa.added.forall(f =>
        new java.io.File(s"$root/db/a/$f").exists()))
      graft.operators.LakeSnapshots.expire(s"$root/db/a", keepLast = 1,
        graceMs = 0L)
      assert(sa.added.forall(f =>
        !new java.io.File(s"$root/db/a/$f").exists()),
        "aborted-stage orphans must be vacuumable")
    }
  }
}
