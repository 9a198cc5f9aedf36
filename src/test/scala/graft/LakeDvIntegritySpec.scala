package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.operators.LakeSnapshots
import graft.sources.dsv2.{GraftCatalog, LakeLog, LakeTx}

/** Deletion-vector integrity across the maintenance surface: every
  * path that rewrites, restores, or replays table state must carry the
  * DV map with it — a dropped DV silently RESURRECTS deleted rows (the
  * worst failure class a lakehouse has, because nothing errors).
  *
  * Pinned here:
  *   - zorder skips DV'd files (mirror of compact's guard);
  *   - rollback restores the TARGET's DV map verbatim, both directions
  *     (past a MOR delete: rows return; across rewrite_deletes: rows
  *     stay deleted);
  *   - expire never vacuums the staged files of a decided-but-unapplied
  *     multi-table transaction, regardless of age;
  *   - a fresh stream's initial snapshot subtracts the first retained
  *     version's DVs;
  *   - footer-stats pruning resolves In/IsNull/IsNotNull through field
  *     ids like comparisons (a stale same-named column must never be
  *     consulted).
  */
class LakeDvIntegritySpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def withCatalog[A](f: (String, String) => A): A = {
    val root = Files.createTempDirectory("graft-dvi").toString
    n += 1
    val cat = s"dvicat$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  private def mkMor(cat: String, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.$name")
    spark.sql(s"CREATE TABLE $cat.db.$name (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.mode'='merge-on-read')")
  }

  test("zorder on a merge-on-read table skips DV'd files: deleted rows " +
       "stay deleted, the DVs stay attached, and DV-less files still " +
       "cluster") {
    withCatalog { (cat, root) =>
      mkMor(cat, "z")
      val dir = s"$root/db/z"
      spark.sql(s"INSERT INTO $cat.db.z " +
        "SELECT id, concat('v', id) FROM range(100)")
      spark.sql(s"INSERT INTO $cat.db.z " +
        "SELECT id, concat('v', id) FROM range(100, 200)")
      spark.sql(s"DELETE FROM $cat.db.z WHERE k % 10 = 3")
      val preHead = LakeLog.current(dir).get
      assert(preHead.dvs.nonEmpty, "fixture must carry DVs")
      val dvFiles = preHead.dvs.keySet
      assert(spark.table(s"$cat.db.z").count() == 180)

      val (before, after) = LakeSnapshots.zorder(spark, dir, Seq("k"), 2)
      val head = LakeLog.current(dir).get
      // the DV'd files were NOT rewritten — their DVs are still live
      assert(dvFiles.subsetOf(head.files.toSet),
        "DV'd files must survive zorder untouched")
      assert(head.dvs == preHead.dvs, "zorder must not retire live DVs")
      // and the deleted rows did not resurrect (the bug this pins:
      // a plain-parquet rewrite of a DV'd file re-emits dead rows
      // under dataChange=false, invisible to every consumer)
      assert(spark.table(s"$cat.db.z").count() == 180,
        "zorder resurrected deleted rows")
      assert(after <= before, s"clustering must not grow files: " +
        s"$before -> $after")
      // after materializing the DVs, those files cluster normally
      LakeSnapshots.rewriteDeletes(spark, dir)
      LakeSnapshots.zorder(spark, dir, Seq("k"), 2)
      assert(spark.table(s"$cat.db.z").count() == 180)
      assert(LakeLog.current(dir).get.dvs.isEmpty)
    }
  }

  test("the record-assembly escape hatch (-Dgraft.lake.reader.fast=" +
       "false) subtracts deletion vectors identically: same rows, same " +
       "count, no reader misalignment (regression: the DV-skip branch " +
       "once assumed the fast path)") {
    withCatalog { (cat, _) =>
      mkMor(cat, "eh")
      spark.sql(s"INSERT INTO $cat.db.eh " +
        "SELECT id, concat('v', id) FROM range(100)")
      spark.sql(s"DELETE FROM $cat.db.eh WHERE k % 10 = 4")
      val fast = spark.table(s"$cat.db.eh").collect().map(_.toSeq).toSet
      val prev = System.getProperty("graft.lake.reader.fast")
      System.setProperty("graft.lake.reader.fast", "false")
      try {
        val slow = spark.table(s"$cat.db.eh").collect().map(_.toSeq).toSet
        assert(slow == fast, "escape-hatch path diverged from fast path")
        assert(slow.size == 90)
      } finally {
        if (prev == null) System.clearProperty("graft.lake.reader.fast")
        else System.setProperty("graft.lake.reader.fast", prev)
      }
    }
  }

  test("rollback restores the target's DV map verbatim: back past a MOR " +
       "delete the rows RETURN; back across rewrite_deletes the rows " +
       "STAY deleted (old files re-attach their DVs)") {
    withCatalog { (cat, root) =>
      mkMor(cat, "r")
      val dir = s"$root/db/r"
      spark.sql(s"INSERT INTO $cat.db.r " +
        "SELECT id, concat('v', id) FROM range(100)")
      val vInsert = LakeLog.current(dir).get.version
      spark.sql(s"DELETE FROM $cat.db.r WHERE k < 40")
      val vDelete = LakeLog.current(dir).get.version
      assert(spark.table(s"$cat.db.r").count() == 60)
      LakeSnapshots.rewriteDeletes(spark, dir)
      assert(LakeLog.current(dir).get.dvs.isEmpty)
      assert(spark.table(s"$cat.db.r").count() == 60)

      // across rewrite_deletes: the target carried DVs; the re-added
      // old files must re-attach them, else the 40 dead rows resurrect
      LakeSnapshots.rollback(dir, vDelete)
      val h1 = LakeLog.current(dir).get
      assert(h1.dvs == LakeLog.snapshotAt(dir, vDelete).dvs,
        "rollback must restore the target snapshot's DV map")
      assert(spark.table(s"$cat.db.r").count() == 60,
        "rollback across rewrite_deletes resurrected deleted rows")

      // past the MOR delete: the target had NO DVs; keeping the head's
      // would keep the rows deleted
      LakeSnapshots.rollback(dir, vInsert)
      val h2 = LakeLog.current(dir).get
      assert(h2.dvs.isEmpty, "pre-delete target has no DVs")
      assert(spark.table(s"$cat.db.r").count() == 100,
        "rollback past a MOR delete must restore the deleted rows")
    }
  }

  test("expire never vacuums staged files of a DECIDED-but-unapplied " +
       "transaction (marker present, apply crashed) — recovery still " +
       "lands the full row count afterwards") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING)")
      val dir = s"$root/db/t"
      spark.sql(s"INSERT INTO $cat.db.t SELECT id, 'seed' FROM range(5)")
      val sa = LakeTx.stageAppend(spark,
        (0L until 10L).map(i => (i, s"a$i")).toDF("k", "v"),
        dir, "append")
      // decided: the marker IS the commit point; the apply then crashes
      val txid = java.util.UUID.randomUUID().toString
      LakeTx.writeMarker(root, txid, Seq(sa))
      // catalog-owned visibility already shows the committed rows
      assert(spark.table(s"$cat.db.t").count() == 15)
      // an aged expire (grace 0: every file is "old") must treat the
      // staged names as referenced — they are committed data in no
      // manifest yet, not orphans
      LakeSnapshots.expire(dir, keepLast = 1, graceMs = 0L)
      assert(sa.added.forall(f => new java.io.File(s"$dir/$f").exists()),
        "expire vacuumed a decided transaction's staged files")
      assert(LakeTx.recover(root) == 1)
      assert(spark.table(s"$cat.db.t").count() == 15,
        "recovery must land the full transaction after the expire")
    }
  }

  test("a fresh stream's initial snapshot subtracts the first retained " +
       "version's deletion vectors — no pre-stream deleted rows are " +
       "emitted") {
    withCatalog { (cat, root) =>
      mkMor(cat, "s")
      val dir = s"$root/db/s"
      spark.sql(s"INSERT INTO $cat.db.s " +
        "SELECT id, concat('v', id) FROM range(100)")
      spark.sql(s"DELETE FROM $cat.db.s WHERE k % 10 = 7")
      // trim the front so a fresh stream anchors at a snapshotStart
      // whose manifest carries live DVs
      LakeSnapshots.expire(dir, keepLast = 1, graceMs = 0L)
      assert(LakeLog.current(dir).get.dvs.nonEmpty)

      val out = Files.createTempDirectory("graft-dvi-out").toString
      val q = spark.readStream.table(s"$cat.db.s")
        .writeStream.format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.read.parquet(s"$out/data")
      assert(got.count() == 90,
        "initial snapshot emitted rows deleted before the stream started")
      assert(got.filter("k % 10 = 7").count() == 0)
    }
  }

  test("IsNull/IsNotNull/In resolve through field ids at the footer-" +
       "stats layer: after drop-and-re-add, the stale same-named " +
       "column's stats must not prune groups that back-fill null") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.e (k BIGINT, c BIGINT)")
      // old vintage: c fully populated (nulls==0 in its footer stats)
      spark.sql(s"INSERT INTO $cat.db.e SELECT id, id * 10 FROM range(50)")
      spark.sql(s"ALTER TABLE $cat.db.e DROP COLUMN c")
      spark.sql(s"ALTER TABLE $cat.db.e ADD COLUMN c BIGINT")
      // new vintage: c populated under its FRESH id
      spark.sql(s"INSERT INTO $cat.db.e SELECT id, id FROM range(50, 60)")

      // every pre-evolution row back-fills null for the re-added c;
      // with the raw-name footer consult the stale column's nulls==0
      // pruned all their groups and this returned 10 instead of 50
      assert(spark.sql(
        s"SELECT count(*) AS n FROM $cat.db.e WHERE c IS NULL")
        .head().getLong(0) == 50L)
      assert(spark.sql(
        s"SELECT count(*) AS n FROM $cat.db.e WHERE c IS NOT NULL")
        .head().getLong(0) == 10L)
      // In-list: the stale column's range [0,490] contains 55*10=550? no
      // — use a value inside the STALE range but matched by no current
      // row, so a raw-name consult would keep groups it then filters,
      // while a value in the CURRENT range must return its row
      assert(spark.sql(
        s"SELECT count(*) AS n FROM $cat.db.e WHERE c IN (55, 57)")
        .head().getLong(0) == 2L)
    }
  }
}
