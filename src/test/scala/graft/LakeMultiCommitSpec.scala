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
      // catalog-owned atomic visibility: the marker IS the commit
      // point, so a plain read of the UNAPPLIED participant already
      // unions its staged files — no half-applied middle is observable
      assert(spark.table(s"$cat.db.b").count() == 5,
        "b's apply is pending, but the decided marker makes it visible")
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

  test("a crashed stage's scratch dir under _staging is reclaimed by " +
       "expire once aged, and an in-grace one survives") {
    withCatalog { (cat, root) =>
      mk(cat, "a")
      // simulate a stage that died before renaming out of scratch
      val scratch = new java.io.File(s"$root/db/a/_staging/tx-dead")
      scratch.mkdirs()
      java.nio.file.Files.writeString(
        scratch.toPath.resolve("part-zombie.parquet"), "zombie")
      spark.sql(s"INSERT INTO $cat.db.a VALUES (1, 'x')")
      graft.operators.LakeSnapshots.expire(s"$root/db/a", keepLast = 1,
        graceMs = Long.MaxValue / 2) // nothing aged yet
      assert(scratch.exists(), "in-grace scratch must survive")
      graft.operators.LakeSnapshots.expire(s"$root/db/a", keepLast = 1,
        graceMs = 0L)
      assert(!scratch.exists(), "aged crashed-stage scratch is reclaimed")
      assert(spark.table(s"$cat.db.a").count() == 1)
    }
  }

  test("consistentView: a partially-applied transaction is invisible in " +
       "ALL tables (snapshot-isolation cut), recovery restores the head " +
       "view, and a later txn straddling the cut is hidden consistently") {
    withCatalog { (cat, root) =>
      mk(cat, "a"); mk(cat, "b")
      val (da, db) = (s"$root/db/a", s"$root/db/b")
      // txn0 lands fully — the committed floor
      LakeTx.commit(root, Seq(
        LakeTx.stageAppend(spark,
          (0L until 4L).map(i => (i, "t0")).toDF("k", "v"), da, "append"),
        LakeTx.stageAppend(spark,
          (0L until 4L).map(i => (i, "t0")).toDF("k", "v"), db, "append")))
      // txn1 crashes mid-apply: a applied, b not
      val sa = LakeTx.stageAppend(spark,
        (10L until 14L).map(i => (i, "t1")).toDF("k", "v"), da, "append")
      val sb = LakeTx.stageAppend(spark,
        (10L until 14L).map(i => (i, "t1")).toDF("k", "v"), db, "append")
      val tx1 = java.util.UUID.randomUUID().toString
      LakeTx.writeMarker(root, tx1, Seq(sa, sb))
      LakeTx.applyOne(tx1, sa)
      // plain heads are NOT torn (marker-union visibility): both show
      // t1 even though only a's apply landed — but the MANIFEST state
      // is mid-apply, which is what consistentView must cut below
      assert(spark.table(s"$cat.db.a").where("v = 't1'").count() == 4)
      assert(spark.table(s"$cat.db.b").where("v = 't1'").count() == 4)
      // the consistent cut hides t1 everywhere, keeps t0 everywhere
      val view = LakeTx.consistentView(root, Seq(da, db))
      def at(cattbl: String, v: Long) =
        spark.sql(s"SELECT * FROM $cat.db.$cattbl VERSION AS OF $v")
      val va = view(da).get
      val vb = view(db).get
      assert(at("a", va).where("v = 't1'").count() == 0, s"cut $view")
      assert(at("b", vb).where("v = 't1'").count() == 0)
      assert(at("a", va).where("v = 't0'").count() == 4)
      assert(at("b", vb).where("v = 't0'").count() == 4)
      // an ordinary append on top of a's torn state: still hidden BELOW
      // the cut (the cut stays under txn1's apply on a)
      spark.sql(s"INSERT INTO $cat.db.a VALUES (99, 'late')")
      val view2 = LakeTx.consistentView(root, Seq(da, db))
      assert(at("a", view2(da).get).where("v = 't1'").count() == 0)
      // recovery completes txn1 → the view returns to the heads
      LakeTx.recover(root)
      val view3 = LakeTx.consistentView(root, Seq(da, db))
      assert(view3(da).get == LakeLog.versions(da).last)
      assert(view3(db).get == LakeLog.versions(db).last)
      assert(at("a", view3(da).get).where("v = 't1'").count() == 4)
      assert(at("b", view3(db).get).where("v = 't1'").count() == 4)
    }
  }

  test("consistentView tear check: a COMMITTED txn straddling a cut " +
       "forced by a pending one is hidden in every table, not torn") {
    withCatalog { (cat, root) =>
      mk(cat, "a"); mk(cat, "b")
      val (da, db) = (s"$root/db/a", s"$root/db/b")
      // pending txn1: applied on a only (crash window), nothing on b yet
      val sa1 = LakeTx.stageAppend(spark,
        (0L until 2L).map(i => (i, "t1")).toDF("k", "v"), da, "append")
      val sb1 = LakeTx.stageAppend(spark,
        (0L until 2L).map(i => (i, "t1")).toDF("k", "v"), db, "append")
      val tx1 = java.util.UUID.randomUUID().toString
      LakeTx.writeMarker(root, tx1, Seq(sa1, sb1))
      LakeTx.applyOne(tx1, sa1)
      // txn2 lands FULLY on top while txn1 is still pending (built from
      // the primitives — LakeTx.commit would run recover() and finish
      // txn1 first): a@(version after txn1's apply), b@(its own head)
      val sa2 = LakeTx.stageAppend(spark,
        (10L until 12L).map(i => (i, "t2")).toDF("k", "v"), da, "append")
      val sb2 = LakeTx.stageAppend(spark,
        (10L until 12L).map(i => (i, "t2")).toDF("k", "v"), db, "append")
      val tx2 = java.util.UUID.randomUUID().toString
      LakeTx.writeMarker(root, tx2, Seq(sa2, sb2))
      LakeTx.applyOne(tx2, sa2)
      LakeTx.applyOne(tx2, sb2)
      LakeTx.forget(root, tx2)
      // hiding pending txn1 drops a's cut below txn1 AND txn2's applies;
      // the tear check must then hide txn2 on b too — the committed txn
      // is hidden EVERYWHERE, never torn
      val view = LakeTx.consistentView(root, Seq(da, db))
      Seq(("a", da), ("b", db)).foreach { case (t, d) =>
        val df = spark.sql(
          s"SELECT * FROM $cat.db.$t VERSION AS OF ${view(d).get}")
        assert(df.where("v = 't1'").count() == 0, s"$t tore txn1: $view")
        assert(df.where("v = 't2'").count() == 0, s"$t tore txn2: $view")
      }
      // recovery settles everything; the head view then shows both txns
      LakeTx.recover(root)
      val after = LakeTx.consistentView(root, Seq(da, db))
      Seq(("a", da), ("b", db)).foreach { case (t, d) =>
        val df = spark.sql(
          s"SELECT * FROM $cat.db.$t VERSION AS OF ${after(d).get}")
        assert(df.where("v = 't1'").count() == 2, s"$t")
        assert(df.where("v = 't2'").count() == 2, s"$t")
      }
    }
  }

  test("atomic plain reads across the whole lifecycle: invisible before " +
       "the marker, visible in ALL tables from the marker on (zero, one " +
       "or both applies landed), counted once after recovery — and a " +
       "join across both participants is never torn") {
    withCatalog { (cat, root) =>
      mk(cat, "a"); mk(cat, "b")
      val (da, db) = (s"$root/db/a", s"$root/db/b")
      def counts = (spark.table(s"$cat.db.a").count(),
        spark.table(s"$cat.db.b").count(),
        spark.table(s"$cat.db.a").as("x")
          .join(spark.table(s"$cat.db.b").as("y"), "k").count())
      val sa = LakeTx.stageAppend(spark,
        (0L until 8L).map(i => (i, s"a$i")).toDF("k", "v"), da, "append")
      val sb = LakeTx.stageAppend(spark,
        (0L until 8L).map(i => (i, s"b$i")).toDF("k", "v"), db, "append")
      assert(counts == ((0L, 0L, 0L)), "staged-only: nothing visible")
      val txid = java.util.UUID.randomUUID().toString
      LakeTx.writeMarker(root, txid, Seq(sa, sb))
      assert(counts == ((8L, 8L, 8L)),
        "decided, zero applies: the marker alone flips visibility")
      LakeTx.applyOne(txid, sa)
      assert(counts == ((8L, 8L, 8L)),
        "one apply landed: union-by-name counts each file once")
      LakeTx.applyOne(txid, sb)
      assert(counts == ((8L, 8L, 8L)), "both applied, marker not forgotten")
      LakeTx.forget(root, txid)
      assert(counts == ((8L, 8L, 8L)), "after forget: manifests carry it")
      // metadata COUNT(*) agrees with the row scan mid-window too
      val sc = LakeTx.stageAppend(spark,
        (100L until 104L).map(i => (i, "c")).toDF("k", "v"), da, "append")
      val tx2 = java.util.UUID.randomUUID().toString
      LakeTx.writeMarker(root, tx2, Seq(sc))
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.a")
        .collect().head.getLong(0) == 12)
      LakeTx.recover(root)
      assert(spark.table(s"$cat.db.a").count() == 12)
    }
  }

  test("concurrent apply race cannot double-commit: many threads racing " +
       "the same participant's apply leave exactly ONE txn-tagged " +
       "manifest (the dedupe check lives inside the version-race loop)") {
    withCatalog { (cat, root) =>
      mk(cat, "a")
      val da = s"$root/db/a"
      val sa = LakeTx.stageAppend(spark,
        (0L until 6L).map(i => (i, s"a$i")).toDF("k", "v"), da, "append")
      val txid = java.util.UUID.randomUUID().toString
      LakeTx.writeMarker(root, txid, Seq(sa))
      // a concurrent ordinary append keeps version numbers contended
      val races = 8
      val pool = java.util.concurrent.Executors.newFixedThreadPool(races)
      try {
        val tasks = (0 until races).map { _ =>
          pool.submit(new Runnable {
            override def run(): Unit = LakeTx.applyOne(txid, sa)
          })
        }
        tasks.foreach(_.get())
      } finally pool.shutdown()
      val ops = LakeLog.versions(da).map(LakeLog.snapshotAt(da, _).operation)
      assert(ops.count(_ == s"txn($txid)") == 1,
        s"double apply under race: $ops")
      assert(spark.table(s"$cat.db.a").count() == 6)
      LakeTx.recover(root)
      assert(spark.table(s"$cat.db.a").count() == 6)
    }
  }
}
