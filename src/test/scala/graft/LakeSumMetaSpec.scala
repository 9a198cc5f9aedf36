package graft

import java.nio.file.Files

import graft.sources.dsv2.{GraftCatalog, LakeLog, LakeStats}

/** Metadata-only SUM / AVG ([[graft.sources.dsv2.LakeStats.ColStats]]
  * `sum`/`asum` + [[graft.sources.dsv2.LakeTableIO.metaAggregate]]):
  * the writer harvests EXACT per-file column sums as rows stream
  * through (parquet footers carry no sums, so this is a write-time
  * fact like the bloom filters), and an unfiltered / partition-
  * filtered SUM or AVG answers from the manifest alone — zero data
  * read. The absolute sum bounds every partial sum any fold order
  * could form, which is what lets the metadata answer PROVE the row
  * scan would not have overflowed: inside that region ANSI and legacy
  * agree exactly; outside it the push declines and the scan's own
  * semantics apply. Conservatism pins: deletion vectors, sum-less
  * vintages (external writes, compaction rewrites), overflow, and
  * decimal AVG all decline — never wrong, only slower.
  */
class LakeSumMetaSpec extends SparkSpec {

  private var n = 0
  private def withCatalog[A](f: (String, String) => A): A = {
    val root = Files.createTempDirectory("graft-summeta").toString
    n += 1
    val cat = s"sumcat$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  private def pushed(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("PushedAggregates")

  test("the writer harvests exact per-file (sum, abs-sum) for int/long/" +
       "decimal columns into the manifest; floats and strings carry none") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.h " +
        "(k BIGINT, i INT, d DECIMAL(12,2), f DOUBLE, s STRING)")
      spark.sql(s"INSERT INTO $cat.db.h SELECT " +
        "id, CAST(id % 10 AS INT) - 5, " +
        "CAST(id AS DECIMAL(12,2)) / 4, id * 1.5, concat('s', id) " +
        "FROM range(100)")
      val head = LakeLog.current(s"$root/db/h").get
      // the insert lands one file per task — sums are PER FILE and
      // fold associatively across them
      def tot(col: String, abs: Boolean): BigInt = head.files.map { f =>
        val cs = head.stats(f).cols(col)
        BigInt((if (abs) cs.asum else cs.sum).getOrElse(
          fail(s"$col missing sum in $f")))
      }.sum
      // exact sums: k = 0..99 → 4950; i cycles -5..4 ten times each →
      // sum -50, abs (5+4+3+2+1+0+1+2+3+4)·10 = 250
      assert(tot("k", abs = false) == 4950 && tot("k", abs = true) == 4950)
      assert(tot("i", abs = false) == -50 && tot("i", abs = true) == 250)
      // decimal: unscaled at scale 2 — Σ(id/4 as cents)
      val decSum = (0 until 100).map(id =>
        new java.math.BigDecimal(id).divide(new java.math.BigDecimal(4))
          .setScale(2).unscaledValue().longValue()).sum
      assert(tot("d", abs = false) == decSum)
      assert(head.files.forall { f =>
        val cs = head.stats(f).cols
        cs("f").sum.isEmpty && cs("s").sum.isEmpty
      }, "float/string columns harvest no sums")
    }
  }

  test("global SUM/AVG answer from the manifest: pushed aggregate, zero " +
       "footer opens, exact over multiple files, SQL NULL on all-null") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.g " +
        "(k BIGINT, d DECIMAL(38,4), nul INT)")
      // three separate commits → three stats-bearing files
      Seq(0, 1000, 2000).foreach { lo =>
        spark.range(lo, lo + 1000).selectExpr("id AS k",
          "CAST(id AS DECIMAL(38,4)) * 1.0001 AS d",
          "CAST(NULL AS INT) AS nul")
          .coalesce(1).createOrReplaceTempView(s"g_src$lo")
        spark.sql(s"INSERT INTO $cat.db.g SELECT * FROM g_src$lo")
      }
      val q = spark.sql(s"SELECT sum(k), avg(k), sum(d), sum(nul), " +
        s"avg(nul) FROM $cat.db.g")
      assert(pushed(q), q.queryExecution.executedPlan)
      val before = LakeStats.footerOpens.get()
      val r = q.collect().head
      assert(LakeStats.footerOpens.get() - before == 0,
        "metadata SUM must not open any footer")
      val ks = (0L until 3000L).sum
      assert(r.getLong(0) == ks)
      assert(r.getDouble(1) == ks.toDouble / 3000.0)
      // decimal exact: Σ id * 1.0001 at scale 4
      val dsum = (0L until 3000L).map(id =>
        java.math.BigDecimal.valueOf(id)
          .multiply(new java.math.BigDecimal("1.0001")).setScale(4))
        .reduce(_.add(_))
      assert(r.getDecimal(2).compareTo(dsum) == 0, s"${r.getDecimal(2)}")
      assert(r.isNullAt(3) && r.isNullAt(4), "all-null column: SQL NULL")
      // and the answers match the real row scan bit for bit
      val scan = spark.sql(s"SELECT /*+ REPARTITION(3) */ sum(k), avg(k), " +
        s"sum(d) FROM (SELECT * FROM $cat.db.g DISTRIBUTE BY k)")
      val sr = scan.collect().head
      assert(sr.getLong(0) == r.getLong(0) &&
        sr.getDouble(1) == r.getDouble(1) &&
        sr.getDecimal(2).compareTo(r.getDecimal(2)) == 0)
    }
  }

  test("overflow guards: a sum whose ABS bound exceeds Long range " +
       "declines (mixed signs could overflow mid-fold); an AVG past the " +
       "double-exact 2^53 declines while SUM still pushes") {
    withCatalog { (cat, root) =>
      // Σ|v| = 1.6e19 > Long.Max though the exact sum is tiny: SOME
      // fold order overflows, so the metadata answer must decline and
      // leave the semantics (ANSI error / legacy wrap) to the scan
      spark.sql(s"CREATE TABLE $cat.db.ov (v BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.ov VALUES " +
        "(4000000000000000000), (-4000000000000000000), " +
        "(4000000000000000000), (-4000000000000000000), (5)")
      val q = spark.sql(s"SELECT sum(v) FROM $cat.db.ov")
      assert(!pushed(q), "abs-bound past Long range must decline")
      assert(q.collect().head.getLong(0) == 5L)
      // 2 × 2^53: SUM is provable (fits long), AVG is not (double adds
      // past the mantissa limit could round) — the push splits exactly
      spark.sql(s"CREATE TABLE $cat.db.av (v BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.av VALUES " +
        "(9007199254740992), (9007199254740992)")
      val qs = spark.sql(s"SELECT sum(v) FROM $cat.db.av")
      assert(pushed(qs))
      assert(qs.collect().head.getLong(0) == 2L * 9007199254740992L)
      // AVG past 2^53 abs: the COMPLETE Avg push declines (double
      // accumulation could round), but Spark then rewrites avg to
      // sum/count and pushes THOSE partially — the final divide runs
      // on our exact totals, so the answer stays metadata-backed and
      // exact (2^54 / 2 = 2^53, representable)
      val qa = spark.sql(s"SELECT avg(v) FROM $cat.db.av")
      assert(qa.collect().head.getDouble(0) == 9007199254740992.0)
      // decimal AVG: complete push declines (divide rounding is
      // Spark's), but the same sum/count rewrite applies — Spark's own
      // Divide over the exact metadata sum and count gives precisely
      // the row scan's answer
      spark.sql(s"CREATE TABLE $cat.db.da (d DECIMAL(10,2))")
      spark.sql(s"INSERT INTO $cat.db.da VALUES (1.00), (2.01)")
      val qd = spark.sql(s"SELECT avg(d) FROM $cat.db.da")
      assert(qd.collect().head.getDecimal(0).toPlainString == "1.505000")
    }
  }

  test("conservatism: deletion vectors, sum-less vintages (external " +
       "bootstrap, compaction rewrites), and pre-ADD-COLUMN files all " +
       "decline the push — and the scan answer stays exact") {
    withCatalog { (cat, root) =>
      // DV: a deleted row's contribution is unknowable from metadata
      spark.sql(s"CREATE TABLE $cat.db.dv (k BIGINT) " +
        "TBLPROPERTIES ('write.mode'='merge-on-read')")
      spark.sql(s"INSERT INTO $cat.db.dv SELECT id FROM range(100)")
      assert(pushed(spark.sql(s"SELECT sum(k) FROM $cat.db.dv")))
      spark.sql(s"DELETE FROM $cat.db.dv WHERE k >= 90")
      val q = spark.sql(s"SELECT sum(k) FROM $cat.db.dv")
      assert(!pushed(q), "a DV'd snapshot must decline metadata SUM")
      assert(q.collect().head.getLong(0) == (0L until 90L).sum)
      // compaction rewrites via plain df.write → no sums → decline
      spark.sql(s"CREATE TABLE $cat.db.cp (k BIGINT)")
      Seq(0, 100).foreach { lo =>
        spark.range(lo, lo + 100).selectExpr("id AS k").coalesce(1)
          .createOrReplaceTempView(s"cp_src$lo")
        spark.sql(s"INSERT INTO $cat.db.cp SELECT * FROM cp_src$lo")
      }
      assert(pushed(spark.sql(s"SELECT sum(k) FROM $cat.db.cp")))
      spark.sql(s"CALL $cat.system.compact('db.cp', 134217728)")
      val qc = spark.sql(s"SELECT sum(k) FROM $cat.db.cp")
      assert(!pushed(qc),
        "compacted files carry no sums — conservative decline")
      assert(qc.collect().head.getLong(0) == (0L until 200L).sum)
      // ADD COLUMN: the old vintage has no stats entry for the new
      // column at all — ambiguous, decline; new-column scan stays right
      spark.sql(s"CREATE TABLE $cat.db.ac (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.ac SELECT id FROM range(10)")
      spark.sql(s"ALTER TABLE $cat.db.ac ADD COLUMN extra BIGINT")
      spark.sql(s"INSERT INTO $cat.db.ac VALUES (100, 7), (101, 8)")
      val qa = spark.sql(s"SELECT sum(extra) FROM $cat.db.ac")
      assert(!pushed(qa), "pre-ADD-COLUMN vintage must decline")
      assert(qa.collect().head.getLong(0) == 15L)
      // k spans both vintages and stays provable
      val qk = spark.sql(s"SELECT sum(k) FROM $cat.db.ac")
      assert(pushed(qk))
      assert(qk.collect().head.getLong(0) == (0L until 10L).sum + 201L)
    }
  }

  test("the MOR delta writer carries the facts too: a MERGE whose only " +
       "action is NOT-MATCHED INSERT (no DVs) keeps the table " +
       "metadata-SUM answerable, post-merge files included") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.mi (k BIGINT, v BIGINT) " +
        "TBLPROPERTIES ('write.mode'='merge-on-read')")
      spark.sql(s"INSERT INTO $cat.db.mi SELECT id, id * 2 FROM range(50)")
      spark.range(100, 120).selectExpr("id AS k", "id * 3 AS v")
        .createOrReplaceTempView("mi_src")
      spark.sql(s"MERGE INTO $cat.db.mi t USING mi_src s ON t.k = s.k " +
        "WHEN NOT MATCHED THEN INSERT *")
      val head = LakeLog.current(s"$root/db/mi").get
      assert(head.dvs.isEmpty, "insert-only merge writes no DVs")
      assert(head.files.forall(f =>
        head.stats(f).cols("v").sum.isDefined),
        "the delta-writer-published insert file carries sums")
      val q = spark.sql(s"SELECT sum(v) FROM $cat.db.mi")
      assert(pushed(q), q.queryExecution.executedPlan)
      assert(q.collect().head.getLong(0) ==
        (0L until 50L).map(_ * 2).sum + (100L until 120L).map(_ * 3).sum)
    }
  }

  test("grouped metadata SUM/AVG: per-partition sums fold from per-file " +
       "facts with zero footer opens; a partition filter narrows the " +
       "answer to the matching segments") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.gp " +
        "(pri STRING, k BIGINT, d DECIMAL(12,2)) PARTITIONED BY (pri)")
      spark.range(0, 3000).selectExpr(
        "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' " +
          "ELSE 'c' END AS pri",
        // cast the quotient back to the COLUMN's type in the view, so
        // the expect query below folds the same (12,2) values the
        // INSERT's implicit cast lands in the table
        "id AS k", "CAST(CAST(id AS DECIMAL(12,2)) / 8 AS DECIMAL(12,2)) AS d")
        .createOrReplaceTempView("gp_src")
      spark.sql(s"INSERT INTO $cat.db.gp SELECT * FROM gp_src")
      val q = spark.sql(s"SELECT pri, sum(k), avg(k), sum(d), count(*) " +
        s"FROM $cat.db.gp GROUP BY pri ORDER BY pri")
      assert(q.queryExecution.executedPlan.toString
        .contains("metadata-grouped"), q.queryExecution.executedPlan)
      val before = LakeStats.footerOpens.get()
      val rows = q.collect()
      assert(LakeStats.footerOpens.get() - before == 0)
      val expect = spark.sql("SELECT pri, sum(k), avg(k), sum(d), " +
        "count(*) FROM gp_src GROUP BY pri ORDER BY pri").collect()
      assert(rows.length == 3)
      rows.zip(expect).foreach { case (got, want) =>
        assert(got.getString(0) == want.getString(0))
        assert(got.getLong(1) == want.getLong(1))
        assert(got.getDouble(2) == want.getDouble(2))
        assert(got.getDecimal(3).compareTo(want.getDecimal(3)) == 0)
        assert(got.getLong(4) == want.getLong(4))
      }
      // partition-filtered global SUM: only the matching partition's
      // facts participate
      val qf = spark.sql(
        s"SELECT sum(k) FROM $cat.db.gp WHERE pri = 'b'")
      assert(pushed(qf), qf.queryExecution.executedPlan)
      assert(qf.collect().head.getLong(0) ==
        (0L until 3000L).filter(_ % 3 == 1).sum)
    }
  }
}
