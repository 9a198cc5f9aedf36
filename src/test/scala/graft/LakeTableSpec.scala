package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.col

import graft.sources.dsv2.{GraftCatalog, LakeLog, LakeTableIO}

/** The file-backed DSv2 lake connector at the SQL surface: catalog
  * registration, INSERT INTO (stage-then-publish parquet write), scans
  * with column pruning + row-group stats narrowing, and the group-based
  * copy-on-write MERGE INTO path.
  */
class LakeTableSpec extends SparkSpec {

  // ONE root for the whole suite: Spark's CatalogManager caches the
  // catalog instance at first reference, so a per-test conf.set of the
  // root would be silently ignored — tables would land under the first
  // root while a test inspected the new one. Table names are unique per
  // test instead.
  private lazy val catalogRoot: String = {
    val root = Files.createTempDirectory("graft-cat").toString
    spark.conf.set("spark.sql.catalog.lakespec",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakespec.root", root)
    root
  }
  private def withCatalog[A](f: String => A): A = f(catalogRoot)

  private def scanDesc(df: org.apache.spark.sql.DataFrame): String = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scans.nonEmpty, "no BatchScanExec in plan")
    scans.mkString("\n")
  }

  test("create + insert + read back: the write stages parquet and " +
       "publishes on commit, the scan decodes every supported type") {
    withCatalog { _ =>
      spark.sql(
        """CREATE TABLE lakespec.db.t
          |(k BIGINT, s STRING, d DOUBLE, ts TIMESTAMP)""".stripMargin)
      spark.sql(
        """INSERT INTO lakespec.db.t SELECT
          |  id, concat('s', id), id * 1.5,
          |  timestamp_micros(1700000000000000 + id)
          |FROM range(1000)""".stripMargin)
      val back = spark.sql(
        "SELECT k, s, d, ts FROM lakespec.db.t ORDER BY k")
      assert(back.count() == 1000)
      val r = back.collect()(7)
      assert(r.getLong(0) == 7 && r.getString(1) == "s7" &&
        r.getDouble(2) == 10.5 &&
        r.getTimestamp(3).toInstant.toEpochMilli == 1700000000000L)
      // null round-trip
      spark.sql("INSERT INTO lakespec.db.t VALUES (2000, NULL, NULL, NULL)")
      val n = spark.sql(
        "SELECT * FROM lakespec.db.t WHERE s IS NULL").collect()
      assert(n.length == 1 && n(0).getLong(0) == 2000 && n(0).isNullAt(1))
    }
  }

  test("column pruning reaches the reader and filters narrow the planned " +
       "row groups via footer stats") {
    withCatalog { _ =>
      spark.sql("CREATE TABLE lakespec.db.pruned (k BIGINT, s STRING, d DOUBLE)")
      // tiny row groups + k-sorted input → disjoint per-group k ranges,
      // so a point predicate must plan a strict subset of the groups
      LakeTableIO.rowGroupBytes = 16L << 10
      try spark.sql(
        """INSERT INTO lakespec.db.pruned
          |SELECT id, concat('v', id), id * 0.5
          |FROM range(100000) ORDER BY id""".stripMargin)
      finally LakeTableIO.rowGroupBytes = 128L << 20
      val q = spark.sql(
        "SELECT k FROM lakespec.db.pruned WHERE k >= 99000")
      val desc = scanDesc(q)
      assert(desc.contains("cols=[k]"), s"projection not pruned: $desc")
      val m = "rowgroups=(\\d+)/(\\d+)".r.findFirstMatchIn(desc).get
      val (planned, total) = (m.group(1).toInt, m.group(2).toInt)
      assert(total >= 4, s"fixture produced too few row groups: $desc")
      assert(planned < total, s"stats pruning planned everything: $desc")
      // pruning is an efficiency contract only — results stay exact
      assert(q.count() == 1000)
      assert(spark.sql(
        "SELECT k FROM lakespec.db.pruned WHERE k = 55555").count() == 1)
    }
  }

  test("MERGE INTO runs the group-based copy-on-write rewrite: matched " +
       "rows update, unmatched insert, not-matched-by-source delete") {
    withCatalog { _ =>
      spark.sql("CREATE TABLE lakespec.db.m (k BIGINT, v STRING, amt DOUBLE)")
      spark.sql(
        """INSERT INTO lakespec.db.m SELECT id, concat('old', id), id * 1.0
          |FROM range(100)""".stripMargin)
      spark.range(50, 150).selectExpr(
          "id AS k", "concat('new', id) AS v", "id * 2.0 AS amt")
        .createOrReplaceTempView("updates")
      spark.sql(
        """MERGE INTO lakespec.db.m t USING updates s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      val after = spark.sql(
        "SELECT k, v, amt FROM lakespec.db.m ORDER BY k").collect()
      assert(after.length == 100)
      assert(after.head.getLong(0) == 50 && after.last.getLong(0) == 149)
      after.foreach { r =>
        assert(r.getString(1) == s"new${r.getLong(0)}")
        assert(r.getDouble(2) == r.getLong(0) * 2.0)
      }
    }
  }

  test("runtime group filtering narrows the copy-on-write: a MERGE " +
       "touching one file's key range leaves the other files' names " +
       "and bytes untouched") {
    withCatalog { root =>
      spark.sql("CREATE TABLE lakespec.db.g (k BIGINT, v STRING)")
      // 8 range-disjoint files: repartitionByRange gives each task a
      // contiguous key slice, one published file per task
      spark.range(8000).selectExpr("id AS k", "concat('v', id) AS v")
        .repartitionByRange(8, col("k"))
        .sortWithinPartitions("k")
        .writeTo("lakespec.db.g").append()
      def files(): Map[String, Long] = {
        val d = new java.io.File(s"$root/db/g")
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.length()).toMap
      }
      val dir = s"$root/db/g"
      val before = files()
      assert(before.size == 8, s"expected 8 files, got ${before.keySet}")
      // source touches keys 100–199 only — one file's range
      spark.range(100, 200).selectExpr("id AS k", "'touched' AS v")
        .createOrReplaceTempView("narrow")
      spark.sql(
        """MERGE INTO lakespec.db.g t USING narrow s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
      // the rewrite is manifest-level: the commit's removed set is what
      // the runtime filter let through — it must be a strict, small
      // subset of the table's files
      val commit = LakeLog.current(dir).get
      assert(commit.operation == "merge", commit.operation)
      assert(commit.removed.size <= 2,
        s"runtime group filter did not narrow the rewrite: " +
          s"replaced ${commit.removed.size} of ${before.size} files")
      assert(commit.removed.nonEmpty, "no file was rewritten at all")
      // replaced files leave the manifest but stay on disk byte-for-byte
      // (time travel needs them); untouched files stay referenced
      val after = files()
      before.foreach { case (n, len) =>
        assert(after.get(n).contains(len), s"$n mutated or deleted") }
      val survivors = before.keySet -- commit.removed.toSet
      assert(survivors.subsetOf(commit.files.toSet),
        "an untouched file fell out of the manifest")
      // semantics unharmed by the narrowing
      val rows = spark.sql("SELECT k, v FROM lakespec.db.g").collect()
      assert(rows.length == 8000)
      rows.foreach { r =>
        val k = r.getLong(0)
        val want = if (k >= 100 && k < 200) "touched" else s"v$k"
        assert(r.getString(1) == want, s"row $k = ${r.getString(1)}")
      }
    }
  }

  test("UPDATE and DELETE statements run the same copy-on-write rewrite") {
    withCatalog { _ =>
      spark.sql("CREATE TABLE lakespec.db.dml (k BIGINT, v DOUBLE)")
      spark.sql(
        "INSERT INTO lakespec.db.dml SELECT id, id * 1.0 FROM range(100)")
      spark.sql("UPDATE lakespec.db.dml SET v = v + 1000 WHERE k < 10")
      spark.sql("DELETE FROM lakespec.db.dml WHERE k >= 90")
      val rows = spark.sql("SELECT k, v FROM lakespec.db.dml ORDER BY k")
        .collect()
      assert(rows.length == 90)
      assert(rows.take(10).forall(r => r.getDouble(1) == r.getLong(0) + 1000.0))
      assert(rows.drop(10).forall(r => r.getDouble(1) == r.getLong(0) * 1.0))
    }
  }

  test("MERGE with a partial update keeps carry-over rows intact — the " +
       "replaced files' non-matching rows survive the rewrite") {
    withCatalog { _ =>
      spark.sql("CREATE TABLE lakespec.db.c (k BIGINT, v STRING)")
      spark.sql(
        """INSERT INTO lakespec.db.c SELECT id, concat('keep', id)
          |FROM range(1000)""".stripMargin)
      spark.range(10).selectExpr("id * 100 AS k", "'touched' AS v")
        .createOrReplaceTempView("touch")
      spark.sql(
        """MERGE INTO lakespec.db.c t USING touch s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
      val rows = spark.sql("SELECT k, v FROM lakespec.db.c").collect()
      assert(rows.length == 1000, "carry-over rows lost by the rewrite")
      val touched = rows.filter(_.getString(1) == "touched").map(_.getLong(0))
      assert(touched.sorted.toSeq == (0 until 10).map(_ * 100L))
      assert(rows.filter(_.getLong(0) == 123).head.getString(1) == "keep123")
    }
  }

  test("the scan reports footer statistics: exact rows, projected bytes, " +
       "shrinking under pushdown — and Catalyst broadcasts the small side") {
    withCatalog { _ =>
      spark.sql("CREATE TABLE lakespec.db.st (k BIGINT, v STRING)")
      LakeTableIO.rowGroupBytes = 32L << 10
      try spark.sql(
        """INSERT INTO lakespec.db.st
          |SELECT id AS k, concat(repeat('x', 100), id) AS v
          |FROM range(2000) ORDER BY id""".stripMargin)
      finally LakeTableIO.rowGroupBytes = 128L << 20
      def scanRel(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
        }.head
      val full = scanRel(spark.table("lakespec.db.st"))
      assert(full.stats.rowCount.contains(BigInt(2000)),
        s"exact footer row count, got ${full.stats.rowCount}")
      val fullBytes = full.stats.sizeInBytes
      // narrow projection drops v's ~100-char payload from the estimate
      val narrow = scanRel(spark.table("lakespec.db.st").select("k"))
      assert(narrow.stats.sizeInBytes < fullBytes / 4,
        s"projection must shrink bytes: ${narrow.stats.sizeInBytes} vs $fullBytes")
      // a pushed range predicate drops whole row groups from BOTH counts
      val filtered = scanRel(
        spark.table("lakespec.db.st").where(col("k") >= 1750))
      assert(filtered.stats.rowCount.exists(_ < BigInt(1000)),
        s"group pruning must shrink rows: ${filtered.stats.rowCount}")
      // the real consequence: the 2000-row lake side broadcasts against
      // a big probe instead of a two-sided shuffle
      val big = spark.range(500000).selectExpr("id % 2000 AS k")
      val joined = big.join(spark.table("lakespec.db.st"), "k")
      val hasBroadcast = joined.queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.nonEmpty
      assert(hasBroadcast,
        s"expected broadcast join:\n${joined.queryExecution.sparkPlan}")
    }
  }
}
