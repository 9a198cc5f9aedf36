package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.sources.dsv2.{GraftCatalog, LakeLog, LakePartitioning, LakeStats}

/** Hidden partitioning on the lake catalog ([[LakePartitioning]]):
  * transform specs (identity/bucket/truncate/days/months/years)
  * declared at CREATE, tuples recorded per file in the manifest,
  * EXACT partition pruning with zero I/O, storage-partitioned joins
  * (no Exchange on either side), write-side clustering (one file per
  * partition), DML carrying tuples through rewrites, and the ALTER
  * interplay (rename follows, drop/bucket-widen fail loud).
  */
class LakePartitionSpec extends SparkSpec {

  private var n = 0
  private def withCatalog[A](f: (String, String) => A): A = {
    val root = Files.createTempDirectory("graft-part").toString
    n += 1
    val cat = s"partcat$n"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect() // force AQE to finalize the plan
    // walk THROUGH adaptive wrappers and materialized stages — a plain
    // .collect never descends into AdaptiveSparkPlanExec/QueryStageExec
    // (their inner plans are fields, not children), which silently
    // undercounts to zero
    def walk(p: SparkPlan): Int = {
      // count the exchanges themselves; stages walk through to them
      // (counting both would double: a shuffle stage WRAPS its exchange)
      val self = p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }
      val children = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      self + children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("CREATE ... PARTITIONED BY records a tuple per file, the write " +
       "clusters to ONE file per partition, and every row lands in the " +
       "file its transform values name") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.p (k BIGINT, v STRING) " +
        s"PARTITIONED BY (bucket(4, k))")
      spark.sql(s"INSERT INTO $cat.db.p " +
        "SELECT id, concat('v', id) FROM range(0, 1000, 1, 8)")
      val snap = LakeLog.current(s"$root/db/p").get
      // clustered distribution: one file per bucket, not 8 tasks × 4
      assert(snap.files.size == 4,
        s"expected 4 files (one per bucket), got ${snap.files.size}")
      assert(snap.parts.keySet == snap.files.toSet,
        "every data file carries a partition tuple")
      assert(snap.parts.values.toSeq.distinct.size == 4)
      assert(spark.table(s"$cat.db.p").count() == 1000)
      // the tuple is TRUE of every row: per file, recomputing the
      // transform over its rows yields exactly the recorded slot
      val bound = LakePartitioning.bind(
        LakePartitioning.specOf(s"$root/db/p"),
        spark.table(s"$cat.db.p").schema)
      spark.table(s"$cat.db.p").selectExpr("k", "_file").collect()
        .foreach { r =>
          val slot = LakePartitioning.encodeSlot(
            bound.head.eval(r.getLong(0)))
          assert(snap.parts(r.getString(1)) ==
              LakePartitioning.versionedTuple(0, Seq(slot)),
            s"row k=${r.getLong(0)} in mis-tupled file ${r.getString(1)}")
        }
    }
  }

  test("partition pruning is exact and zero-I/O: an equality on a " +
       "bucketed source opens only the matching bucket's footers, " +
       "identity/truncate/days prune ranges, nulls prune under any " +
       "comparison, and results always match the residual filter") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.e " +
        "(k BIGINT, cat STRING, d DATE, x INT) " +
        "PARTITIONED BY (bucket(8, k), truncate(2, cat), months(d))")
      spark.sql(s"INSERT INTO $cat.db.e SELECT id, " +
        "CASE WHEN id % 10 = 9 THEN NULL ELSE " +
        "  concat(substr('abcde', CAST(id % 5 AS INT) + 1, 1), 'x', id) END, " +
        "date_add(DATE'2024-01-15', CAST(id % 120 AS INT)), " +
        "CAST(id AS INT) FROM range(0, 2000, 1, 8)")
      val dir = s"$root/db/e"
      val total = LakeLog.current(dir).get.files.size
      assert(total > 8, s"want a multi-file layout, got $total")

      def opens[A](f: => A): (A, Long) = {
        val before = LakeStats.footerOpens.get()
        val r = f
        (r, LakeStats.footerOpens.get() - before)
      }
      // bucket equality: only files of bucket(k=777) open
      val (hit, o1) = opens(
        spark.table(s"$cat.db.e").where("k = 777").count())
      assert(hit == 1)
      assert(o1 <= total / 4,
        s"bucket pruning opened $o1 footers of $total files")
      // truncate prefix equality — 'ax…' rows only
      val axRows = spark.table(s"$cat.db.e")
        .where("substr(cat, 1, 2) = 'ax'").count()
      val (axGot, o2) = opens(
        spark.table(s"$cat.db.e").where("cat >= 'ax' AND cat < 'ay'")
          .count())
      assert(axGot == axRows)
      assert(o2 < total, "truncate range pruning opened every footer")
      // months range: only Jan-Feb 2024 files open
      val (janGot, o3) = opens(spark.table(s"$cat.db.e")
        .where("d < DATE'2024-02-01'").count())
      assert(janGot == spark.table(s"$cat.db.e")
        .where("month(d) = 1 AND year(d) = 2024").count())
      assert(o3 < total, "months pruning opened every footer")
      // IN-list pruning: two probed keys open at most two buckets
      val (inGot, oIn) = opens(
        spark.table(s"$cat.db.e").where("k IN (777, 912)").count())
      assert(inGot == 2)
      assert(oIn <= 2 * (total / 8 + 1),
        s"IN-list pruning opened $oIn footers of $total files")
      // null-ness is EXACT from tuples: IS NULL plans only the null
      // partition's files, IS NOT NULL skips them — and a comparison
      // never matches the null-cat partition
      val (nullGot, oNull) = opens(
        spark.table(s"$cat.db.e").where("cat IS NULL").count())
      assert(nullGot == 200)
      assert(oNull < total / 2,
        s"IS NULL opened $oNull footers of $total — no tuple pruning")
      assert(spark.table(s"$cat.db.e")
        .where("cat IS NOT NULL").count() == 1800)
    }
  }

  test("storage-partitioned join: two tables bucketed the same way " +
       "join with ZERO shuffles on a correct result; a groupBy over an " +
       "identity partition column aggregates with ZERO shuffles") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.facts (k BIGINT, amount DOUBLE) " +
        "PARTITIONED BY (bucket(4, k))")
      spark.sql(s"CREATE TABLE $cat.db.dims (k BIGINT, label STRING) " +
        "PARTITIONED BY (bucket(4, k))")
      spark.sql(s"INSERT INTO $cat.db.facts " +
        "SELECT id % 100, CAST(id AS DOUBLE) FROM range(0, 3000, 1, 6)")
      spark.sql(s"INSERT INTO $cat.db.dims " +
        "SELECT id, concat('d', id) FROM range(0, 100, 1, 4)")
      val prevThreshold = spark.conf.get(
        "spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = spark.sql(
          s"""SELECT f.k, count(*) AS cnt, max(d.label) AS label
             |FROM $cat.db.facts f JOIN $cat.db.dims d ON f.k = d.k
             |GROUP BY f.k""".stripMargin)
        val rows = joined.collect()
        assert(rows.length == 100 && rows.forall(_.getLong(1) == 30))
        val joinPlan = spark.sql(
          s"SELECT f.k, d.label FROM $cat.db.facts f " +
            s"JOIN $cat.db.dims d ON f.k = d.k")
        assert(shuffles(joinPlan) == 0,
          "co-bucketed join must be storage-partitioned (no Exchange):\n" +
            joinPlan.queryExecution.executedPlan)
      } finally spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", prevThreshold)

      // one-side shuffle: joining the bucketed facts with a PLAIN
      // (non-lake) table, Spark shuffles only the plain side — BY OUR
      // V2 bucket function (produceResult evaluated per row), so the
      // exchange output lands exactly on the lake's layout. One
      // exchange instead of two, and the function evaluation agreeing
      // with the on-disk layout is what the result correctness proves.
      val prevShuf = spark.conf.getOption(
        "spark.sql.sources.v2.bucketing.shuffle.enabled")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
        spark.range(0, 100).selectExpr("id AS k", "concat('p', id) AS p")
          .createOrReplaceTempView("plain_dim")
        val oneSide = spark.sql(
          s"SELECT f.k, d.p FROM $cat.db.facts f " +
            "JOIN plain_dim d ON f.k = d.k")
        assert(oneSide.count() == 3000)
        assert(shuffles(oneSide) == 1,
          "plain-side join must shuffle ONLY the plain side:\n" +
            oneSide.queryExecution.executedPlan)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          prevThreshold)
        prevShuf match {
          case Some(v) => spark.conf.set(
            "spark.sql.sources.v2.bucketing.shuffle.enabled", v)
          case None => spark.conf.unset(
            "spark.sql.sources.v2.bucketing.shuffle.enabled")
        }
      }

      // identity partitioning satisfies clustering by the column itself
      spark.sql(s"CREATE TABLE $cat.db.byreg (region STRING, x BIGINT) " +
        "PARTITIONED BY (region)")
      spark.sql(s"INSERT INTO $cat.db.byreg SELECT " +
        "concat('r', id % 5), id FROM range(0, 500, 1, 5)")
      val agg = spark.sql(
        s"SELECT region, sum(x) AS s FROM $cat.db.byreg GROUP BY region")
      assert(agg.collect().length == 5)
      assert(shuffles(agg) == 0,
        "groupBy over the identity partition column must not shuffle:\n" +
          agg.queryExecution.executedPlan)
    }
  }

  test("DML keeps the layout: copy-on-write UPDATE re-tuples rewritten " +
       "files, merge-on-read DELETE leaves tuples untouched, and every " +
       "current file always carries a tuple") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.m (k BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(4, k))")
      spark.sql(s"INSERT INTO $cat.db.m " +
        "SELECT id, concat('v', id) FROM range(0, 400, 1, 4)")
      spark.sql(s"UPDATE $cat.db.m SET v = 'hit' WHERE k % 7 = 0")
      val snap = LakeLog.current(s"$root/db/m").get
      assert(snap.parts.keySet == snap.files.toSet,
        "copy-on-write rewrite lost partition tuples")
      assert(spark.table(s"$cat.db.m").where("v = 'hit'").count() == 58)

      spark.sql(s"ALTER TABLE $cat.db.m " +
        "SET TBLPROPERTIES ('write.mode' = 'merge-on-read')")
      assert(LakePartitioning.specOf(s"$root/db/m").nonEmpty,
        "write-mode flip clobbered the partition spec")
      spark.sql(s"DELETE FROM $cat.db.m WHERE k < 100")
      assert(spark.table(s"$cat.db.m").count() == 300)
      val snap2 = LakeLog.current(s"$root/db/m").get
      assert(snap2.parts.keySet == snap2.files.toSet)
      // bucket-pruned read still exact across the DV'd layout
      assert(spark.table(s"$cat.db.m").where("k = 250").count() == 1)
      assert(spark.table(s"$cat.db.m").where("k = 50").count() == 0)
    }
  }

  test("ALTER interplay: RENAME of a source column rewrites the spec " +
       "and keeps pruning; DROP of a source column and widening a " +
       "bucket source fail loud; widening an identity source keeps old " +
       "tuples decodable") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.a (k INT, g INT, v STRING) " +
        "PARTITIONED BY (bucket(4, g), identity(k))")
      spark.sql(s"INSERT INTO $cat.db.a SELECT CAST(id % 3 AS INT), " +
        "CAST(id % 7 AS INT), concat('v', id) FROM range(0, 210, 1, 3)")
      spark.sql(s"ALTER TABLE $cat.db.a RENAME COLUMN g TO grp")
      assert(LakePartitioning.show(LakePartitioning.specOf(s"$root/db/a"))
        == "bucket(4,grp),identity(k)")
      assert(spark.table(s"$cat.db.a").where("grp = 3").count() == 30)
      // new writes under the new name keep landing in the same buckets
      spark.sql(s"INSERT INTO $cat.db.a VALUES (0, 3, 'extra')")
      assert(spark.table(s"$cat.db.a").where("grp = 3").count() == 31)

      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.a DROP COLUMN grp")
      }
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.a ALTER COLUMN grp TYPE BIGINT")
      }
      // identity sources widen fine: "v2" decodes as 2L afterwards
      spark.sql(s"ALTER TABLE $cat.db.a ALTER COLUMN k TYPE BIGINT")
      assert(spark.table(s"$cat.db.a").where("k = 2").count() == 70)
      assert(spark.table(s"$cat.db.a")
        .where("k = 2 AND grp = 3").count() == 10)
    }
  }

  test("INSERT OVERWRITE: static partition spec replaces exactly that " +
       "partition, dynamic mode replaces exactly the written ones, a " +
       "plain overwrite truncates, a month-aligned range replaces the " +
       "month, and a condition that splits a partition fails loud") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.ow (region STRING, x BIGINT) " +
        "PARTITIONED BY (region)")
      spark.sql(s"INSERT INTO $cat.db.ow SELECT concat('r', id % 5), id " +
        "FROM range(0, 500, 1, 5)")
      // static: INSERT OVERWRITE ... PARTITION (region = 'r1')
      spark.sql(s"INSERT OVERWRITE $cat.db.ow PARTITION (region = 'r1') " +
        "SELECT id FROM range(3)")
      assert(spark.table(s"$cat.db.ow")
        .where("region = 'r1'").count() == 3)
      assert(spark.table(s"$cat.db.ow")
        .where("region <> 'r1'").count() == 400, "other partitions intact")

      // dynamic: only the partitions the write PRODUCES are replaced
      val prevMode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode")
      try {
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
          "dynamic")
        spark.sql(s"INSERT OVERWRITE $cat.db.ow " +
          "SELECT 'r2', id FROM range(7)")
        assert(spark.table(s"$cat.db.ow")
          .where("region = 'r2'").count() == 7)
        assert(spark.table(s"$cat.db.ow")
          .where("region = 'r3'").count() == 100, "untouched partition")
        assert(spark.table(s"$cat.db.ow")
          .where("region = 'r1'").count() == 3)
      } finally spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", prevMode)

      // plain overwrite under static mode truncates the whole table
      spark.sql(s"INSERT OVERWRITE $cat.db.ow " +
        "SELECT concat('s', id % 2), id FROM range(20)")
      assert(spark.table(s"$cat.db.ow").count() == 20)
      assert(LakeLog.current(s"$root/db/ow").get.operation == "truncate")

      // month-aligned range overwrite on a months() layout
      spark.sql(s"CREATE TABLE $cat.db.om (d DATE, x BIGINT) " +
        "PARTITIONED BY (months(d))")
      spark.sql(s"INSERT INTO $cat.db.om SELECT " +
        "date_add(DATE'2024-01-10', CAST(id % 80 AS INT)), id " +
        "FROM range(0, 800, 1, 4)")
      val febBefore = spark.table(s"$cat.db.om")
        .where("d >= DATE'2024-02-01' AND d < DATE'2024-03-01'").count()
      assert(febBefore > 0)
      val otherBefore = spark.table(s"$cat.db.om")
        .where("d < DATE'2024-02-01' OR d >= DATE'2024-03-01'").count()
      spark.range(5).selectExpr("DATE'2024-02-15' AS d", "id AS x")
        .writeTo(s"$cat.db.om")
        .overwrite(org.apache.spark.sql.functions.col("d") >=
          java.sql.Date.valueOf("2024-02-01") &&
          org.apache.spark.sql.functions.col("d") <
            java.sql.Date.valueOf("2024-03-01"))
      assert(spark.table(s"$cat.db.om")
        .where("d >= DATE'2024-02-01' AND d < DATE'2024-03-01'")
        .count() == 5)
      assert(spark.table(s"$cat.db.om")
        .where("d < DATE'2024-02-01' OR d >= DATE'2024-03-01'")
        .count() == otherBefore, "other months intact")

      // a mid-month boundary splits the February partition: fail loud
      val before = spark.table(s"$cat.db.om").count()
      val e = intercept[Exception] {
        spark.range(1).selectExpr("DATE'2024-02-20' AS d", "id AS x")
          .writeTo(s"$cat.db.om")
          .overwrite(org.apache.spark.sql.functions.col("d") >=
            java.sql.Date.valueOf("2024-02-15"))
      }
      assert(e.getMessage != null)
      assert(spark.table(s"$cat.db.om").count() == before,
        "failed overwrite must leave the table untouched")
    }
  }

  test("maintenance stays inside partitions: compact merges only " +
       "within a tuple, rewrite_deletes re-tuples materialized files, " +
       "zorder clusters per partition — and the partitions metadata " +
       "table reports live counts through it all") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.mt (k BIGINT, g BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(3, g)) " +
        "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
      // several small files per bucket: 4 inserts × 3 buckets
      (0 until 4).foreach(i =>
        spark.sql(s"INSERT INTO $cat.db.mt SELECT id, id % 11, " +
          s"concat('v$i', id) FROM range(${i * 100}, ${i * 100 + 100})"))
      val dir = s"$root/db/mt"
      assert(LakeLog.current(dir).get.files.size == 12)
      spark.sql(s"DELETE FROM $cat.db.mt WHERE k % 5 = 0") // DVs
      val liveByBucket = spark.table(s"$cat.db.mt")
        .groupBy(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(
            org.apache.spark.sql.functions.col("g")),
          org.apache.spark.sql.functions.lit(3)).as("b"))
        .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

      spark.sql(s"CALL $cat.system.rewrite_deletes(table => 'db.mt')")
      val afterRw = LakeLog.current(dir).get
      assert(afterRw.dvs.isEmpty)
      assert(afterRw.parts.keySet == afterRw.files.toSet,
        "rewrite_deletes lost partition tuples")

      spark.sql(s"CALL $cat.system.compact(table => 'db.mt', " +
        "target_bytes => 104857600)")
      val afterC = LakeLog.current(dir).get
      assert(afterC.parts.keySet == afterC.files.toSet,
        "compaction lost partition tuples")
      assert(afterC.files.size == 3,
        s"one compacted file per bucket, got ${afterC.files.size}")
      assert(afterC.parts.values.toSeq.distinct.size == 3,
        "compaction merged across buckets")
      assert(spark.table(s"$cat.db.mt").count() == 320)
      // pruning still fires after maintenance: a bucket equality reads
      // one file of three
      assert(spark.table(s"$cat.db.mt").where("g = 7").count() ==
        spark.table(s"$cat.db.mt").collect().count(_.getLong(1) == 7))

      // partitions metadata table: per-bucket live counts
      val meta = spark.table(s"$cat.db.mt.partitions").collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(meta.keySet == Set(0, 1, 2))
      meta.foreach { case (b, (fc, rc)) =>
        assert(fc == 1L)
        assert(rc == liveByBucket(b),
          s"bucket $b live count $rc != ${liveByBucket(b)}")
      }

      // zorder keeps tuples too
      spark.sql(s"CALL $cat.system.zorder(table => 'db.mt', " +
        "columns => 'k', target_files => 3)")
      val afterZ = LakeLog.current(dir).get
      assert(afterZ.parts.keySet == afterZ.files.toSet,
        "zorder lost partition tuples")
      assert(spark.table(s"$cat.db.mt").count() == 320)
      assert(spark.table(s"$cat.db.mt.partitions")
        .agg(org.apache.spark.sql.functions.sum("row_count")).collect()
        .head.getLong(0) == 320)
    }
  }

  test("dynamic file pruning (runtime V2 filtering): a selective dim " +
       "filter narrows the fact scan before tasks launch — by stats on " +
       "an unpartitioned clustered table, and by tuples (groups " +
       "preserved) on a partitioned one — with exact join results") {
    withCatalog { (cat, _) =>
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      def walk(p: SparkPlan): Seq[BatchScanExec] = {
        val children = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec        => Seq(q.plan)
          case other                    => other.children
        }
        (p match {
          case b: BatchScanExec
              if b.scan.description.contains("graft_lake") => Seq(b)
          case _ => Nil
        }) ++ children.flatMap(walk)
      }
      def factScans(df: org.apache.spark.sql.DataFrame)
          : Seq[BatchScanExec] = {
        df.collect()
        walk(df.queryExecution.executedPlan)
      }
      // unpartitioned fact, k-clustered: 8 files with disjoint k ranges
      spark.sql(s"CREATE TABLE $cat.db.fact (k BIGINT, v STRING)")
      spark.range(0, 800, 1, 1).selectExpr("id AS k", "concat('v', id) AS v")
        .repartitionByRange(8, org.apache.spark.sql.functions.col("k"))
        .createOrReplaceTempView("dpp_src")
      spark.sql(s"INSERT INTO $cat.db.fact SELECT * FROM dpp_src")
      spark.range(0, 100).selectExpr("id AS k", "id % 3 AS sel")
        .createOrReplaceTempView("dpp_dim")
      val j = spark.sql(s"SELECT count(*) AS n FROM $cat.db.fact f " +
        "JOIN dpp_dim d ON f.k = d.k WHERE d.sel = 0")
      assert(j.collect().head.getLong(0) == 34, "k in 0,3,...,99")
      val scans = factScans(j)
      assert(scans.nonEmpty, "no lake scan in plan")
      val scanned = scans.map(_.inputRDD.getNumPartitions).min
      assert(scanned < 8,
        s"runtime filtering left $scanned of 8 file splits — no pruning")

      // partitioned fact: tuples prune, but every GROUP must survive
      // (Spark re-groups the filtered splits and fails on a vanished
      // key) — one representative split stays per excluded partition
      spark.sql(s"CREATE TABLE $cat.db.pfact (g BIGINT, x BIGINT) " +
        "PARTITIONED BY (g)")
      // two inserts: two files per partition, 10 partitions
      spark.sql(s"INSERT INTO $cat.db.pfact SELECT id % 10, id " +
        "FROM range(0, 800)")
      spark.sql(s"INSERT INTO $cat.db.pfact SELECT id % 10, id " +
        "FROM range(800, 1600)")
      spark.range(0, 10).selectExpr("id AS g", "id % 5 AS sel")
        .createOrReplaceTempView("dpp_pdim")
      val pj = spark.sql(s"SELECT count(*) AS n FROM $cat.db.pfact f " +
        "JOIN dpp_pdim d ON f.g = d.g WHERE d.sel = 0")
      assert(pj.collect().head.getLong(0) == 320, "g in {0, 5}: 2×160")
      val pscans = factScans(pj)
      assert(pscans.nonEmpty)
      // scan emitted fewer rows than the full table: excluded
      // partitions contribute at most their one representative file
      val outRows = pscans.map(_.metrics("numOutputRows").value).max
      assert(outRows < 1600, s"fact scan emitted $outRows of 1600 rows")
      assert(outRows >= 320)
    }
  }

  test("streaming interplay: an epoch write into a partitioned table " +
       "records tuples, and a partition-filtered stream read plans " +
       "only the matching partition's files per micro-batch") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.st (g BIGINT, x BIGINT) " +
        "PARTITIONED BY (g)")
      val ckpt = Files.createTempDirectory("graft-part-ck").toString
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.sqlContext
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)]
      src.addData((0L, 1L), (1L, 2L), (2L, 3L), (0L, 4L))
      val q = src.toDF().toDF("g", "x").writeStream
        .option("checkpointLocation", ckpt)
        .toTable(s"$cat.db.st")
      q.processAllAvailable(); q.stop()
      val snap = LakeLog.current(s"$root/db/st").get
      assert(snap.files.nonEmpty)
      assert(snap.parts.keySet == snap.files.toSet,
        "streaming epoch commit lost partition tuples")
      assert(spark.table(s"$cat.db.st").where("g = 0").count() == 2)

      // filtered stream read stays exact (Spark does not push filters
      // into micro-batch DSv2 scans, so this is residual-only)
      val outDir = Files.createTempDirectory("graft-part-out").toString
      val ck2 = Files.createTempDirectory("graft-part-ck2").toString
      val rq = spark.readStream.table(s"$cat.db.st").where("g = 0")
        .writeStream.format("parquet")
        .option("checkpointLocation", ck2)
        .option("path", outDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      rq.awaitTermination()
      assert(spark.read.parquet(outDir).count() == 2)

      // BATCH change-feed reads DO get pushdown: a partition filter on
      // db.t.changes plans only the matching partition's files —
      // pinned relative to the unfiltered read (absolute counts track
      // Spark's planning-round bookkeeping, the ratio tracks pruning)
      def opens(f: => Long): Long = {
        val b = LakeStats.footerOpens.get(); f
        LakeStats.footerOpens.get() - b
      }
      val full = opens(spark.read.table(s"$cat.db.st.changes").count())
      val filtered = opens(spark.read.table(s"$cat.db.st.changes")
        .where("g = 0").count())
      assert(filtered < full,
        s"partition-filtered change feed opened $filtered footers vs " +
          s"$full unfiltered — tuple pruning missed CDC planning")
    }
  }

  test("partition evolution: ADD/DROP PARTITION FIELD rewrites ZERO " +
       "files, each vintage prunes by the spec it was written under, " +
       "mixed layouts refuse dynamic overwrite, and the inventory " +
       "reports old vintages under the null row") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.ev (k BIGINT, d DATE, v STRING) " +
        "PARTITIONED BY (months(d))")
      spark.sql(s"INSERT INTO $cat.db.ev SELECT id, " +
        "date_add(DATE'2024-01-10', CAST(id % 80 AS INT)), " +
        "concat('a', id) FROM range(0, 400, 1, 4)")
      val dir = s"$root/db/ev"
      val vintageA = LakeLog.current(dir).get.files.toSet

      val evo = spark.sql(s"CALL $cat.system.add_partition_field(" +
        s"table => 'db.ev', field => 'bucket(4, k)')").collect().head
      assert(evo.getInt(0) == 1 &&
        evo.getString(1) == "months(d),bucket(4,k)")
      // zero files changed hands — evolution is metadata
      assert(LakeLog.current(dir).get.files.toSet == vintageA)

      spark.sql(s"INSERT INTO $cat.db.ev SELECT id, " +
        "date_add(DATE'2024-01-10', CAST(id % 80 AS INT)), " +
        "concat('b', id) FROM range(400, 800, 1, 4)")
      val snap = LakeLog.current(dir).get
      val vintageB = snap.files.toSet -- vintageA
      assert(vintageB.nonEmpty)
      // old vintage keeps spec-0 tuples, new writes carry spec 1
      vintageA.foreach(f => assert(snap.parts(f).head == "s0"))
      vintageB.foreach(f => assert(snap.parts(f).head == "s1" &&
        snap.parts(f).length == 3))

      def opens[A](f: => A): (A, Long) = {
        val b = graft.sources.dsv2.LakeStats.footerOpens.get(); val r = f
        (r, graft.sources.dsv2.LakeStats.footerOpens.get() - b)
      }
      // a months filter prunes BOTH vintages (both specs carry it)
      val (janN, oJan) = opens(spark.table(s"$cat.db.ev")
        .where("d < DATE'2024-02-01'").count())
      assert(janN == spark.table(s"$cat.db.ev")
        .where("month(d) = 1").count())
      assert(oJan < snap.files.size, "months pruning lost to evolution")
      // a bucket filter prunes only vintage B; vintage A stays
      // (conservatively — its spec never bucketed)
      val (kN, oK) = opens(spark.table(s"$cat.db.ev")
        .where("k = 555").count())
      assert(kN == 1)
      assert(oK < snap.files.size && oK >= vintageA.size,
        s"bucket filter opened $oK of ${snap.files.size} — must keep " +
          s"all ${vintageA.size} spec-0 files and prune within B")

      // the inventory: vintage-B partitions decode, vintage A groups
      // under the all-null row with its exact row count
      val inv = spark.table(s"$cat.db.ev.partitions").collect()
      val nullRow = inv.filter(r => r.isNullAt(0) && r.isNullAt(1))
      assert(nullRow.length == 1 && nullRow.head.getLong(3) == 400)
      assert(inv.filter(!_.isNullAt(0)).map(_.getLong(3)).sum == 400)

      // mixed layouts refuse dynamic overwrite, loud
      val prevMode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode")
      try {
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
          "dynamic")
        val e = intercept[Exception] {
          spark.sql(s"INSERT OVERWRITE $cat.db.ev SELECT 1, " +
            "DATE'2024-01-15', 'x'")
        }
        assert(e.getMessage.contains("current-spec") ||
          e.getCause != null)
      } finally spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", prevMode)

      // DROP PARTITION FIELD: a third layout; reads stay exact across
      // all three vintages
      spark.sql(s"CALL $cat.system.drop_partition_field(" +
        s"table => 'db.ev', field => 'months(d)')")
      spark.sql(s"INSERT INTO $cat.db.ev SELECT id, " +
        "DATE'2030-01-01', concat('c', id) FROM range(800, 900)")
      assert(spark.table(s"$cat.db.ev").count() == 900)
      assert(spark.table(s"$cat.db.ev")
        .where("d >= DATE'2030-01-01'").count() == 100)
      assert(spark.table(s"$cat.db.ev").where("k = 850").count() == 1)

      // compaction MIGRATES old vintages to the current layout: the
      // table turns uniform (every tuple carries the current spec id)
      // and dynamic overwrite — blocked on mixed layouts above —
      // works again
      spark.sql(s"CALL $cat.system.compact(table => 'db.ev', " +
        "target_bytes => 104857600)")
      val snapC = LakeLog.current(dir).get
      assert(snapC.files.forall(f =>
        snapC.parts.get(f).exists(_.head == "s2")),
        s"compaction left non-current layouts: ${snapC.parts.values
          .map(_.head).toSet}")
      assert(spark.table(s"$cat.db.ev").count() == 900)
      assert(spark.table(s"$cat.db.ev").where("k = 850").count() == 1)
      try {
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
          "dynamic")
        spark.sql(s"INSERT OVERWRITE $cat.db.ev SELECT 850, " +
          "DATE'2031-01-01', 'replaced'")
        assert(spark.table(s"$cat.db.ev")
          .where("v = 'replaced'").count() == 1)
        assert(spark.table(s"$cat.db.ev").where("k = 850").count() == 1,
          "the overwritten bucket holds only the new row")
      } finally spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", prevMode)

      // evolution guardrails
      intercept[Exception] {
        spark.sql(s"CALL $cat.system.add_partition_field(" +
          s"table => 'db.ev', field => 'bucket(4, k)')") // duplicate
      }
      intercept[Exception] {
        spark.sql(s"CALL $cat.system.drop_partition_field(" +
          s"table => 'db.ev', field => 'days(d)')") // not in the spec
      }
      // a source column of a HISTORICAL spec still cannot drop
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.ev DROP COLUMN d")
      }
    }
  }

  test("zorder migrates old layout vintages to the current spec like " +
       "compact: post-evolution zorder leaves a uniform layout " +
       "(dataChange=false, rows intact, dynamic overwrite restored), " +
       "z-sorted within the migrated partitions") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.zm (k BIGINT, x BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(2, k))")
      spark.sql(s"INSERT INTO $cat.db.zm SELECT id, (id * 37) % 1000, " +
        "concat('a', id) FROM range(0, 400, 1, 4)")
      val dir = s"$root/db/zm"
      spark.sql(s"CALL $cat.system.add_partition_field(" +
        s"table => 'db.zm', field => 'bucket(4, x)')")
      spark.sql(s"INSERT INTO $cat.db.zm SELECT id, (id * 37) % 1000, " +
        "concat('b', id) FROM range(400, 800, 1, 4)")
      val mixed = LakeLog.current(dir).get
      assert(mixed.parts.values.map(_.head).toSet == Set("s0", "s1"),
        "fixture must hold two layout vintages")

      spark.sql(s"CALL $cat.system.zorder(table => 'db.zm', " +
        "columns => 'k,x', target_files => 8)")
      val snap = LakeLog.current(dir).get
      assert(snap.operation.startsWith("zorder") && !snap.dataChange)
      assert(snap.files.forall(f =>
        snap.parts.get(f).exists(_.head == "s1")),
        s"zorder left non-current layouts: ${snap.parts.values
          .map(_.head).toSet}")
      assert(spark.table(s"$cat.db.zm").count() == 800)
      assert(spark.table(s"$cat.db.zm").where("k = 123").count() == 1)
      assert(spark.table(s"$cat.db.zm")
        .where("x = (123 * 37) % 1000").count() >= 1)
      // dynamic overwrite — refused on mixed layouts — works again
      val prevMode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode")
      try {
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
          "dynamic")
        spark.sql(s"INSERT OVERWRITE $cat.db.zm " +
          "SELECT 123, CAST((123 * 37) % 1000 AS BIGINT), 'replaced'")
        assert(spark.table(s"$cat.db.zm")
          .where("v = 'replaced'").count() == 1)
      } finally spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", prevMode)
    }
  }

  test("GROUP BY an identity partition column answers from the " +
       "manifest alone: pushed complete aggregate, zero footer opens, " +
       "DV-exact live counts, fully-deleted partitions vanish, and " +
       "non-identity groupings fall back to the row scan correctly") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.gm (region STRING, x BIGINT) " +
        "PARTITIONED BY (region) " +
        "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
      spark.sql(s"INSERT INTO $cat.db.gm SELECT " +
        "CASE WHEN id % 5 = 4 THEN NULL ELSE concat('r', id % 5) END, " +
        "id FROM range(0, 500, 1, 4)")
      spark.sql(s"DELETE FROM $cat.db.gm WHERE x % 3 = 0") // DVs
      spark.sql(s"DELETE FROM $cat.db.gm WHERE region = 'r1'") // full
      val expected = spark.table(s"$cat.db.gm")
        .selectExpr("region", "x").collect()
        .groupBy(r => if (r.isNullAt(0)) null else r.getString(0))
        .view.mapValues(_.length.toLong).toMap

      val before = LakeStats.footerOpens.get()
      val agg = spark.sql(
        s"SELECT region, count(*) AS n FROM $cat.db.gm GROUP BY region")
      val got = agg.collect()
        .map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
          r.getLong(1)).toMap
      assert(got == expected)
      assert(!got.contains("r1"), "fully-deleted partition must vanish")
      assert(got.contains(null), "null source values form the null group")
      assert(LakeStats.footerOpens.get() == before,
        "metadata-grouped count opened data-file footers")
      assert(agg.queryExecution.executedPlan.toString
        .contains("metadata-grouped"),
        "plan lost the pushed-aggregate evidence:\n" +
          agg.queryExecution.executedPlan)

      // a non-identity grouping (expression over the column) falls
      // back to the row scan and still agrees
      val byLen = spark.sql(s"SELECT length(region) AS l, count(*) AS n " +
        s"FROM $cat.db.gm GROUP BY 1").collect()
      assert(byLen.map(_.getLong(1)).sum == expected.values.sum)
    }
  }

  test("GROUP BY identity partition + MIN/MAX answers from per-file " +
       "manifest stats joined to tuples: zero footer opens, all-null " +
       "groups yield SQL NULL, and deletion vectors make it decline " +
       "to the row scan (still correct)") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.gx (region STRING, x BIGINT, " +
        "d DATE, y BIGINT) PARTITIONED BY (region) " +
        "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
      // region r3's y is entirely NULL (per-file all-null proof), the
      // others mix nulls and values; multiple files per region
      spark.sql(s"INSERT INTO $cat.db.gx SELECT " +
        "concat('r', id % 4), id, date_add(date'2024-01-01', " +
        "CAST(id % 90 AS INT)), " +
        "CASE WHEN id % 4 = 3 THEN NULL " +
        "     WHEN id % 7 = 0 THEN NULL ELSE id * 2 END " +
        "FROM range(0, 400, 1, 4)")
      val q = s"SELECT region, count(*) AS n, min(x) AS min_x, " +
        s"max(x) AS max_x, min(d) AS min_d, max(d) AS max_d, " +
        s"min(y) AS min_y, max(y) AS max_y " +
        s"FROM $cat.db.gx GROUP BY region"
      val before = LakeStats.footerOpens.get()
      val agg = spark.sql(q)
      val got = agg.collect().map(r => r.getString(0) -> r).toMap
      assert(LakeStats.footerOpens.get() == before,
        "grouped MIN/MAX opened data-file footers")
      assert(agg.queryExecution.executedPlan.toString
        .contains("metadata-grouped"),
        "plan lost the pushed-aggregate evidence:\n" +
          agg.queryExecution.executedPlan)
      // reference from a plain row scan over the same data
      val ref = spark.table(s"$cat.db.gx")
        .groupBy("region")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.min("x"),
          org.apache.spark.sql.functions.max("x"),
          org.apache.spark.sql.functions.min("d"),
          org.apache.spark.sql.functions.max("d"),
          org.apache.spark.sql.functions.min("y"),
          org.apache.spark.sql.functions.max("y"))
        .collect().map(r => r.getString(0) -> r).toMap
      assert(got.keySet == ref.keySet)
      got.foreach { case (k, r) =>
        assert(r.toSeq.drop(1) == ref(k).toSeq.drop(1),
          s"group $k: meta ${r.toSeq} != scan ${ref(k).toSeq}")
      }
      assert(got("r3").isNullAt(6) && got("r3").isNullAt(7),
        "all-null group must yield SQL NULL extremes")
      // DVs break extremum provability: the push declines, the row
      // scan answers, values stay right
      spark.sql(s"DELETE FROM $cat.db.gx WHERE x % 5 = 0")
      val agg2 = spark.sql(q)
      assert(!agg2.queryExecution.executedPlan.toString
        .contains("metadata-grouped"),
        "MIN/MAX must not push with live deletion vectors")
      val ref2 = spark.table(s"$cat.db.gx")
        .where("x % 5 != 0").selectExpr("max(x)").head().getLong(0)
      assert(agg2.collect().map(_.getLong(3)).max == ref2)
      // and a COUNT-only grouping still pushes with DVs (live-exact)
      val cnt = spark.sql(
        s"SELECT region, count(*) AS n FROM $cat.db.gx GROUP BY region")
      assert(cnt.queryExecution.executedPlan.toString
        .contains("metadata-grouped"))
      assert(cnt.collect().map(_.getLong(1)).sum ==
        spark.table(s"$cat.db.gx").count())
    }
  }

  test("GROUP BY identity partition + COUNT(col) answers from per-file " +
       "null counts (zero footer opens, DVs decline it), exact against " +
       "the row scan") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.gc (region STRING, y BIGINT) " +
        "PARTITIONED BY (region) " +
        "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
      spark.sql(s"INSERT INTO $cat.db.gc SELECT concat('r', id % 3), " +
        "CASE WHEN id % 5 = 0 THEN NULL ELSE id END " +
        "FROM range(0, 300, 1, 4)")
      val q = s"SELECT region, count(y) AS n FROM $cat.db.gc " +
        "GROUP BY region"
      val before = LakeStats.footerOpens.get()
      val agg = spark.sql(q)
      val got = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(LakeStats.footerOpens.get() == before,
        "grouped COUNT(col) opened data-file footers")
      assert(agg.queryExecution.executedPlan.toString
        .contains("metadata-grouped"))
      val ref = spark.table(s"$cat.db.gc").where("y IS NOT NULL")
        .groupBy("region").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == ref)
      // DVs make per-group null splits unknowable: decline, stay right
      spark.sql(s"DELETE FROM $cat.db.gc WHERE y % 7 = 0")
      val agg2 = spark.sql(q)
      assert(!agg2.queryExecution.executedPlan.toString
        .contains("metadata-grouped"))
      assert(agg2.collect().map(_.getLong(1)).sum ==
        spark.table(s"$cat.db.gc").where("y IS NOT NULL").count())
    }
  }

  test("DECIMAL precision widening is metadata-only: old files upcast " +
       "per vintage, values exact, scale changes refuse") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.dw (k BIGINT, p DECIMAL(10,2))")
      spark.sql(s"INSERT INTO $cat.db.dw SELECT id, " +
        "CAST(id + 0.75 AS DECIMAL(10,2)) FROM range(50)")
      spark.sql(s"ALTER TABLE $cat.db.dw ALTER COLUMN p TYPE DECIMAL(15,2)")
      spark.sql(s"INSERT INTO $cat.db.dw SELECT id, " +
        "CAST(id * 1000000 + 0.25 AS DECIMAL(15,2)) FROM range(50, 60)")
      assert(spark.table(s"$cat.db.dw").schema("p").dataType ==
        org.apache.spark.sql.types.DecimalType(15, 2))
      val s = spark.sql(s"SELECT sum(p) FROM $cat.db.dw").head().getDecimal(0)
      val want = spark.sql("SELECT sum(v) FROM (" +
        "SELECT CAST(id + 0.75 AS DECIMAL(15,2)) AS v FROM range(50) " +
        "UNION ALL SELECT CAST(id * 1000000 + 0.25 AS DECIMAL(15,2)) " +
        "FROM range(50, 60))").head().getDecimal(0)
      assert(s == want, s"$s vs $want")
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.dw ALTER COLUMN p TYPE DECIMAL(15,4)")
      }
      // past-18 precision widening is supported since r13 (new files
      // encode FLBA, old INT64 vintages decode per their own footer):
      // widen and re-read exactly
      spark.sql(s"ALTER TABLE $cat.db.dw ALTER COLUMN p TYPE DECIMAL(25,2)")
      assert(spark.table(s"$cat.db.dw").schema("p").dataType ==
        org.apache.spark.sql.types.DecimalType(25, 2))
      assert(spark.sql(s"SELECT sum(p) FROM $cat.db.dw")
        .head().getDecimal(0) == want)
      // and new past-Long-unscaled values land beside the old vintage
      spark.sql(s"INSERT INTO $cat.db.dw SELECT 1, " +
        "CAST('10000000000000000000000.50' AS DECIMAL(25,2))")
      assert(spark.sql(s"SELECT sum(p) FROM $cat.db.dw")
        .head().getDecimal(0) ==
        want.add(new java.math.BigDecimal("10000000000000000000000.50")))
    }
  }

  test("multi-table transactions keep the partitioned layout: staged " +
       "appends split per tuple through the connector writer and the " +
       "applied commits carry the tuples") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.txp (g BIGINT, x BIGINT) " +
        "PARTITIONED BY (g)")
      spark.sql(s"CREATE TABLE $cat.db.txu (note STRING)")
      import graft.sources.dsv2.LakeTx
      val a = LakeTx.stageAppend(spark,
        spark.range(0, 300).selectExpr("id % 3 AS g", "id AS x"),
        s"$root/db/txp", "facts")
      val b = LakeTx.stageAppend(spark,
        spark.range(1).selectExpr("'batch-1' AS note"),
        s"$root/db/txu", "audit")
      LakeTx.commit(root, Seq(a, b))
      val snap = LakeLog.current(s"$root/db/txp").get
      assert(snap.parts.keySet == snap.files.toSet,
        "transactional append lost partition tuples")
      assert(snap.parts.values.toSeq.distinct.size == 3)
      assert(spark.table(s"$cat.db.txp").count() == 300)
      // the layout is live: pruning and the grouped metadata count work
      assert(spark.table(s"$cat.db.txp").where("g = 1").count() == 100)
      val gm = spark.sql(
        s"SELECT g, count(*) AS n FROM $cat.db.txp GROUP BY g")
      assert(gm.collect().map(_.getLong(1)).toSeq == Seq(100, 100, 100))
      assert(gm.queryExecution.executedPlan.toString
        .contains("metadata-grouped"))
    }
  }

  test("bad specs fail at CREATE, not first INSERT: unknown transform, " +
       "missing source column, inadmissible source type") {
    withCatalog { (cat, _) =>
      intercept[Exception] {
        spark.sql(s"CREATE TABLE $cat.db.b1 (k BIGINT) " +
          "PARTITIONED BY (hours(k))")
      }
      intercept[Exception] {
        spark.sql(s"CREATE TABLE $cat.db.b2 (k BIGINT) " +
          "PARTITIONED BY (bucket(4, missing))")
      }
      intercept[Exception] {
        spark.sql(s"CREATE TABLE $cat.db.b3 (k BIGINT, x DOUBLE) " +
          "PARTITIONED BY (identity(x))")
      }
    }
  }

  test("db.t.files inventory: one row per live file with exact " +
       "physical/live counts, DV debt, sizes, partition slots, stats " +
       "coverage — and maintenance reshapes it coherently") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.inv (pri STRING, k BIGINT) " +
        "PARTITIONED BY (pri) " +
        "TBLPROPERTIES ('write.mode'='merge-on-read')")
      spark.sql(s"INSERT INTO $cat.db.inv SELECT " +
        "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id " +
        "FROM range(0, 1000, 1, 4)")
      def inv() = spark.table(s"$cat.db.inv.files").collect()
        .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2),
          r.getLong(3), r.getInt(4), r.getLong(5), r.getBoolean(6)))
      val before = inv()
      // partitioned write: per-tuple files, all stats-backed, no DVs,
      // physical == live, real on-disk sizes
      assert(before.map(_._3).sum == 1000L)
      assert(before.forall(f => f._3 == f._4 && f._5 == 0))
      assert(before.forall(_._7), "every writer file is stats-backed")
      assert(before.forall(_._6 > 0L), "sizes come from the listing")
      assert(before.forall(_._2.exists(s =>
        s.contains("even") || s.contains("odd"))),
        s"partition slots must render: ${before.map(_._2).toSeq}")
      // MOR delete: DV debt appears, live drops, physical does not
      spark.sql(s"DELETE FROM $cat.db.inv WHERE k % 10 = 3")
      val dv = inv()
      assert(dv.map(_._3).sum == 1000L)
      assert(dv.map(_._4).sum == 900L)
      assert(dv.exists(_._5 > 0), "deleted files must show DV debt")
      // rewrite_deletes: debt cleared, live == physical == 900
      spark.sql(s"CALL $cat.system.rewrite_deletes('db.inv')")
      val after = inv()
      assert(after.forall(_._5 == 0))
      assert(after.map(_._4).sum == 900L)
      assert(after.forall(f => f._3 == f._4))
    }
  }
}
