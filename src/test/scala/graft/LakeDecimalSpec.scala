package graft

import java.nio.file.Files

import graft.sources.dsv2.{GraftCatalog, LakeLog}

/** DECIMAL columns through the lake connector: INT64-unscaled parquet
  * encoding up to precision 18 and FIXED_LEN_BYTE_ARRAY beyond (to
  * 38), exact round-trips through DML / time travel / SPJ bucketing,
  * exact stats pruning in decimal space at both the manifest and
  * footer layers, precision widening across the encoding boundary,
  * and metadata MIN/MAX for any precision.
  */
class LakeDecimalSpec extends SparkSpec {

  private var n = 0
  private def withCatalog[A](f: (String, String) => A): A = {
    val root = Files.createTempDirectory("graft-dec").toString
    n += 1
    val cat = s"deccat$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  test("DECIMAL(12,2) round-trips exactly through write, MOR delete, " +
       "filter, aggregate, and time travel — sums are order-free " +
       "exact, never a double in sight") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.m (k BIGINT, price DECIMAL(12,2)) " +
        "TBLPROPERTIES ('write.mode'='merge-on-read')")
      // values exercising carry/negatives/zero cents
      spark.sql(s"INSERT INTO $cat.db.m SELECT id, " +
        "CAST((id * 137 % 100000) + 0.01 * (id % 100) AS DECIMAL(12,2)) " +
        "FROM range(0, 5000, 1, 4)")
      val v1 = LakeLog.current(s"$root/db/m").get.version
      spark.sql(s"DELETE FROM $cat.db.m WHERE k % 3 = 1")
      // exact sum agrees with the arithmetic restatement
      val got = spark.sql(
        s"SELECT sum(price) AS s, min(price) AS lo, max(price) AS hi " +
          s"FROM $cat.db.m").head()
      val want = spark.sql(
        "SELECT sum(p) AS s, min(p) AS lo, max(p) AS hi FROM (" +
          "SELECT CAST((id * 137 % 100000) + 0.01 * (id % 100) " +
          "AS DECIMAL(12,2)) AS p FROM range(0, 5000) WHERE id % 3 != 1)")
        .head()
      assert(got.getDecimal(0) == want.getDecimal(0), s"$got vs $want")
      assert(got.getDecimal(1) == want.getDecimal(1))
      assert(got.getDecimal(2) == want.getDecimal(2))
      // schema read back as the declared decimal, not long/double
      assert(spark.table(s"$cat.db.m").schema("price").dataType ==
        org.apache.spark.sql.types.DecimalType(12, 2))
      // filters stay exact (residual re-apply; stats never consulted
      // for decimals)
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.db.m WHERE price > 50000.00")
        .head().getLong(0) ==
        spark.sql("SELECT count(*) FROM (SELECT id, " +
          "CAST((id * 137 % 100000) + 0.01 * (id % 100) AS DECIMAL(12,2))" +
          " AS p FROM range(0, 5000) WHERE id % 3 != 1) WHERE p > 50000.00")
          .head().getLong(0))
      // time travel to the pre-delete version sees every cent
      val all = spark.sql(
        s"SELECT sum(price) FROM $cat.db.m VERSION AS OF $v1").head()
      val allWant = spark.sql("SELECT sum(CAST((id * 137 % 100000) + " +
        "0.01 * (id % 100) AS DECIMAL(12,2))) FROM range(0, 5000)").head()
      assert(all.getDecimal(0) == allWant.getDecimal(0))
    }
  }

  test("decimal manifest stats: a selective money filter prunes whole " +
       "files without footer opens, comparisons against finer-scale " +
       "literals stay exact, and MIN/MAX answers from metadata alone") {
    withCatalog { (cat, root) =>
      import graft.sources.dsv2.{LakeStats, LakeLog}
      spark.sql(s"CREATE TABLE $cat.db.s (k BIGINT, price DECIMAL(12,2))")
      // four disjoint price-range files (single-slice inserts)
      (0 until 4).foreach(i =>
        spark.sql(s"INSERT INTO $cat.db.s SELECT id, " +
          s"CAST(${i * 1000} + id % 1000 + 0.25 AS DECIMAL(12,2)) " +
          s"FROM range(${i * 1000}, ${i * 1000 + 1000}, 1, 1)"))
      val head = LakeLog.current(s"$root/db/s").get
      assert(head.files.size == 4)
      assert(head.stats.values.forall(
        _.cols.get("price").exists(_.kind == "dec:2")),
        s"price must harvest as dec:2 — ${head.stats.values.head.cols}")
      val before = LakeStats.footerOpens.get()
      val n = spark.sql(
        s"SELECT count(*) FROM $cat.db.s WHERE price >= 3000.00")
        .head().getLong(0)
      val opens = LakeStats.footerOpens.get() - before
      assert(n == 1000)
      assert(opens <= 1, s"expected 3 of 4 files stats-pruned, opened " +
        s"$opens footers")
      // a literal FINER than the column scale compares exactly in
      // decimal space (no rounding heuristics): 999.995 sits between
      // 999.99 and 1000.00
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.db.s WHERE price > 999.995")
        .head().getLong(0) == 3000)
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.db.s WHERE price < 0.255")
        .head().getLong(0) == 1)
      // metadata-only global MIN/MAX on the decimal column
      val b2 = LakeStats.footerOpens.get()
      val mm = spark.sql(
        s"SELECT min(price) AS lo, max(price) AS hi FROM $cat.db.s")
      val r = mm.head()
      assert(LakeStats.footerOpens.get() == b2,
        "decimal metadata MIN/MAX opened footers")
      assert(mm.queryExecution.executedPlan.toString
        .contains("metadata-only global"))
      assert(r.getDecimal(0) == new java.math.BigDecimal("0.25"))
      assert(r.getDecimal(1) == new java.math.BigDecimal("3999.25"))
      // grouped flavor over a partitioned decimal table
      spark.sql(s"CREATE TABLE $cat.db.sg (g BIGINT, price DECIMAL(10,2)) " +
        "PARTITIONED BY (g)")
      spark.sql(s"INSERT INTO $cat.db.sg SELECT id % 3, " +
        "CAST(id + 0.50 AS DECIMAL(10,2)) FROM range(0, 300, 1, 4)")
      val b3 = LakeStats.footerOpens.get()
      val gm = spark.sql(s"SELECT g, min(price) AS lo, max(price) AS hi " +
        s"FROM $cat.db.sg GROUP BY g")
      val rows = gm.collect().map(x => x.getLong(0) ->
        (x.getDecimal(1), x.getDecimal(2))).toMap
      assert(LakeStats.footerOpens.get() == b3)
      assert(gm.queryExecution.executedPlan.toString
        .contains("metadata-grouped"))
      assert(rows(0L)._1 == new java.math.BigDecimal("0.50") &&
        rows(2L)._2 == new java.math.BigDecimal("299.50"), rows.toString)
    }
  }

  test("decimal stats pruning soundness, randomized: whenever the " +
       "pruner declares a file provably empty for a filter, brute-force " +
       "evaluation over the actual decimal values agrees — across " +
       "random scales and literals finer/coarser than the column") {
    import org.apache.spark.sql.sources._
    import graft.sources.dsv2.{LakeColumnRef, LakeStats}
    val rnd = new scala.util.Random(42)
    val cols = Array(LakeColumnRef("p", -1, Array("p")))
    var pruned = 0
    (1 to 3000).foreach { trial =>
      val scale = rnd.nextInt(4)
      val n = 1 + rnd.nextInt(8)
      val unscaled = Seq.fill(n)(rnd.nextInt(2001) - 1000L)
      val values = unscaled.map(u =>
        new java.math.BigDecimal(java.math.BigInteger.valueOf(u), scale))
      val st = LakeStats.FileStats(n.toLong, 1, Map("p" ->
        LakeStats.ColStats(s"dec:$scale",
          Some(unscaled.min.toString), Some(unscaled.max.toString),
          0L, -1)))
      // literal at a random scale — sometimes finer than the column
      val lit = new java.math.BigDecimal(
        java.math.BigInteger.valueOf(rnd.nextInt(20001) - 10000L),
        rnd.nextInt(5))
      val f: Filter = rnd.nextInt(5) match {
        case 0 => EqualTo("p", lit)
        case 1 => GreaterThan("p", lit)
        case 2 => GreaterThanOrEqual("p", lit)
        case 3 => LessThan("p", lit)
        case _ => LessThanOrEqual("p", lit)
      }
      val brute = values.exists(v => f match {
        case EqualTo(_, x: java.math.BigDecimal)            => v.compareTo(x) == 0
        case GreaterThan(_, x: java.math.BigDecimal)        => v.compareTo(x) > 0
        case GreaterThanOrEqual(_, x: java.math.BigDecimal) => v.compareTo(x) >= 0
        case LessThan(_, x: java.math.BigDecimal)           => v.compareTo(x) < 0
        case LessThanOrEqual(_, x: java.math.BigDecimal)    => v.compareTo(x) <= 0
        case _ => true
      })
      val verdict = LakeStats.mightMatchFile(st, cols, Array(f))
      if (!verdict) pruned += 1
      assert(verdict || !brute,
        s"trial $trial: pruner dropped a matching file — scale=$scale " +
          s"values=$values filter=$f")
    }
    // the pruner must actually prune (vacuous soundness is useless)
    assert(pruned > 300, s"only $pruned of 3000 trials pruned")
  }

  test("DECIMAL(38,4) — FIXED_LEN_BYTE_ARRAY past Long range — " +
       "round-trips exactly through write, MOR delete, and time " +
       "travel; manifest stats prune files and metadata MIN/MAX " +
       "answers without footers") {
    withCatalog { (cat, root) =>
      import graft.sources.dsv2.{LakeLog, LakeStats}
      spark.sql(s"CREATE TABLE $cat.db.w (k BIGINT, amt DECIMAL(38,4)) " +
        "TBLPROPERTIES ('write.mode'='merge-on-read')")
      // unscaled values of ~28 digits: (id+1)·10²⁰ + id%10·10⁻⁴ —
      // far beyond any INT64 unscaled representation
      val expr = "CAST(concat(cast(id + 1 AS STRING), " +
        "'00000000000000000000.000', cast(id % 10 AS STRING)) " +
        "AS DECIMAL(38,4))"
      // four disjoint-range files (single-slice inserts)
      (0 until 4).foreach(i =>
        spark.sql(s"INSERT INTO $cat.db.w SELECT id, $expr " +
          s"FROM range(${i * 500}, ${i * 500 + 500}, 1, 1)"))
      val dir = s"$root/db/w"
      val v1 = LakeLog.current(dir).get.version
      // exact agreement with a pure-Spark restatement
      def want(pred: String) = spark.sql(
        s"SELECT sum(a) AS s, min(a) AS lo, max(a) AS hi FROM " +
          s"(SELECT id, $expr AS a FROM range(0, 2000)) WHERE $pred")
        .head()
      val got1 = spark.sql(
        s"SELECT sum(amt) AS s, min(amt) AS lo, max(amt) AS hi " +
          s"FROM $cat.db.w").head()
      val want1 = want("true")
      assert(got1.getDecimal(0) == want1.getDecimal(0),
        s"$got1 vs $want1")
      assert(got1.getDecimal(1) == want1.getDecimal(1))
      assert(got1.getDecimal(2) == want1.getDecimal(2))
      assert(spark.table(s"$cat.db.w").schema("amt").dataType ==
        org.apache.spark.sql.types.DecimalType(38, 4))
      // stats harvested as dec:4 with BigInteger canonical bounds
      val head = LakeLog.current(dir).get
      assert(head.stats.values.forall(
        _.cols.get("amt").exists(cs => cs.kind == "dec:4" &&
          cs.min.exists(_.length > 19))),
        s"wide bounds must harvest: ${head.stats.values.head.cols}")
      // a selective wide-decimal filter prunes 3 of 4 files from the
      // manifest with at most one footer open
      val before = LakeStats.footerOpens.get()
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.w WHERE amt >= " +
        "CAST('150100000000000000000000' AS DECIMAL(38,4))")
        .head().getLong(0) == 500)
      assert(LakeStats.footerOpens.get() - before <= 1,
        "wide-decimal manifest bounds must prune files")
      // MOR delete: DVs subtract exactly; time travel restores
      spark.sql(s"DELETE FROM $cat.db.w WHERE k % 3 = 1")
      val got2 = spark.sql(
        s"SELECT sum(amt) AS s, min(amt) AS lo, max(amt) AS hi " +
          s"FROM $cat.db.w").head()
      val want2 = want("id % 3 != 1")
      assert(got2.getDecimal(0) == want2.getDecimal(0))
      assert(got2.getDecimal(1) == want2.getDecimal(1))
      assert(got2.getDecimal(2) == want2.getDecimal(2))
      assert(spark.sql(
        s"SELECT sum(amt) FROM $cat.db.w VERSION AS OF $v1")
        .head().getDecimal(0) == want1.getDecimal(0))
      // metadata-only MIN/MAX on the PRE-DELETE version (DVs block the
      // fast path; the clean vintage answers from manifests alone)
      val b2 = LakeStats.footerOpens.get()
      val mm = spark.sql(s"SELECT min(amt) AS lo, max(amt) AS hi " +
        s"FROM $cat.db.w VERSION AS OF $v1")
      val r = mm.head()
      assert(LakeStats.footerOpens.get() == b2,
        "wide-decimal metadata MIN/MAX opened footers")
      assert(mm.queryExecution.executedPlan.toString
        .contains("metadata-only global"))
      assert(r.getDecimal(0) == want1.getDecimal(1))
      assert(r.getDecimal(1) == want1.getDecimal(2))
    }
  }

  test("wide-decimal PRECISION WIDENING: DECIMAL(20,2) vintages read " +
       "exactly as DECIMAL(30,2) through BOTH the columnar and the " +
       "row reader (the r13 review's toUnscaledLong overflow)") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.ww (k BIGINT, amt DECIMAL(20,2))")
      // unscaled parts beyond Long range: (id+1)·10¹⁵ + .25
      spark.sql(s"INSERT INTO $cat.db.ww SELECT id, " +
        "CAST(concat(cast(id + 1 AS STRING), " +
        "'000000000000000.25') AS DECIMAL(20,2)) " +
        "FROM range(0, 300, 1, 2)")
      spark.sql(s"ALTER TABLE $cat.db.ww ALTER COLUMN amt " +
        "TYPE DECIMAL(30,2)")
      val want = spark.sql("SELECT sum(CAST(concat(" +
        "cast(id + 1 AS STRING), '000000000000000.25') " +
        "AS DECIMAL(30,2))) FROM range(0, 300)").head().getDecimal(0)
      def total() = spark.sql(
        s"SELECT sum(amt) FROM $cat.db.ww WHERE k >= 0")
        .head().getDecimal(0)
      assert(spark.table(s"$cat.db.ww").schema("amt").dataType ==
        org.apache.spark.sql.types.DecimalType(30, 2))
      assert(total() == want, "columnar widened read drifted")
      val prev = System.getProperty("graft.lake.reader.columnar")
      System.setProperty("graft.lake.reader.columnar", "false")
      try assert(total() == want, "row-path widened read drifted")
      finally {
        if (prev == null)
          System.clearProperty("graft.lake.reader.columnar")
        else System.setProperty("graft.lake.reader.columnar", prev)
      }
    }
  }

  test("wide-decimal footer bounds prune ROW GROUPS: a range filter " +
       "on a sorted multi-group file plans a strict subset of groups") {
    withCatalog { (cat, root) =>
      import graft.sources.dsv2.{LakeLog, LakeStats, LakeTableIO}
      val prev = LakeTableIO.rowGroupBytes
      LakeTableIO.rowGroupBytes = 16L << 10 // force several groups
      try {
        spark.sql(s"CREATE TABLE $cat.db.rg (k BIGINT, amt DECIMAL(38,4))")
        // sorted single-slice insert → monotone per-group bounds
        spark.sql(s"INSERT INTO $cat.db.rg SELECT id, " +
          "CAST(concat(cast(id + 1 AS STRING), " +
          "'00000000000000000000.0000') AS DECIMAL(38,4)) " +
          "FROM range(0, 20000, 1, 1)")
        val dir = s"$root/db/rg"
        val head = LakeLog.current(dir).get
        val refs = LakeTableIO.columnRefs(LakeTableIO.tableSchema(dir))
        val lit = scala.math.BigDecimal(
          new java.math.BigDecimal("1950000000000000000000000.0000"))
        val pushed: Array[org.apache.spark.sql.sources.Filter] = Array(
          org.apache.spark.sql.sources.GreaterThanOrEqual("amt", lit))
        val plan = LakeTableIO.planRowGroups(
          head.files.map(f => new org.apache.hadoop.fs.Path(dir, f)),
          refs, pushed, pruneGroups = true, stats = head.stats)
        assert(plan.totalGroups >= 4,
          s"fixture needs several row groups, got ${plan.totalGroups}")
        assert(plan.parts.length < plan.totalGroups,
          s"decimal footer bounds pruned nothing: " +
            s"${plan.parts.length} of ${plan.totalGroups} groups kept")
        // and the filtered read stays exact end-to-end
        assert(spark.sql(s"SELECT count(*) FROM $cat.db.rg WHERE amt >= " +
          "CAST('1950000000000000000000000' AS DECIMAL(38,4))")
          .head().getLong(0) == 20000 - 19499)
      } finally LakeTableIO.rowGroupBytes = prev
    }
  }

  test("decimal keys bucket correctly never (inadmissible transform " +
       "source fails at CREATE), and decimal measures ride partitioned " +
       "tables fine") {
    withCatalog { (cat, root) =>
      // decimal as a MEASURE on a partitioned table: fine
      spark.sql(s"CREATE TABLE $cat.db.p (g BIGINT, price DECIMAL(10,2)) " +
        "PARTITIONED BY (g)")
      spark.sql(s"INSERT INTO $cat.db.p SELECT id % 4, " +
        "CAST(id + 0.25 AS DECIMAL(10,2)) FROM range(100)")
      assert(spark.sql(s"SELECT CAST(sum(price) AS DOUBLE) " +
        s"FROM $cat.db.p WHERE g = 1").head().getDouble(0) ==
        (1 until 100 by 4).map(_ + 0.25).sum)
      assert(LakeLog.current(s"$root/db/p").get.parts.nonEmpty)
    }
  }
}
