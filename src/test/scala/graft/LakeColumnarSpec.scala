package graft

import java.nio.file.Files

import graft.sources.dsv2.GraftCatalog

/** The vectorized read path ([[graft.sources.dsv2.LakeColumnarReader]],
  * the r12 verdict's rung 2): plan-pinned columnar scans, exact parity
  * with the row path under deletion vectors / reorder / back-fill /
  * vintage widening, and correct fallback for the shapes the columnar
  * scope excludes (CDC, metadata columns, nested types).
  */
class LakeColumnarSpec extends SparkSpec {

  private var n = 0
  private def withCatalog[A](f: (String, String) => A): A = {
    val root = Files.createTempDirectory("graft-colr").toString
    n += 1
    val cat = s"colrcat$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  private def isColumnar(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("ColumnarToRow")

  /** Columnar is the default; tests still pin it explicitly (and
    * restore after) so a future default flip cannot silently turn
    * these into row-path tests.
    */
  private def withColumnar[A](value: String)(f: => A): A = {
    val prev = System.getProperty("graft.lake.reader.columnar")
    System.setProperty("graft.lake.reader.columnar", value)
    try f
    finally {
      if (prev == null) System.clearProperty("graft.lake.reader.columnar")
      else System.setProperty("graft.lake.reader.columnar", prev)
    }
  }

  test("plan pin: a flat lake scan reports COLUMNAR (ColumnarToRow in " +
       "the executed plan) and whole-stage codegen consumes the " +
       "batches; results identical to the row path under MOR deletion " +
       "vectors, projection reorder, and a multi-type projection") {
    withColumnar("true") { withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.c (k BIGINT, s STRING, " +
        "d DOUBLE, f BOOLEAN, dt DATE, m DECIMAL(12,2), " +
        "w DECIMAL(38,4), b BINARY) " +
        "TBLPROPERTIES ('write.mode'='merge-on-read')")
      spark.sql(s"INSERT INTO $cat.db.c SELECT id, concat('s', id), " +
        "id * 0.5, id % 2 = 0, date_add(DATE'2020-01-01', " +
        "CAST(id % 300 AS INT)), CAST(id + 0.25 AS DECIMAL(12,2)), " +
        "CAST(concat(cast(id AS STRING), " +
        "'00000000000000000000.0000') AS DECIMAL(38,4)), " +
        "CAST(concat('blob', id) AS BINARY) " +
        "FROM range(0, 10000, 1, 4)")
      spark.sql(s"DELETE FROM $cat.db.c WHERE k % 7 = 3") // DVs
      // reordered multi-type projection with a residual filter (keeps
      // the row read from short-circuiting into metadata)
      val q = spark.table(s"$cat.db.c")
        .selectExpr("m", "k", "s", "b", "dt", "w", "d", "f")
        .where("k >= 0")
      assert(isColumnar(q), "flat lake scan must report columnar:\n" +
        q.queryExecution.executedPlan.toString.take(600))
      // whole-stage codegen consumes the batches: the tree form marks
      // codegen'd stages with the *(n) prefix on ColumnarToRow
      assert(q.queryExecution.executedPlan.toString
        .linesIterator.exists(l =>
          l.contains("ColumnarToRow") && l.contains("*(")),
        "ColumnarToRow must sit inside a codegen stage")
      def canon(r: org.apache.spark.sql.Row): String =
        (0 until r.length).map { i =>
          r.get(i) match {
            case bs: Array[Byte] => new String(bs, "UTF-8")
            case other           => String.valueOf(other)
          }
        }.mkString("|")
      val rows = q.collect()
      assert(rows.length == (0 until 10000).count(_ % 7 != 3))
      // row-path parity, bit for bit (fast row path forced via the
      // columnar kill switch)
      val prev = System.getProperty("graft.lake.reader.columnar")
      System.setProperty("graft.lake.reader.columnar", "false")
      try {
        val q2 = spark.table(s"$cat.db.c")
          .selectExpr("m", "k", "s", "b", "dt", "w", "d", "f")
          .where("k >= 0")
        assert(!isColumnar(q2), "kill switch must force the row path")
        val a = rows.map(canon).sorted
        val b = q2.collect().map(canon).sorted
        assert(a.sameElements(b), "columnar and row reads diverged")
      } finally {
        if (prev == null)
          System.clearProperty("graft.lake.reader.columnar")
        else System.setProperty("graft.lake.reader.columnar", prev)
      }
      // aggregates over the columnar scan stay exact
      val agg = spark.table(s"$cat.db.c").where("k >= 0")
        .selectExpr("sum(m) AS sm", "sum(w) AS sw", "count(s) AS cs")
        .head()
      val want = spark.sql("SELECT " +
        "sum(CAST(id + 0.25 AS DECIMAL(12,2))), " +
        "sum(CAST(concat(cast(id AS STRING), " +
        "'00000000000000000000.0000') AS DECIMAL(38,4))), count(*) " +
        "FROM range(0, 10000) WHERE id % 7 != 3").head()
      assert(agg.getDecimal(0) == want.getDecimal(0))
      assert(agg.getDecimal(1) == want.getDecimal(1))
      assert(agg.getLong(2) == want.getLong(2))
    } }
  }

  test("ADD COLUMN back-fill and widened vintages decode through the " +
       "columnar path: old files' missing column reads all-null, " +
       "INT-vintage values widen to BIGINT in the vectors") {
    withColumnar("true") { withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.w (k INT, s STRING)")
      spark.sql(s"INSERT INTO $cat.db.w SELECT CAST(id AS INT), " +
        "concat('a', id) FROM range(0, 500, 1, 2)")
      spark.sql(s"ALTER TABLE $cat.db.w ALTER COLUMN k TYPE BIGINT")
      spark.sql(s"ALTER TABLE $cat.db.w ADD COLUMN extra DOUBLE")
      spark.sql(s"INSERT INTO $cat.db.w SELECT id, concat('a', id), " +
        "id * 2.0 FROM range(500, 1000, 1, 2)")
      val q = spark.table(s"$cat.db.w").where("k >= 0")
      assert(isColumnar(q),
        q.queryExecution.executedPlan.toString.take(400))
      val rows = q.collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toMap
      assert(rows.size == 1000)
      assert(rows(100L) == -1.0, "old-vintage row must back-fill null")
      assert(rows(700L) == 1400.0)
      assert(q.agg(org.apache.spark.sql.functions.sum("k")).head()
        .getLong(0) == (0L until 1000L).sum)
    } }
  }

  test("CDC goes COLUMNAR for whole-file event batches (r16): an " +
       "append-only history's change feed reports ColumnarToRow with " +
       "_change_type/_version served as constant vectors and exact " +
       "events; a positional (delete) version in the range pins the " +
       "WHOLE batch to the row path — Spark's per-batch columnar " +
       "answer must be uniform") {
    withColumnar("true") { withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.ap (k BIGINT, s STRING)")
      spark.sql(s"INSERT INTO $cat.db.ap " +
        "SELECT id, concat('a', id) FROM range(0, 100)")
      spark.sql(s"INSERT INTO $cat.db.ap " +
        "SELECT id, concat('b', id) FROM range(100, 150)")
      val ch = spark.table(s"$cat.db.ap.changes")
        .selectExpr("k", "s", "_change_type", "_commit_version")
      assert(isColumnar(ch), "append-only feed must be columnar")
      val rows = ch.collect()
      assert(rows.length == 150)
      assert(rows.forall(_.getString(2) == "insert"),
        "constant change-type vectors must serve the annotation")
      val perVersion = rows.groupBy(_.getLong(3))
        .map(_._2.length).toSeq.sorted
      assert(perVersion == Seq(50, 100),
        s"constant version vectors must split the commits: $perVersion")
      // values themselves exact through the constant-vector batches
      assert(rows.map(r => r.getLong(0) -> r.getString(1)).sorted.toSeq
        == (0L until 150L).map(k =>
          k -> s"${if (k < 100) "a" else "b"}$k"))
      // positional class in the range: the whole batch pins to row
      spark.sql(s"ALTER TABLE $cat.db.ap " +
        "SET TBLPROPERTIES ('write.mode'='merge-on-read')")
      spark.sql(s"DELETE FROM $cat.db.ap WHERE k = 5")
      val ch2 = spark.table(s"$cat.db.ap.changes")
        .selectExpr("k", "_change_type")
      assert(!isColumnar(ch2), "a positional split pins the batch")
      assert(ch2.where("_change_type = 'delete'").count() == 1)
    } }
  }

  test("excluded shapes fall back to the row path and stay exact: " +
       "metadata columns (_file/_pos), CDC reads, and nested schemas") {
    withColumnar("true") { withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.f (k BIGINT, s STRING) " +
        "TBLPROPERTIES ('write.mode'='merge-on-read')")
      spark.sql(s"INSERT INTO $cat.db.f SELECT id, concat('x', id) " +
        "FROM range(0, 300, 1, 2)")
      // _pos projection: row path, exact positions
      val mp = spark.table(s"$cat.db.f").selectExpr("k", "_pos")
        .where("k >= 0")
      assert(!isColumnar(mp), "metadata columns must use the row path")
      assert(mp.collect().length == 300)
      // CDC: row path (positional reads)
      spark.sql(s"DELETE FROM $cat.db.f WHERE k % 10 = 4")
      val ch = spark.table(s"$cat.db.f.changes")
      assert(!isColumnar(ch.where("_change_type = 'delete'")),
        "CDC reads must use the row path")
      assert(ch.where("_change_type = 'delete'").count() == 30)
      // nested schema: row path (record assembly)
      spark.sql(s"CREATE TABLE $cat.db.n (k BIGINT, " +
        "st STRUCT<a: BIGINT>)")
      spark.sql(s"INSERT INTO $cat.db.n SELECT id, " +
        "named_struct('a', id * 3) FROM range(0, 100)")
      val nq = spark.table(s"$cat.db.n").where("k >= 0")
      assert(!isColumnar(nq), "nested schemas must use the row path")
      assert(nq.selectExpr("sum(st.a)").head().getLong(0) ==
        (0L until 100L).map(_ * 3).sum)
    } }
  }
}
