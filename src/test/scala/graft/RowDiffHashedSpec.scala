package graft

import org.apache.spark.sql.functions._

/** The hashed EXCEPT ALL formulation must reproduce exceptAll's MULTISET
  * semantics exactly — the driver-oracle lake has unique rows, so the
  * excess-multiplicity replication (k > 1) and the null-placement hash
  * discrimination never fire there; these constructed cases pin them.
  */
class RowDiffHashedSpec extends SparkSpec {
  import spark.implicits._

  /** Inline reimplementation of the delta_rowdiff_hashed plan over two
    * arbitrary frames (the declared query is bound to the agency lake).
    */
  private def hashedDiff(n: org.apache.spark.sql.DataFrame,
                         p: org.apache.spark.sql.DataFrame) = {
    val cols = n.columns.toIndexedSeq
    def withH(df: org.apache.spark.sql.DataFrame) = df.withColumn("_h",
      xxhash64(struct(cols.flatMap(c => Seq(col(c).isNull, col(c))): _*)))
    val nc = withH(n).groupBy("_h").agg(count(lit(1)).as("_cn"))
    val pc = withH(p).groupBy("_h").agg(count(lit(1)).as("_cp"))
    val excess = nc.join(pc, Seq("_h"), "left_outer")
      .select(col("_h"), (col("_cn") - coalesce(col("_cp"), lit(0L))).as("_k"))
      .where(col("_k") > 0)
    withH(n).dropDuplicates("_h")
      .join(excess, "_h")
      .withColumn("_i", explode(expr("sequence(1, _k)")))
      .select(cols.map(col): _*)
  }

  test("multiset excess replication matches exceptAll row-for-row") {
    // newest has (A x3, B x1, C x2); prev has (A x1, C x2, D x1)
    // -> diff must be exactly (A x2, B x1)
    val n = Seq("A", "A", "A", "B", "C", "C").toDF("v")
    val p = Seq("A", "C", "C", "D").toDF("v")
    val expected = n.exceptAll(p).groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = hashedDiff(n, p).groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(expected == Map("A" -> 2L, "B" -> 1L)) // sanity on the oracle
    assert(got == expected)
  }

  test("null placement distinguishes rows (the marker-pair hash)") {
    // ("x", null) vs (null, "x"): a nulls-skipping hash fold would
    // collide these and the diff would silently drop the row
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
    val p = Seq((Option.empty[String], Option("x"))).toDF("a", "b")
    val got = hashedDiff(n, p).collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "x" && got.head.isNullAt(1))
  }

  test("identical multisets diff to empty") {
    val n = Seq(1, 2, 2, 3).toDF("v")
    assert(hashedDiff(n, n).count() == 0)
  }

  test("declared query equals the exceptAll formulation on the lake") {
    // compared as (row-json -> multiplicity) maps: exceptAll OVER the two
    // query outputs trips a Catalyst binding quirk (generate + distinct
    // + set-op), and the map compare asserts the same multiset anyway
    def canon(name: String): Map[String, Long] = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.select(to_json(struct(df.columns.map(col): _*)).as("j"))
        .groupBy("j").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val d = canon("delta_rowdiff")
    val h = canon("delta_rowdiff_hashed")
    assert(d.nonEmpty && h == d)
  }
}
