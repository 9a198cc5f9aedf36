package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKeyExec

/** The optimizer-rule tier (plans/RankLimitToTopK): the idiomatic
  * `row_number() <= k` window form must be rewritten to the native
  * bounded-heap TopKPerKeyExec — users get the O(k)-memory plan without
  * knowing the custom operator exists.
  */
class RankRewriteSpec extends SparkSpec {

  private def hasTopK(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("TopKPerKey")

  test("row_number <= k filter over a window is rewritten to TopKPerKeyExec") {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = Tables(spark, sfDir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
    assert(hasTopK(df), df.queryExecution.executedPlan.toString)
    assert(!df.queryExecution.executedPlan.toString.contains("WindowExec"))

    // row-identical to the window semantics, computed independently
    val rows = df.select("o_custkey", "o_orderkey", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val expected = Tables(spark, sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq
      .flatMap { case (ck, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case (r, i) => (ck, r._2, i + 1) }
      }
    assert(rows.toSet == expected.toSet)
    assert(rows.length == expected.length)
  }

  test("SQL subquery form is rewritten too (filter pushes through project)") {
    Tables(spark, sfDir, "orders").createOrReplaceTempView("orders_rr")
    val df = spark.sql(
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders_rr) WHERE rnk <= 2 AND o_orderkey % 2 = 0""".stripMargin)
    assert(hasTopK(df), df.queryExecution.executedPlan.toString)
    // the non-rank conjunct must survive as a residual filter ABOVE the
    // operator (it references the ranked output, not the input)
    assert(df.collect().forall(_.getLong(1) % 2 == 0))
  }

  test("the DECLARED window_rank_topn query plans TopKPerKeyExec " +
       "(extensions wiring, not just the rule in isolation)") {
    // guards the full path the driver exercises: SparkEntry.queries →
    // session extensions → injected rule → native operator. A wiring
    // regression (extension dropped from a session builder, rule guard
    // tightened) would silently fall back to the full window sort and
    // only show up as a perf cliff at scale.
    val df = graft.queries.RelationalQueries
      .queries("window_rank_topn")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("WindowExec"),
      s"window_rank_topn fell back to the window sort:\n$plan")
  }

  test("unsupported shapes are left alone") {
    // rank() is not row_number: k rows per key is not the contract
    val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice"))
    val ranked = Tables(spark, sfDir, "orders")
      .withColumn("r", rank().over(w)).filter(col("r") <= 3)
    assert(!hasTopK(ranked))
    // no partition spec: global top-k has no clustering keys
    val g = Window.orderBy(col("o_totalprice"))
    val globalTop = Tables(spark, sfDir, "orders")
      .withColumn("r", row_number().over(g)).filter(col("r") <= 3)
    assert(!hasTopK(globalTop))
    assert(globalTop.count() == 3)
  }
}
