package graft

/** Plan-shape invariants of the declarative SQL-function surface (the
  * value claims the oracle hash can't see):
  *
  *   - a NAMED PARAMETER binds to exactly the plan the literal produces
  *     — binding is typed literal substitution in the parser, not
  *     string splicing (SURVEY F5: the reference sprintf-splices
  *     partition values into SQL text);
  *   - a SQL scalar UDF INLINES: the optimized plan is the same tree as
  *     the hand-inlined formula — no opaque per-row closure, no codegen
  *     wall;
  *   - a SQL table function with a correlated argument DECORRELATES:
  *     the executed plan is a join (+ window rank), not a per-outer-row
  *     subquery execution.
  */
class SqlFunctionSpec extends SparkSpec {

  test("a named parameter produces the identical optimized plan to the " +
       "inlined literal") {
    Tables(spark, sfDir, "orders").createOrReplaceTempView("orders")
    val bound = spark.sql(
      "SELECT count(*) AS n FROM orders WHERE o_orderstatus = :status",
      Map("status" -> "O"))
    val literal = spark.sql(
      "SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'O'")
    assert(bound.queryExecution.optimizedPlan.canonicalized ==
           literal.queryExecution.optimizedPlan.canonicalized)
  }

  test("a SQL scalar UDF inlines: no invocation survives in the plan of the " +
       "hand-written formula") {
    Tables(spark, sfDir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION spec_disc(
        |  p DECIMAL(18,2), d DECIMAL(18,2)) RETURNS DECIMAL(38,4)
        |RETURN p * (1 - d)""".stripMargin)
    val viaUdf = spark.sql(
      """SELECT sum(spec_disc(CAST(l_extendedprice AS DECIMAL(18,2)),
        |  CAST(l_discount AS DECIMAL(18,2)))) AS s FROM lineitem"""
        .stripMargin)
    val inlined = spark.sql(
      """SELECT sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |  * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)))
        |  AS s FROM lineitem""".stripMargin)
    // inlined = the optimized tree is pure arithmetic: no function
    // invocation node survives (the exact tree differs from the
    // hand-written form only in Project placement of the casts)
    val planText = viaUdf.queryExecution.optimizedPlan.toString
    assert(!planText.toLowerCase.contains("spec_disc") &&
           !planText.contains("Invoke"),
      s"UDF did not inline:\n$planText")
    assert(viaUdf.collect().toSeq == inlined.collect().toSeq)
  }

  test("a correlated SQL table function decorrelates into a join, and " +
       "the rank-form body returns per-key (not global) top rows") {
    val df = SparkEntry.queries("sql_udtf")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Join"), s"expected a decorrelated join:\n$plan")
    // per-key semantics: more than one distinct customer appears (the
    // global-LIMIT mis-decorrelation returns rows for at most 2 keys)
    val perKey = df.collect().groupBy(_.getLong(0))
    assert(perKey.size > 2, s"global limit leak: ${perKey.size} keys")
    assert(perKey.values.forall(_.length <= 2))
  }
}
