package graft

import graft.sources.BucketedTables

/** Plan-shape evidence for the bucketed fact-fact join: with broadcast
  * ruled out (as it would be at real fact sizes), the join must be a
  * sort-merge with NO shuffle exchange and NO per-query sort — the
  * bucketed+sorted layout already provides both.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero Exchange and zero Sort") {
    val (ot, lt) = BucketedTables.ensure(spark, sfDir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevOrd = spark.conf.get(
      "spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE off so the final plan is inspectable deterministically
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // trust sortBy file order (valid because BucketedTables writes
      // exactly one file per bucket); off by default since SPARK-28632
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val li = spark.table(lt)
      val o = spark.table(ot)
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(li("l_extendedprice"), o("o_orderpriority"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(!plan.contains("Sort ["), // bucket files are pre-sorted
        s"bucketed join must not re-sort:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", prevOrd)
    }
  }

  test("bucketed snapshot delta: zero Exchange, zero Sort, same rows as " +
       "the partition-pruned delta") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevOrd = spark.conf.get(
      "spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val bucketed = graft.queries.DeltaQueries
        .queries("delta_updated_bucketed")(spark, sfDir)
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed delta must not shuffle:\n$plan")
      assert(!plan.contains("Sort ["),
        s"bucketed delta must not re-sort:\n$plan")
      val lake = graft.queries.DeltaQueries
        .queries("delta_updated")(spark, sfDir)
      assert(bucketed.exceptAll(lake).isEmpty && lake.exceptAll(bucketed).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", prevOrd)
    }
  }

  test("bucketed WIDE delta (34 cols, null-safe): zero Exchange, zero Sort, " +
       "same rows as the partition-pruned wide delta") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevOrd = spark.conf.get(
      "spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val bucketed = graft.queries.DeltaQueries
        .queries("delta_updated_wide_bucketed")(spark, sfDir)
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed wide delta must not shuffle:\n$plan")
      assert(!plan.contains("Sort ["),
        s"bucketed wide delta must not re-sort:\n$plan")
      val lake = graft.queries.DeltaQueries
        .queries("delta_updated_wide_nullsafe")(spark, sfDir)
      assert(bucketed.exceptAll(lake).isEmpty && lake.exceptAll(bucketed).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", prevOrd)
    }
  }
}
