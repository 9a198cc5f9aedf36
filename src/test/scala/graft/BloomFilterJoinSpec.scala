package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (SURVEY §2.2 scale note). The third
  * runtime guard next to AQE skew (AqeSkewJoinSpec) and dynamic partition
  * pruning (DppSpec): when one side of a shuffle equi-join carries a
  * selective filter, Catalyst's InjectRuntimeFilter builds a bloom filter
  * over that side's join keys and applies `might_contain` on the OTHER
  * side *before* its shuffle — at 100 TB the probe side drops most rows
  * pre-exchange instead of shuffling them to be discarded by the join.
  */
class BloomFilterJoinSpec extends SparkSpec {

  test("selective dim filter injects a bloom runtime filter on the fact side") {
    val s = spark
    val conf = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // harness-scale thresholds: the fixture sides are KBs, not the
      // 10MB/10GB production defaults — the injection RULE is under test
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // a broadcast join would apply the dim directly; force the shuffle
      // path the rule targets
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.keys.map(k => k -> s.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val orders = Tables(s, sfDir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_totalprice"))
      val lineitem = Tables(s, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val res = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
      val plan = res.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom runtime filter (might_contain) in:\n$plan")
      val Array(row) = res.collect()
      assert(row.getLong(1) > 0, "joined row count must be positive")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
