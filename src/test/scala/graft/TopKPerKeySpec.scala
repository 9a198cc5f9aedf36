package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

/** The custom whole-operator extension: results must equal the window
  * row_number formulation exactly, the physical plan must contain the
  * native exec (strategy injected), and ranks must be dense 1..k per
  * key with deterministic tie-breaks.
  */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("a", 1L, 0.9), ("a", 2L, 0.8), ("a", 3L, 0.95), ("a", 4L, 0.8),
    ("b", 5L, 0.1), ("b", 6L, 0.7),
    ("c", 7L, 0.5)
  ).toDF("k", "id", "score")

  test("native topK equals the window formulation and plans TopKPerKeyExec") {
    val spec = Seq(("score", true), ("id", false))
    val native = TopKPerKey.topK(df, "k", spec, 2)
    val planStr = native.queryExecution.executedPlan.toString
    assert(planStr.contains("TopKPerKey"), "strategy must plan the native exec")
    assert(!planStr.contains("!TopKPerKey"), s"plan must be valid:\n$planStr")
    assert(!planStr.contains("Window"), "no window fallback expected")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 2)

    val n = native.orderBy("k", "rank")
      .as[(String, Long, Double, Long)].collect().toSeq
    val e = viaWindow.orderBy("k", "rank")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(n == e)
    // ties: ("a",2,0.8) beats ("a",4,0.8) on id — but both lose to 0.9
    assert(n.filter(_._1 == "a").map(_._2) == Seq(3L, 1L))
  }

  test("stress: 1e6 distinct keys stream through one bounded heap " +
       "(sorted-group exec), with SQLMetrics populated") {
    // AQE off for this test only, so the exec is reachable by plain tree
    // walk and its metrics can be read back after execution
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.range(2000000L)
        .select((col("id") % 1000000L).as("k"), col("id").as("v"))
      val out = TopKPerKey.topK(df, "k", Seq(("v", true)), 1)
      val plan = out.queryExecution.executedPlan
      // the key-grouping sort (spillable SortExec) must be planned below
      assert(plan.toString.contains("Sort"),
        s"expected a key-group sort under the exec:\n$plan")
      assert(plan.execute().count() == 1000000L)
      val exec = plan.collectFirst {
        case e: graft.plans.TopKPerKeyExec => e }.get
      assert(exec.metrics("numInputRows").value == 2000000L)
      assert(exec.metrics("numKeys").value == 1000000L)
      assert(exec.metrics("numOutputRows").value == 1000000L)
      // spot check: key 7 keeps max(v) = 1000007 at rank 1
      val r7 = TopKPerKey.topK(df, "k", Seq(("v", true)), 1)
        .where(col("k") === 7L).select("v", "rank")
        .as[(Long, Long)].collect().toSeq
      assert(r7 == Seq((1000007L, 1L)))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("query-family consumers plan the native exec (no silent window " +
       "fallback): weighted mixing and keep-best dedup") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("cur_mix_weighted", "doc_dedup_keep_best",
                    "cur_domain_cap", "text_bm25")) {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val hasExec = df.queryExecution.executedPlan.collectFirst {
          case e: graft.plans.TopKPerKeyExec => e }.isDefined
        assert(hasExec, s"$q did not plan TopKPerKeyExec:\n" +
          df.queryExecution.executedPlan)
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("k larger than group size yields the whole group, ranked") {
    val out = TopKPerKey.topK(df, "k", Seq(("score", true), ("id", false)), 10)
      .orderBy("k", "rank")
      .select("k", "id", "rank").as[(String, Long, Long)].collect().toSeq
    assert(out.count(_._1 == "a") == 4)
    assert(out.filter(_._1 == "c") == Seq(("c", 7L, 1L)))
  }
}
