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

  test("k larger than group size yields the whole group, ranked") {
    val out = TopKPerKey.topK(df, "k", Seq(("score", true), ("id", false)), 10)
      .orderBy("k", "rank")
      .select("k", "id", "rank").as[(String, Long, Long)].collect().toSeq
    assert(out.count(_._1 == "a") == 4)
    assert(out.filter(_._1 == "c") == Seq(("c", 7L, 1L)))
  }
}
