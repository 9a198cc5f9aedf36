package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based equivalence for the RankLimitToTopK rewrite: over
  * random datasets (duplicate keys, duplicate order values, nulls in the
  * payload) and random k, the rewritten plan must return exactly the
  * rows the window semantics define. The ordering used is total per key
  * (value, then id) — row_number's own determinism contract, and the
  * contract under which the rewrite claims row identity.
  */
class RankRewritePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rowGen: Gen[(Int, Int, String)] = for {
    key <- Gen.choose(0, 5)
    v   <- Gen.choose(0, 8)
    pay <- Gen.oneOf("p", "q", null: String)
  } yield (key, v, pay)

  private val dataGen: Gen[List[(Int, Int, String)]] =
    Gen.listOfN(60, rowGen)

  test("rewritten row_number <= k equals the reference semantics for random data and k") {
    val prop = Prop.forAllNoShrink(dataGen, Gen.choose(1, 6)) { (data, k) =>
      val withId = data.zipWithIndex
        .map { case ((key, v, pay), id) => (key, v, pay, id.toLong) }
      val df = withId.toDF("key", "v", "pay", "id")
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
      val res = df.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select("key", "id", "rnk")
      // the rewrite must actually fire — otherwise this tests nothing
      val fired = res.queryExecution.executedPlan.toString.contains("TopKPerKey")
      val got = res.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
      val expected = withId.groupBy(_._1).toSeq.flatMap { case (key, rs) =>
        rs.sortBy(r => (-r._2, r._4)).take(k).zipWithIndex
          .map { case (r, i) => (key, r._4, i + 1) }
      }.toSet
      fired && got == expected
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(25)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }
}
