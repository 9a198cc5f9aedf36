package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property check for [[graft.operators.IncrementalAgg]]: over RANDOM
  * keyed snapshot pairs (adds, removes, value changes, group moves,
  * null groups), maintaining prev's aggregate by the delta must equal
  * aggregating newest directly — exactly, group for group. The declared
  * `delta_incr_agg` hash-proves this on the fixture; this spec proves
  * the algebra on inputs the fixture never produces.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def mkSnap(rows: Seq[(Long, String, Double)]): DataFrame =
    rows.toDF("k", "g", "raw")
      .select(col("k"), col("g"), col("raw").cast("decimal(18,2)").as("v"))

  test("maintain(prev, newest) equals direct aggregation of newest on " +
       "randomized snapshot pairs") {
    val groups = Array("A", "B", "C", null)
    (1 to 8).foreach { seed =>
      val r = new scala.util.Random(seed)
      def snap(): Seq[(Long, String, Double)] =
        (0L until 120L).flatMap { k =>
          if (r.nextDouble() < 0.25) None // absent key
          else Some((k, groups(r.nextInt(groups.length)),
            math.rint(r.nextDouble() * 10000) / 100.0))
        }
      val prev = mkSnap(snap())
      val newest = mkSnap(snap())
      val inc = graft.operators.IncrementalAgg
        .maintain(prev, newest, "k", "g", "v")
        .select(col("g"), col("n"), col("total").cast("decimal(28,2)"))
        .as[(Option[String], Long, BigDecimal)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      val direct = newest.groupBy("g")
        .agg(count(lit(1)).as("n"), sum("v").as("total"))
        .select(col("g"), col("n"), col("total").cast("decimal(28,2)"))
        .as[(Option[String], Long, BigDecimal)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      assert(inc == direct, s"seed $seed: incremental != direct")
    }
  }
}
