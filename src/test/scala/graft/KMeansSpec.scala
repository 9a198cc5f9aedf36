package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the literal-centroid assignment operator — four
  * declared queries (k-means, centroid assignment, PQ encode, PQ
  * rerank) ride on this codegen path, so the argmin/argmax semantics
  * and tie-breaks are pinned against a driver-side reference
  * implementation with the same sequential fold order.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def l2sqRef(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      acc + (x - y) * (x - y) }

  private def dotRef(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def randVecs(seed: Long, n: Int, dim: Int): Seq[Seq[Double]] = {
    val r = rng(seed)
    Seq.fill(n)(Seq.fill(dim)(math.rint(r.nextGaussian() * 1e6) / 1e6))
  }

  test("assignL2 matches the driver-side argmin with (distance, id) " +
       "tie-break on random data, including exact-tie vectors") {
    val dim = 8
    val vecs = randVecs(1, 60, dim)
    val cents = randVecs(2, 5, dim).zipWithIndex
      .map { case (c, i) => (i.toLong, c) }
    // inject exact ties: vectors AT two centroids (d=0 for one) and the
    // midpoint of centroids 0 and 1 (equidistant — id tie-break decides)
    val mid = cents(0)._2.zip(cents(1)._2).map { case (a, b) => (a + b) / 2 }
    val all = (vecs :+ cents(3)._2 :+ mid).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = all.toDF("vec_id", "e")
    val out = graft.operators.KMeans.assignL2(df, cents)
      .select("vec_id", "cl", "d").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    all.foreach { case (id, v) =>
      val scored = cents.map { case (ci, c) => (l2sqRef(v, c), ci) }
      val best = scored.minBy(identity) // (d, id) lexicographic = tie-break
      assert(out(id) == ((best._2, best._1)),
        s"vec $id: got ${out(id)}, want ${(best._2, best._1)}")
    }
  }

  test("assignCosineMax matches the driver-side round-6 argmax with " +
       "key tie-break") {
    val dim = 8
    val vecs = randVecs(3, 60, dim).filter(_.exists(_ != 0.0))
    val cents: Seq[(Any, Seq[Double])] = randVecs(4, 5, dim).zipWithIndex
      .map { case (c, i) => (s"c$i": Any, c) }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "e")
    val out = graft.operators.KMeans.assignCosineMax(df, cents)
      .select(col("vec_id"), col("assigned").cast("string"), col("cos6"))
      .as[(Long, String, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val vn = math.sqrt(dotRef(v, v))
      val scored = cents.map { case (k, c) =>
        val cn = math.sqrt(dotRef(c, c))
        val cos6 = BigDecimal(dotRef(v, c) / (vn * cn))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (-cos6, k.toString)
      }
      val best = scored.minBy(identity)
      assert(out(i.toLong) == ((best._2, -best._1)),
        s"vec $i: got ${out(i.toLong)}, want ${(best._2, -best._1)}")
    }
  }

  test("collectCentroids means are aggregation-order independent: " +
       "repartitioned input yields identical round-6 centroids") {
    val vecs = randVecs(5, 200, 6).zipWithIndex
      .map { case (v, i) => (i.toLong % 3, v) }
    val df = vecs.toDF("cl", "e")
    val a = graft.operators.KMeans.collectCentroids(df, "cl")
    val b = graft.operators.KMeans.collectCentroids(df.repartition(7), "cl")
    assert(a.map { case (k, c) => (k.toString, c) } ==
      b.map { case (k, c) => (k.toString, c) })
  }
}
