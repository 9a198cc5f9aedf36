package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

/** Property-based check of the DSv2 range source's pushdown arithmetic —
  * the seam where four independent narrowings (ge/gt/le/lt/eq filters,
  * then an optional ordered limit) compose on the same [lo, hi) bounds.
  * Each random op sequence is executed through the REAL scan (filters
  * and top-N pushed, columns pruned by whatever the plan needs) and
  * compared against a brute-force reference computed in plain Scala
  * from the same ops — any off-by-one in a bound, a wrong direction in
  * the top-N narrowing, or a bad filter/limit interaction shows up as a
  * row-set mismatch.
  */
class Dsv2PushdownPropertiesSpec extends SparkSpec {

  private case class Ops(end: Int, ge: Option[Int], lt: Option[Int],
                         eq: Option[Int], topN: Option[(Boolean, Int)])

  private val opsGen: Gen[Ops] = for {
    end <- Gen.choose(0, 400)
    ge  <- Gen.option(Gen.choose(-10, 410))
    lt  <- Gen.option(Gen.choose(-10, 410))
    eq  <- Gen.option(Gen.choose(-5, 405))
    topN <- Gen.option(Gen.zip(Gen.oneOf(true, false), Gen.choose(0, 50)))
  } yield Ops(end, ge, lt, eq, topN)

  test("pushed filter + top-N narrowing matches a brute-force reference " +
       "for random op sequences") {
    val prop = Prop.forAllNoShrink(opsGen) { ops =>
      var df = spark.read.format("graft.sources.dsv2.RangeSource")
        .option("end", ops.end.toString).option("slices", "7")
        .load()
      ops.ge.foreach(v => df = df.where(col("id") >= v))
      ops.lt.foreach(v => df = df.where(col("id") < v))
      ops.eq.foreach(v => df = df.where(col("id") === v))
      ops.topN.foreach { case (asc, n) =>
        df = df.orderBy(if (asc) col("id").asc else col("id").desc).limit(n)
      }
      val got = df.select("id", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      var ref: Seq[Long] = (0L until ops.end.toLong).toVector
      ops.ge.foreach(v => ref = ref.filter(_ >= v))
      ops.lt.foreach(v => ref = ref.filter(_ < v))
      ops.eq.foreach(v => ref = ref.filter(_ == v))
      val refIds = ops.topN match {
        case Some((true, n))  => ref.sorted.take(n)
        case Some((false, n)) => ref.sorted.reverse.take(n)
        case None             => ref
      }
      val expect = refIds.map(id => (id, graft.sources.dsv2.RangeSource.vOf(id))).toSet
      if (got != expect)
        println(s"MISMATCH for $ops: got=${got.toList.sorted.take(10)}... " +
          s"expect=${expect.toList.sorted.take(10)}...")
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }
}
