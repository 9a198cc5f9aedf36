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

  /** tail: exactly one of none / ordered top-N / plain limit /
    * offset+limit — covering pushTopN, pushLimit, and pushOffset.
    */
  private sealed trait Tail
  private case object NoTail extends Tail
  private case class TopN(asc: Boolean, n: Int) extends Tail
  private case class PlainLimit(n: Int) extends Tail
  private case class OffsetLimit(m: Int, n: Int) extends Tail

  private case class Ops(end: Int, ge: Option[Int], gt: Option[Int],
                         lt: Option[Int], le: Option[Int],
                         eq: Option[Int], tail: Tail)

  private val tailGen: Gen[Tail] = Gen.oneOf(
    Gen.const(NoTail),
    Gen.zip(Gen.oneOf(true, false), Gen.choose(0, 50))
      .map { case (a, n) => TopN(a, n) },
    Gen.choose(0, 50).map(PlainLimit(_)),
    Gen.zip(Gen.choose(0, 60), Gen.choose(0, 50))
      .map { case (m, n) => OffsetLimit(m, n) })

  private val opsGen: Gen[Ops] = for {
    end <- Gen.choose(0, 400)
    ge  <- Gen.option(Gen.choose(-10, 410))
    gt  <- Gen.option(Gen.choose(-10, 410))
    lt  <- Gen.option(Gen.choose(-10, 410))
    le  <- Gen.option(Gen.choose(-10, 410))
    eq  <- Gen.option(Gen.choose(-5, 405))
    tail <- tailGen
  } yield Ops(end, ge, gt, lt, le, eq, tail)

  test("pushed filter + top-N narrowing matches a brute-force reference " +
       "for random op sequences") {
    val prop = Prop.forAllNoShrink(opsGen) { ops =>
      var df = spark.read.format("graft.sources.dsv2.RangeSource")
        .option("end", ops.end.toString).option("slices", "7")
        .load()
      ops.ge.foreach(v => df = df.where(col("id") >= v))
      ops.gt.foreach(v => df = df.where(col("id") > v))
      ops.lt.foreach(v => df = df.where(col("id") < v))
      ops.le.foreach(v => df = df.where(col("id") <= v))
      ops.eq.foreach(v => df = df.where(col("id") === v))
      df = ops.tail match {
        case NoTail => df
        case TopN(asc, n) =>
          df.orderBy(if (asc) col("id").asc else col("id").desc).limit(n)
        // limit/offset without a sort: the source emits ascending ids
        // and CollectLimit drains partitions in order, so "first n"
        // and "skip m" are the first/after-m positions by id — the
        // same interval arithmetic the pushed path computes
        case PlainLimit(n)     => df.limit(n)
        case OffsetLimit(m, n) => df.offset(m).limit(n)
      }
      val got = df.select("id", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      var ref: Seq[Long] = (0L until ops.end.toLong).toVector
      ops.ge.foreach(v => ref = ref.filter(_ >= v))
      ops.gt.foreach(v => ref = ref.filter(_ > v))
      ops.lt.foreach(v => ref = ref.filter(_ < v))
      ops.le.foreach(v => ref = ref.filter(_ <= v))
      ops.eq.foreach(v => ref = ref.filter(_ == v))
      val refIds = ops.tail match {
        case NoTail            => ref
        case TopN(true, n)     => ref.sorted.take(n)
        case TopN(false, n)    => ref.sorted.reverse.take(n)
        case PlainLimit(n)     => ref.sorted.take(n)
        case OffsetLimit(m, n) => ref.sorted.drop(m).take(n)
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
