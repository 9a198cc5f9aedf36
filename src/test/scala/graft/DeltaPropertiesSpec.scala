package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.SnapshotDelta
import graft.operators.SnapshotDelta.{Legacy, NullSafe}

/** Property-based invariants of the delta decomposition (SURVEY §5.3),
  * driven by raw scalacheck (the scalatest bridge isn't in the offline
  * dependency cache).
  */
class DeltaPropertiesSpec extends SparkSpec {
  import spark.implicits._

  // a snapshot: key -> (a, b), values possibly null
  private val valueGen: Gen[String] =
    Gen.oneOf(Gen.const(null: String), Gen.oneOf("x", "y", "z"))
  private val snapshotGen: Gen[Map[Int, (String, String)]] = for {
    keys <- Gen.someOf(0 until 12)
    vals <- Gen.listOfN(keys.size, Gen.zip(valueGen, valueGen))
  } yield keys.zip(vals).toMap

  private def toDF(m: Map[Int, (String, String)]): DataFrame =
    m.toSeq.map { case (k, (a, b)) => (k, a, b) }.toDF("pid", "a", "b")

  test("updated/added are disjoint; legacy ⊆ nullsafe; added/removed " +
       "match key-set differences; nullsafe = differing-tuple keys") {
    // forAllNoShrink: scalacheck's String shrinker NPEs on null values
    // (wrapString(null)), which would REPLACE a real counterexample with
    // an opaque PropException — this property caught a genuine
    // null-position hash collision in the NullSafe fast path that way
    val prop = Prop.forAllNoShrink(snapshotGen, snapshotGen) { (prevM, newM) =>
      val prev = toDF(prevM)
      val newer = toDF(newM)
      val attrs = Seq("a", "b")
      def pids(df: DataFrame): Set[Int] =
        df.select("pid").as[Int].collect().toSet
      val legacy   = pids(SnapshotDelta.updated(newer, prev, "pid", attrs, Legacy))
      val nullsafe = pids(SnapshotDelta.updated(newer, prev, "pid", attrs, NullSafe))
      val added    = pids(SnapshotDelta.added(newer, prev, "pid"))
      val removed  = pids(SnapshotDelta.removed(newer, prev, "pid"))
      val expectNullSafe = (newM.keySet intersect prevM.keySet)
        .filter(k => newM(k) != prevM(k))

      (legacy intersect added).isEmpty &&
        (nullsafe intersect added).isEmpty &&
        legacy.subsetOf(nullsafe) &&
        added == (newM.keySet diff prevM.keySet) &&
        removed == (prevM.keySet diff newM.keySet) &&
        nullsafe == expectNullSafe
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(20)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }
}
