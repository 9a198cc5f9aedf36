package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based RECALL guarantee for the gram-inverted-index fuzzy
  * join (join_fuzzy_gram's shape): for ANY ≤2-edit corruption
  * (substitution / insertion / deletion, anywhere, including stacked
  * edits) of a 12-char name, the 4-gram candidate join must surface
  * every pair brute-force Levenshtein ≤ 2 finds — the inverted index
  * narrows candidates, never loses matches.
  *
  * Why it must hold (q-gram pigeonhole): 2 edits split a 12-char string
  * into ≤ 3 intact runs covering ≥ 10 original chars, so some run has
  * length ≥ ⌈10/3⌉ = 4 — a shared 4-gram survives on both sides and the
  * value-keyed (position-free) gram join pairs them. The fixture query
  * states this argument; this spec checks it against randomly PLACED
  * and TYPED edits rather than the fixture's fixed 'zz' overlay.
  */
class FuzzyJoinPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val hex = "0123456789abcdef".toCharArray

  private val nameGen: Gen[String] =
    Gen.listOfN(12, Gen.oneOf(hex.toIndexedSeq)).map(_.mkString)

  /** One random edit: substitution with a non-hex char (guaranteed to
    * change the string), insertion, or deletion.
    */
  private def editGen(s: String): Gen[String] = for {
    kind <- Gen.choose(0, 2)
    pos  <- Gen.choose(0, math.max(0, s.length - 1))
    c    <- Gen.oneOf("XYZW!".toIndexedSeq)
  } yield kind match {
    case 0 => s.updated(pos, c)
    case 1 => s.substring(0, pos) + c + s.substring(pos)
    case 2 if s.length > 1 => s.substring(0, pos) + s.substring(pos + 1)
    case _ => s
  }

  private def corruptGen(s: String): Gen[String] = for {
    n     <- Gen.choose(0, 2)
    once  <- editGen(s)
    twice <- editGen(once)
  } yield n match { case 0 => s; case 1 => once; case _ => twice }

  private val corpusGen: Gen[List[(String, String)]] =
    Gen.listOfN(40, nameGen).flatMap { names =>
      Gen.sequence[List[(String, String)], (String, String)](
        names.distinct.map(n => corruptGen(n).map(c => (n, c))))
    }

  test("gram-index candidates cover every brute-force Levenshtein<=2 " +
       "pair for random <=2-edit corruptions") {
    val prop = Prop.forAllNoShrink(corpusGen) { corpus =>
      val clean = corpus.map(_._1).distinct.zipWithIndex
        .map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
      val dirty = corpus.map(_._2).distinct.zipWithIndex
        .map { case (n, i) => (i.toLong, n) }.toDF("did", "dname")
      def grams(col0: String) = expr(
        s"explode(transform(sequence(1, greatest(length($col0) - 3, 1))," +
          s" i -> substring($col0, i, 4)))")
      val dg = dirty.select(col("did"), col("dname"), grams("dname").as("g"))
        .distinct()
      val cg = clean.select(col("id"), col("name"), grams("name").as("g"))
        .distinct()
      val viaIndex = dg.join(cg, Seq("g"))
        .select("did", "dname", "id", "name").distinct()
        .where(levenshtein(col("dname"), col("name")) <= 2)
        .select("did", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = dirty.crossJoin(clean)
        .where(levenshtein(col("dname"), col("name")) <= 2)
        .select("did", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // recall is the property; precision is definitional (candidates
      // are lev-verified), so sets must be EQUAL
      viaIndex == brute && brute.nonEmpty
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(15)
      .withInitialSeed(org.scalacheck.rng.Seed(11L))
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }
}
