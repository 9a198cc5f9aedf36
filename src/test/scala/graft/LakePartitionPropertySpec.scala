package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.dsv2.LakePartitioning
import graft.sources.dsv2.LakePartitioning._

/** Property soundness of the hidden-partitioning planner against a
  * brute-force reference evaluator:
  *
  *   - PRUNE soundness: a file the tuple pruner drops contains NO row
  *     satisfying the pushed conjunction (a false drop is silent data
  *     loss — the one property that must never break);
  *   - OVERWRITE coverage exactness: files in the replace set have ALL
  *     rows matching, files kept have NO row matching (a split file
  *     must have produced Left, never a wrong Right);
  *   - DPP membership soundness: a file dropped by the runtime IN-set
  *     check contains none of the probed values.
  *
  * Rows are generated adversarially around transform boundaries:
  * negative ints (floorDiv/floorMod territory), month/year edges,
  * nulls, and literals sitting exactly ON partition floors/ceilings.
  */
class LakePartitionPropertySpec extends AnyFunSuite {

  private val col = "c"

  // one source-typed scenario: a transform, a value generator, and the
  // reference ordering on raw values
  private case class Scenario(t: PTransform, srcType: DataType,
                              gen: Gen[Any])

  private val epochDay0 = java.time.LocalDate.of(1970, 1, 1)

  private def dateGen: Gen[Any] = Gen.chooseNum(-800, 20500)
    .map(d => Int.box(d)) // internal epoch days, spans pre-1970
  private def tsGen: Gen[Any] = Gen.frequency( // internal micros
    3 -> Gen.chooseNum(-70000000000000L, 1700000000000000L),
    // boundary-aligned instants: exact hour / day floors, where the
    // floor/ceiling rules earn their keep
    1 -> Gen.chooseNum(-20000L, 470000L).map(h =>
      Long.box(h * 3600000000L)),
    1 -> Gen.chooseNum(-800L, 19500L).map(d =>
      Long.box(d * 86400000000L)))
  private def intGen: Gen[Any] = Gen.chooseNum(-500, 500).map(Int.box(_))
  private def longGen: Gen[Any] =
    Gen.chooseNum(-500L, 500L).map(Long.box(_))
  private def strGen: Gen[Any] = for {
    len <- Gen.chooseNum(0, 6)
    s <- Gen.stringOfN(len, Gen.oneOf('a', 'b', 'c'))
  } yield UTF8String.fromString(s)

  private val scenarios: Gen[Scenario] = Gen.oneOf(
    Gen.const(Scenario(PIdentity(col), LongType, longGen)),
    Gen.const(Scenario(PIdentity(col), StringType, strGen)),
    Gen.chooseNum(1, 8).map(n =>
      Scenario(PBucket(n, col), LongType, longGen)),
    Gen.chooseNum(1, 8).map(n =>
      Scenario(PBucket(n, col), StringType, strGen)),
    Gen.chooseNum(1, 9).map(w =>
      Scenario(PTruncate(w, col), IntegerType, intGen)),
    Gen.chooseNum(1, 9).map(w =>
      Scenario(PTruncate(w, col), LongType, longGen)),
    Gen.chooseNum(1, 4).map(w =>
      Scenario(PTruncate(w, col), StringType, strGen)),
    Gen.const(Scenario(PDays(col), DateType, dateGen)),
    Gen.const(Scenario(PMonths(col), DateType, dateGen)),
    Gen.const(Scenario(PYears(col), DateType, dateGen)),
    Gen.const(Scenario(PDays(col), TimestampType, tsGen)),
    Gen.const(Scenario(PMonths(col), TimestampType, tsGen)),
    Gen.const(Scenario(PYears(col), TimestampType, tsGen)),
    Gen.const(Scenario(PHours(col), TimestampType, tsGen)),
    Gen.chooseNum(1, 8).map(n =>
      Scenario(PBucket(n, col), TimestampType, tsGen)))

  /** Reference: does `v` (internal, nullable) satisfy filter `f`?
    * Filter literals are in their EXTERNAL pushed form and lift here.
    */
  private def rowMatches(f: Filter, v: Any): Boolean = {
    def lift(b: Any): Any = b match {
      case s: String => UTF8String.fromString(s)
      case d: java.sql.Date => Int.box(java.time.temporal.ChronoUnit.DAYS
        .between(epochDay0, d.toLocalDate).toInt)
      case t: java.sql.Timestamp =>
        Long.box(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
      case other => other
    }
    def cmp(a: Any, b0: Any): Int = (a, lift(b0)) match {
      case (x: Int, y: Int)   => Integer.compare(x, y)
      case (x: Long, y: Long) => java.lang.Long.compare(x, y)
      case (x: UTF8String, y: UTF8String) => x.compareTo(y)
      case (x, y) => throw new IllegalStateException(s"$x vs $y")
    }
    def litOf(f0: Filter): Any = f0 match {
      case EqualTo(_, l)            => l
      case EqualNullSafe(_, l)      => l
      case GreaterThan(_, l)        => l
      case GreaterThanOrEqual(_, l) => l
      case LessThan(_, l)           => l
      case LessThanOrEqual(_, l)    => l
      case _                        => null
    }
    f match {
      case EqualNullSafe(_, null) => v == null
      case IsNull(_)    => v == null
      case IsNotNull(_) => v != null
      case In(_, vs) => v != null &&
        vs.filter(_ != null).exists(l => cmp(v, l) == 0)
      case _ if v == null || litOf(f) == null => false
      case EqualTo(_, l)            => cmp(v, l) == 0
      case EqualNullSafe(_, l)      => cmp(v, l) == 0
      case GreaterThan(_, l)        => cmp(v, l) > 0
      case GreaterThanOrEqual(_, l) => cmp(v, l) >= 0
      case LessThan(_, l)           => cmp(v, l) < 0
      case LessThanOrEqual(_, l)    => cmp(v, l) <= 0
      case _                        => true
    }
  }

  /** Externalize an internal value the way pushed filters carry it. */
  private def external(v: Any, t: DataType): Any = (v, t) match {
    case (u: UTF8String, _) => u.toString
    case (d: Int, DateType) =>
      java.sql.Date.valueOf(epochDay0.plusDays(d.toLong))
    case (us: Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      ts
    case (other, _) => other
  }
  /** ...and the internal form rowMatches compares against. */
  private def internal(v: Any): Any = v

  private def filterGen(sc: Scenario): Gen[(Filter, Any)] = {
    val cmpGen = for {
      lit <- Gen.frequency(9 -> sc.gen, 1 -> Gen.const(null: Any))
      mk <- Gen.oneOf[(String, Any) => Filter](
        EqualTo(_, _), EqualNullSafe(_, _), GreaterThan(_, _),
        GreaterThanOrEqual(_, _), LessThan(_, _), LessThanOrEqual(_, _))
    } yield (mk(col, external(lit, sc.srcType)), internal(lit))
    val inGen = for {
      n <- Gen.chooseNum(0, 4)
      lits <- Gen.listOfN(n, Gen.frequency(
        9 -> sc.gen, 1 -> Gen.const(null: Any)))
    } yield (In(col, lits.map(external(_, sc.srcType)).toArray),
      lits.find(_ != null).orNull)
    val nullGen = Gen.oneOf(
      (IsNull(col): Filter, null: Any),
      (IsNotNull(col): Filter, null: Any))
    Gen.frequency(6 -> cmpGen, 2 -> inGen, 2 -> nullGen)
  }

  test("tuple pruning never drops a file containing a matching row; " +
       "overwrite coverage is exact on both sides; DPP membership " +
       "never drops a file holding a probed value") {
    val trial = for {
      sc <- scenarios
      values <- Gen.listOfN(24,
        Gen.frequency(9 -> sc.gen, 1 -> Gen.const(null: Any)))
      filters0 <- Gen.listOfN(2, filterGen(sc))
    } yield (sc, values, filters0)
    val prop = Prop.forAllNoShrink(trial) { case (sc, values, filters0) =>
      val schema = StructType(Seq(StructField(col, sc.srcType)))
      val bound = LakePartitioning.bind(Seq(sc.t), schema)
      val specs = IndexedSeq(bound)
      locally {
        // group generated rows into "files" by tuple, like the writer
        val files: Map[String, Seq[Any]] = values
          .groupBy(v => encodeSlot(bound.head.eval(v)))
          .map { case (slot, vs) => s"f-$slot.parquet" -> (vs: Seq[Any]) }
        val parts: Map[String, Seq[String]] = files.keys
          .map(f => f -> versionedTuple(0,
            Seq(f.stripPrefix("f-").stripSuffix(".parquet"))))
          .toMap
        val paths = files.keys.toSeq.sorted.map(new Path("/t", _))
        val filters = filters0.map(_._1).toArray

        // --- prune soundness: dropped => conjunction matches no row
        val (kept, _) = LakePartitioning.prune(paths, parts, specs,
          filters)
        val keptNames = kept.map(_.getName).toSet
        files.foreach { case (f, rows) =>
          if (!keptNames.contains(f)) {
            val survivor = rows.find(v =>
              filters.forall(rowMatches(_, v)))
            assert(survivor.isEmpty,
              s"${sc.t.show}: pruned file $f holds matching row " +
                s"$survivor under ${filters.mkString(" AND ")}")
          }
        }

        // --- overwrite coverage exactness (Left = undecidable is fine)
        LakePartitioning.overwriteCoverage(files.keys.toSeq.sorted,
          parts, specs, filters) match {
          case Right(removed) =>
            val rm = removed.toSet
            files.foreach { case (f, rows) =>
              if (rm.contains(f))
                rows.foreach(v => assert(
                  filters.forall(rowMatches(_, v)),
                  s"${sc.t.show}: overwrite removed $f but row $v " +
                    s"fails ${filters.mkString(" AND ")}"))
              else
                rows.foreach(v => assert(
                  !filters.forall(rowMatches(_, v)),
                  s"${sc.t.show}: overwrite kept $f but row $v " +
                    s"matches ${filters.mkString(" AND ")}"))
            }
          case Left(_) => () // fail-loud path: always sound
        }

        // --- DPP membership soundness
        val probes = filters0.map(_._2)
        files.foreach { case (f, rows) =>
          val might = LakePartitioning.tupleMightContainAny(specs,
            parts(f), col, probes)
          if (!might) {
            val hit = rows.find(v =>
              v != null && probes.exists(p => p != null && v == p))
            assert(hit.isEmpty,
              s"${sc.t.show}: DPP dropped $f holding probed value $hit")
          }
        }
        true
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("mixed evolution vintages: files written under DIFFERENT specs " +
       "each prune/cover/DPP-decide by their own layout, never the " +
       "current one's") {
    // two transforms over one source type = a two-step evolution
    def transformsFor(t: DataType): Gen[PTransform] = t match {
      case LongType => Gen.oneOf(
        Gen.const(PIdentity(col)),
        Gen.chooseNum(1, 8).map(PBucket(_, col)),
        Gen.chooseNum(1, 9).map(PTruncate(_, col)))
      case StringType => Gen.oneOf(
        Gen.const(PIdentity(col)),
        Gen.chooseNum(1, 8).map(PBucket(_, col)),
        Gen.chooseNum(1, 4).map(PTruncate(_, col)))
      case _ => Gen.oneOf(PIdentity(col), PDays(col), PMonths(col),
        PYears(col))
    }
    val trial = for {
      (srcType, vGen) <- Gen.oneOf[(DataType, Gen[Any])](
        (LongType, longGen), (StringType, strGen), (DateType, dateGen))
      t0 <- transformsFor(srcType)
      t1 <- transformsFor(srcType)
      values <- Gen.listOfN(24, Gen.zip(
        Gen.frequency(9 -> vGen, 1 -> Gen.const(null: Any)),
        Gen.oneOf(0, 1))) // value + the vintage it was written under
      filters0 <- Gen.listOfN(2, for {
        lit <- Gen.frequency(9 -> vGen, 1 -> Gen.const(null: Any))
        mk <- Gen.oneOf[(String, Any) => Filter](
          EqualTo(_, _), EqualNullSafe(_, _), GreaterThan(_, _),
          GreaterThanOrEqual(_, _), LessThan(_, _), LessThanOrEqual(_, _))
      } yield (mk(col, external(lit, srcType)), lit))
    } yield (srcType, t0, t1, values, filters0)
    val prop = Prop.forAllNoShrink(trial) {
      case (srcType, t0, t1, values, filters0) =>
        val schema = StructType(Seq(StructField(col, srcType)))
        val specs = IndexedSeq(
          LakePartitioning.bind(Seq(t0), schema),
          LakePartitioning.bind(Seq(t1), schema))
        val files: Map[String, Seq[Any]] = values
          .groupBy { case (v, vintage) =>
            (vintage, encodeSlot(specs(vintage).head.eval(v)))
          }
          .map { case ((vintage, slot), vs) =>
            s"f$vintage-$slot.parquet" -> vs.map(_._1)
          }
        val parts: Map[String, Seq[String]] = files.keys.map { f =>
          val vintage = f.charAt(1) - '0'
          f -> versionedTuple(vintage,
            Seq(f.drop(3).stripSuffix(".parquet")))
        }.toMap
        val paths = files.keys.toSeq.sorted.map(new Path("/t", _))
        val filters = filters0.map(_._1).toArray

        val (kept, _) = LakePartitioning.prune(paths, parts, specs,
          filters)
        val keptNames = kept.map(_.getName).toSet
        files.foreach { case (f, rows) =>
          if (!keptNames.contains(f))
            assert(!rows.exists(v => filters.forall(rowMatches(_, v))),
              s"mixed ${t0.show}/${t1.show}: pruned $f holds a match " +
                s"under ${filters.mkString(" AND ")}")
        }
        LakePartitioning.overwriteCoverage(files.keys.toSeq.sorted,
          parts, specs, filters) match {
          case Right(removed) =>
            val rm = removed.toSet
            files.foreach { case (f, rows) =>
              if (rm.contains(f))
                rows.foreach(v => assert(
                  filters.forall(rowMatches(_, v)),
                  s"mixed overwrite removed $f but row $v fails"))
              else
                rows.foreach(v => assert(
                  !filters.forall(rowMatches(_, v)),
                  s"mixed overwrite kept $f but row $v matches"))
            }
          case Left(_) => ()
        }
        val probes = filters0.map(_._2)
        files.foreach { case (f, rows) =>
          if (!LakePartitioning.tupleMightContainAny(specs, parts(f),
              col, probes))
            assert(!rows.exists(v => v != null &&
                probes.exists(p => p != null && v == p)),
              s"mixed DPP dropped $f holding a probed value")
        }
        true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(1500), prop)
    assert(res.passed, res.status.toString)
  }
}
