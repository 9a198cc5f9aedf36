package graft

import java.nio.charset.StandardCharsets

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}

import graft.sources.dsv2.{LakeColumnRef, LakeStats}

/** Property-based SOUNDNESS check of manifest-stats file pruning
  * ([[LakeStats.mightMatchFile]]): whenever the pruner says a file
  * provably contains no matching row, a brute-force evaluation of the
  * filter over the file's actual values must agree — across random
  * long/string columns with nulls (including all-null), random
  * comparison filters, and unicode strings chosen to stress the
  * UTF-8-byte-order-vs-UTF-16 trap (supplementary code points order
  * differently under the two; Spark filter semantics and parquet
  * stats both use unsigned UTF-8 byte order, and the pruner must
  * match them, not java.lang.String ordering).
  *
  * The reference min/max and the brute-force comparisons are computed
  * INDEPENDENTLY in this spec (unsigned byte-array compare), so a bug
  * in the production ordering cannot hide behind itself.
  */
class LakeStatsPropertiesSpec extends SparkSpec {

  // unsigned UTF-8 byte order — the ordering Spark's UTF8String and
  // parquet Binary stats share; implemented here from scratch
  private def byteCmp(a: String, b: String): Int = {
    val (x, y) = (a.getBytes(StandardCharsets.UTF_8),
      b.getBytes(StandardCharsets.UTF_8))
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  private def bruteMatches(values: Seq[Option[Any]], f: Filter): Boolean =
    values.exists {
      case None => false // comparisons never match NULL (3VL)
      case Some(v) => f match {
        case EqualTo(_, x: Long)   => v == x
        case EqualTo(_, x: String) => byteCmp(v.asInstanceOf[String], x) == 0
        case GreaterThan(_, x: Long)   => v.asInstanceOf[Long] > x
        case GreaterThan(_, x: String) =>
          byteCmp(v.asInstanceOf[String], x) > 0
        case GreaterThanOrEqual(_, x: Long)   => v.asInstanceOf[Long] >= x
        case GreaterThanOrEqual(_, x: String) =>
          byteCmp(v.asInstanceOf[String], x) >= 0
        case LessThan(_, x: Long)   => v.asInstanceOf[Long] < x
        case LessThan(_, x: String) =>
          byteCmp(v.asInstanceOf[String], x) < 0
        case LessThanOrEqual(_, x: Long)   => v.asInstanceOf[Long] <= x
        case LessThanOrEqual(_, x: String) =>
          byteCmp(v.asInstanceOf[String], x) <= 0
        case _ => true
      }
    }

  /** Build the ColStats harvest would produce for one column, from an
    * independent reference implementation.
    */
  private def statsOf(values: Seq[Option[Any]], kind: String)
      : LakeStats.ColStats = {
    val present = values.flatten
    val (mn, mx) =
      if (present.isEmpty) (None, None)
      else kind match {
        case "long" =>
          val ls = present.map(_.asInstanceOf[Long])
          (Some(ls.min.toString), Some(ls.max.toString))
        case _ =>
          val ss = present.map(_.asInstanceOf[String])
          (Some(ss.reduce((a, b) => if (byteCmp(a, b) <= 0) a else b)),
            Some(ss.reduce((a, b) => if (byteCmp(a, b) >= 0) a else b)))
      }
    LakeStats.ColStats(kind, mn, mx, values.count(_.isEmpty).toLong, -1)
  }

  // strings mixing ASCII, Latin-1, BMP CJK, and SUPPLEMENTARY planes
  // (the UTF-16 surrogate range is where String ordering diverges)
  private val charGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumChar.map(_.toString),
    Gen.oneOf("é", "ß", "中", "文", "�"),
    Gen.oneOf("😀", "𐀀", "􏿿")) // U+10000+
  private val strGen: Gen[String] =
    Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))

  private def colGen(kind: String): Gen[Seq[Option[Any]]] = {
    val v: Gen[Any] =
      if (kind == "long") Gen.choose(-1000L, 1000L) else strGen
    Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.option(v)).map(_.toSeq))
  }

  private def filterGen(kind: String): Gen[Filter] = {
    val v: Gen[Any] =
      if (kind == "long") Gen.choose(-1100L, 1100L) else strGen
    for {
      x <- v
      mk <- Gen.oneOf[(String, Any) => Filter](
        EqualTo(_, _), GreaterThan(_, _), GreaterThanOrEqual(_, _),
        LessThan(_, _), LessThanOrEqual(_, _))
    } yield mk("c", x)
  }

  test("pruning is SOUND: mightMatchFile=false implies no row matches " +
       "(random long/string columns with nulls, unicode-heavy strings)") {
    val trial = for {
      kind <- Gen.oneOf("long", "str")
      vals <- colGen(kind)
      f    <- filterGen(kind)
    } yield (kind, vals, f)
    val ref = LakeColumnRef("c", -1, Array("c"))
    val prop = Prop.forAllNoShrink(trial) { case (kind, vals, f) =>
      val st = LakeStats.FileStats(vals.size.toLong, 1,
        Map("c" -> statsOf(vals, kind)))
      val might = LakeStats.mightMatchFile(st, Array(ref), Array(f))
      // soundness: pruned => brute force finds nothing
      might || !bruteMatches(vals, f)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(3000), prop)
    assert(res.passed, res.status.toString)
  }

  test("pruning is sound against REAL parquet harvest: random files " +
       "written through the lake, random filters, brute-force agreement " +
       "per file") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-statprop").toString
    spark.conf.set("spark.sql.catalog.spropcat",
      classOf[graft.sources.dsv2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spropcat.root", root)
    spark.sql("CREATE TABLE spropcat.db.t (k BIGINT, s STRING)")
    val rnd = new scala.util.Random(11)
    val strs = Seq("a", "zz", "é", "中文", "😀!", "ZA", "09")
    (0 until 6).foreach { i =>
      val rows = (0 until 20).map { _ =>
        (Option.when(rnd.nextInt(10) > 0)(rnd.nextLong() % 500),
          Option.when(rnd.nextInt(10) > 1)(strs(rnd.nextInt(strs.size)) +
            rnd.nextInt(100)))
      }
      import spark.implicits._
      rows.toDF("k", "s").coalesce(1)
        .createOrReplaceTempView(s"sprop_src$i")
      spark.sql(s"INSERT INTO spropcat.db.t SELECT * FROM sprop_src$i")
    }
    val dir = s"$root/db/t"
    val head = graft.sources.dsv2.LakeLog.current(dir).get
    val refs = graft.sources.dsv2.LakeTableIO
      .columnRefs(graft.sources.dsv2.LakeTableIO.tableSchema(dir))
    // per-file actual contents via the metadata columns
    val byFile: Map[String, Seq[(Option[Long], Option[String])]] =
      spark.sql("SELECT _file, k, s FROM spropcat.db.t").collect()
        .groupBy(_.getString(0))
        .view.mapValues(_.toSeq.map(r =>
          (if (r.isNullAt(1)) None else Some(r.getLong(1)),
            Option(r.getString(2))))).toMap
    var checked = 0
    (0 until 300).foreach { _ =>
      val onLong = rnd.nextBoolean()
      val col = if (onLong) "k" else "s"
      val v: Any =
        if (onLong) rnd.nextLong() % 600
        else strs(rnd.nextInt(strs.size)) + rnd.nextInt(120)
      val f: Filter = rnd.nextInt(5) match {
        case 0 => EqualTo(col, v)
        case 1 => GreaterThan(col, v)
        case 2 => GreaterThanOrEqual(col, v)
        case 3 => LessThan(col, v)
        case _ => LessThanOrEqual(col, v)
      }
      head.files.foreach { file =>
        val st = head.stats(file)
        if (!LakeStats.mightMatchFile(st, refs, Array(f))) {
          checked += 1
          val vals: Seq[Option[Any]] = byFile(file).map(t =>
            if (onLong) t._1 else t._2)
          assert(!bruteMatches(vals, f),
            s"UNSOUND prune: $f excluded $file but a row matches " +
              s"(stats ${st.cols.get(col)})")
        }
      }
    }
    assert(checked > 100, s"prune fired only $checked times — generator " +
      "too conservative to test anything")
  }
}
