package graft

import java.nio.file.Files

import graft.sources.dsv2.{GraftCatalog, LakeLog, LakeParquet}

/** The lake connector's widened type surface (r12 verdict's gap #1):
  * BINARY payloads, BOOLEAN flags, and nested STRUCT/ARRAY/MAP columns
  * as first-class connector columns — written through the DSv2 write
  * path's Group codec, read back exactly (incl. under merge-on-read
  * deletion vectors), with BINARY stats harvested as null-count-only
  * (bounds over payload bytes prune nothing and bloat manifests).
  */
class LakeTypesSpec extends SparkSpec {

  private var n = 0
  private def withCatalog[A](f: (String, String) => A): A = {
    val root = Files.createTempDirectory("graft-types").toString
    n += 1
    val cat = s"typecat$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  test("BINARY + BOOLEAN round-trip exactly — incl. empty and null " +
       "payloads — and survive a merge-on-read DELETE with DV'd " +
       "binary rows; binary stats carry null counts but never bounds") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.b (k BIGINT, flag BOOLEAN, " +
        "payload BINARY) TBLPROPERTIES ('write.mode'='merge-on-read')")
      // payloads: deterministic per-k bytes; every 11th NULL, every
      // 13th empty — the edge shapes a media column actually has
      spark.sql(s"INSERT INTO $cat.db.b SELECT id, id % 2 = 0, " +
        "CASE WHEN id % 11 = 0 THEN CAST(NULL AS BINARY) " +
        "     WHEN id % 13 = 0 THEN CAST('' AS BINARY) " +
        "     ELSE CAST(concat('blob-', id, '-', repeat('x', " +
        "CAST(id % 7 AS INT))) AS BINARY) END FROM range(0, 1000, 1, 4)")
      def wanted(id: Long): Array[Byte] =
        if (id % 11 == 0) null
        else if (id % 13 == 0) Array.empty[Byte]
        else s"blob-$id-${"x" * (id % 7).toInt}".getBytes("UTF-8")
      val got: Map[Long, (Boolean, Array[Byte])] =
        spark.table(s"$cat.db.b").collect()
          .map(r => r.getLong(0) -> ((r.getBoolean(1),
            if (r.isNullAt(2)) null
            else r.getAs[Array[Byte]](2)))).toMap
      assert(got.size == 1000)
      (0L until 1000L).foreach { id =>
        val (flag, bytes) = got(id)
        assert(flag == (id % 2 == 0), s"flag $id")
        if (wanted(id) == null) assert(bytes == null, s"null payload $id")
        else assert(bytes != null && bytes.sameElements(wanted(id)),
          s"payload $id: ${new String(bytes, "UTF-8")}")
      }
      // binary stats: null-count-only entry, no bounds
      val head = LakeLog.current(s"$root/db/b").get
      val ps = head.stats.values.flatMap(_.cols.get("payload"))
      assert(ps.nonEmpty, "payload must have a stats entry")
      assert(ps.forall(cs => cs.kind == "bin" && cs.min.isEmpty &&
        cs.max.isEmpty && cs.nulls >= 0),
        s"binary stats must be null-count-only: $ps")
      // MOR delete: DVs mask binary rows exactly
      spark.sql(s"DELETE FROM $cat.db.b WHERE k % 5 = 2")
      val after = spark.table(s"$cat.db.b").collect()
        .map(r => r.getLong(0)).toSet
      assert(after == (0L until 1000L).filter(_ % 5 != 2).toSet)
      val survivors = spark.table(s"$cat.db.b")
        .where("k % 11 != 0").collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](2)).toMap
      survivors.foreach { case (id, bytes) =>
        assert(bytes.sameElements(wanted(id)), s"post-DV payload $id") }
      // BOOLEAN filter pushes down and stays exact
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.db.b WHERE flag").head().getLong(0) ==
        (0L until 1000L).count(id => id % 2 == 0 && id % 5 != 2))
    }
  }

  test("STRUCT / ARRAY / MAP columns round-trip through the connector " +
       "— nested nulls, empty collections, struct-in-array — and read " +
       "back exactly under DVs and time travel") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.nest (k BIGINT, " +
        "meta STRUCT<w: INT, h: INT, tag: STRING>, " +
        "xs ARRAY<DOUBLE>, " +
        "kv MAP<STRING, BIGINT>, " +
        "frames ARRAY<STRUCT<idx: INT, score: DOUBLE>>) " +
        "TBLPROPERTIES ('write.mode'='merge-on-read')")
      spark.sql(s"INSERT INTO $cat.db.nest SELECT id, " +
        // struct with a null leaf every 4th row, whole-struct null every 9th
        "CASE WHEN id % 9 = 0 THEN NULL ELSE named_struct(" +
        "  'w', CAST(id % 31 AS INT), 'h', CAST(id % 17 AS INT), " +
        "  'tag', CASE WHEN id % 4 = 0 THEN NULL " +
        "          ELSE concat('t', id % 5) END) END, " +
        // array: empty every 7th, a null element every 3rd
        "CASE WHEN id % 7 = 0 THEN array() ELSE array(" +
        "  CAST(id AS DOUBLE), " +
        "  CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id * 0.5 AS DOUBLE)" +
        "  END) END, " +
        "map(concat('a', id % 3), id, 'b', id * 2), " +
        "array(named_struct('idx', CAST(0 AS INT), " +
        "  'score', CAST(id AS DOUBLE) / 7), " +
        "  named_struct('idx', CAST(1 AS INT), " +
        "  'score', CAST(id AS DOUBLE) / 11)) " +
        "FROM range(0, 500, 1, 4)")
      val v1 = LakeLog.current(s"$root/db/nest").get.version

      // exact agreement with the same expression evaluated in-memory
      def restate = spark.sql("SELECT id AS k, " +
        "CASE WHEN id % 9 = 0 THEN NULL ELSE named_struct(" +
        "  'w', CAST(id % 31 AS INT), 'h', CAST(id % 17 AS INT), " +
        "  'tag', CASE WHEN id % 4 = 0 THEN NULL " +
        "          ELSE concat('t', id % 5) END) END AS meta, " +
        "CASE WHEN id % 7 = 0 THEN array() ELSE array(" +
        "  CAST(id AS DOUBLE), " +
        "  CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id * 0.5 AS DOUBLE)" +
        "  END) END AS xs, " +
        "map(concat('a', id % 3), id, 'b', id * 2) AS kv, " +
        "array(named_struct('idx', CAST(0 AS INT), " +
        "  'score', CAST(id AS DOUBLE) / 7), " +
        "  named_struct('idx', CAST(1 AS INT), " +
        "  'score', CAST(id AS DOUBLE) / 11)) AS frames " +
        "FROM range(0, 500)")
      def canon(df: org.apache.spark.sql.DataFrame): Array[String] =
        df.selectExpr("k", "to_json(struct(meta, xs, kv, frames)) AS j")
          .collect().map(r => s"${r.getLong(0)}|${r.getString(1)}").sorted
      assert(canon(spark.table(s"$cat.db.nest")).sameElements(
        canon(restate)), "nested round-trip drifted")

      // nested field access + lateral explode over connector data
      assert(spark.sql(s"SELECT sum(meta.w) FROM $cat.db.nest")
        .head().getLong(0) ==
        (0L until 500L).filter(_ % 9 != 0).map(_ % 31).sum)
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.nest " +
        "LATERAL VIEW explode(frames) f AS fr WHERE fr.score > 10")
        .head().getLong(0) ==
        (0L until 500L).flatMap(id =>
          Seq(id / 7.0, id / 11.0)).count(_ > 10))

      // MOR delete + time travel keep nested bytes exact
      spark.sql(s"DELETE FROM $cat.db.nest WHERE k % 6 = 1")
      assert(spark.table(s"$cat.db.nest").count() ==
        (0L until 500L).count(_ % 6 != 1))
      assert(canon(spark.sql(
        s"SELECT * FROM $cat.db.nest VERSION AS OF $v1"))
        .sameElements(canon(restate)), "time travel lost nested data")
      // nested columns harvest no bounds (no stats entry), and the
      // schema survives the round-trip as declared
      val head = LakeLog.current(s"$root/db/nest").get
      assert(head.stats.values.forall(fs =>
        !fs.cols.contains("meta") && !fs.cols.contains("xs")),
        "nested columns must not harvest bounds")
      assert(spark.table(s"$cat.db.nest").schema("frames").dataType
        .isInstanceOf[org.apache.spark.sql.types.ArrayType])
    }
  }

  test("schema + codec invariants: isFlat gates nested schemas off the " +
       "columnar fast path; parquet layouts are the standard 3-level " +
       "LIST / key_value MAP shapes any foreign reader round-trips") {
    import org.apache.spark.sql.types._
    val nested = StructType(Seq(
      StructField("k", LongType),
      StructField("s", StructType(Seq(StructField("a", IntegerType)))),
      StructField("xs", ArrayType(DoubleType)),
      StructField("m", MapType(StringType, LongType))))
    assert(!LakeParquet.isFlat(nested))
    assert(LakeParquet.isFlat(StructType(Seq(
      StructField("k", LongType), StructField("b", BinaryType),
      StructField("f", BooleanType)))))
    val msg = LakeParquet.toMessageType(nested)
    val s = msg.toString
    assert(s.contains("(LIST)") && s.contains("repeated group list") &&
      s.contains("optional double element"), s)
    assert(s.contains("(MAP)") && s.contains("repeated group key_value") &&
      s.contains("required binary key (STRING)"), s)
    // inverse conversion restores the Spark schema exactly
    assert(LakeParquet.toStructType(msg).map(f => (f.name, f.dataType))
      == nested.map(f => (f.name, f.dataType)))
    // decimal FLBA lengths: the standard minimal-byte table
    assert(LakeParquet.decimalFixedLen(18) == 8)
    assert(LakeParquet.decimalFixedLen(19) == 9)
    assert(LakeParquet.decimalFixedLen(38) == 16)
  }
}
