package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.sources.dsv2.{GraftCatalog, LakeLog}

/** Metadata-only schema evolution on the lake catalog: ADD COLUMN
  * widens the sidecar schema and old files back-fill null; DROP COLUMN
  * narrows it without touching bytes; unsafe changes (rename, re-add of
  * a still-present name, type changes) fail loud instead of silently
  * corrupting name-resolved reads.
  */
class LakeSchemaEvolutionSpec extends SparkSpec {

  private var n = 0
  private def withCatalog[A](f: (String, String) => A): A = {
    val root = Files.createTempDirectory("graft-evo").toString
    n += 1
    val cat = s"evocat$n"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    f(cat, root)
  }

  test("ADD COLUMN widens the table; pre-evolution files read as null, " +
       "new writes carry values, filters and DML see the new column") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.a (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO $cat.db.a SELECT id, concat('o', id) FROM range(100)")
      spark.sql(s"ALTER TABLE $cat.db.a ADD COLUMN score DOUBLE")

      val t = spark.table(s"$cat.db.a")
      assert(t.schema.fieldNames.toSeq == Seq("k", "v", "score"))
      assert(t.where(col("score").isNull).count() == 100,
        "old rows back-fill null")

      spark.sql(s"INSERT INTO $cat.db.a SELECT id, concat('n', id), " +
        "CAST(id AS DOUBLE) / 10 FROM range(100, 150)")
      assert(spark.table(s"$cat.db.a").count() == 150)
      assert(spark.table(s"$cat.db.a")
        .where(col("score") > 12.0).count() == 29, "121..149 → 29 rows")
      // DML through the evolved schema: rewrite touches old+new files
      spark.sql(s"UPDATE $cat.db.a SET score = 0.0 WHERE score IS NULL")
      assert(spark.table(s"$cat.db.a")
        .where(col("score") === 0.0).count() == 100)
      // each ALTER left an audit commit that changes no data
      val alters = LakeLog.versions(sDir(cat, "a"))
        .map(LakeLog.snapshotAt(sDir(cat, "a"), _))
        .filter(_.operation.startsWith("alter_"))
      assert(alters.size == 1 && !alters.head.dataChange &&
        alters.head.added.isEmpty)
    }
  }

  private var roots = Map.empty[String, String]
  private def sDir(cat: String, tbl: String): String =
    s"${spark.conf.get(s"spark.sql.catalog.$cat.root")}/db/$tbl"

  test("DROP COLUMN narrows the schema without rewriting data; the " +
       "dropped name cannot be re-added while files still carry it") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.d (k BIGINT, v STRING, x INT)")
      spark.sql(s"INSERT INTO $cat.db.d SELECT id, concat('v', id), " +
        "CAST(id AS INT) FROM range(50)")
      val filesBefore = LakeLog.current(s"$root/db/d").get.files

      spark.sql(s"ALTER TABLE $cat.db.d DROP COLUMN x")
      assert(spark.table(s"$cat.db.d").schema.fieldNames.toSeq ==
        Seq("k", "v"))
      assert(spark.table(s"$cat.db.d").count() == 50)
      assert(LakeLog.current(s"$root/db/d").get.files == filesBefore,
        "drop is metadata-only — no file changed hands")

      // the bytes are still in the files → re-add must fail loud
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.d ADD COLUMN x INT")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m => m != null && m.contains("resurrect")),
        s"wrong error: ${e.getMessage}")
      // a FRESH name is fine
      spark.sql(s"ALTER TABLE $cat.db.d ADD COLUMN y INT")
      assert(spark.table(s"$cat.db.d").schema.fieldNames.toSeq ==
        Seq("k", "v", "y"))
    }
  }

  test("unsafe ALTERs fail loud: rename, FIRST/AFTER position, " +
       "non-nullable add, type change") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.u (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO $cat.db.u SELECT id, 'a' FROM range(5)")
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.u RENAME COLUMN v TO w")
      }
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.u ADD COLUMN z INT FIRST")
      }
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.u ALTER COLUMN k TYPE INT")
      }
      // table unharmed by the rejected changes
      assert(spark.table(s"$cat.db.u").schema.fieldNames.toSeq ==
        Seq("k", "v"))
      assert(spark.table(s"$cat.db.u").count() == 5)
    }
  }
}
