package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.sources.dsv2.{GraftCatalog, LakeLog}

/** Field-id based, metadata-only schema evolution on the lake catalog:
  * ADD COLUMN widens the sidecar schema (fresh id) and old files
  * back-fill null; DROP COLUMN narrows it without touching bytes and
  * retires the id forever; RENAME keeps the id so every existing file
  * keeps resolving; drop-then-re-add of a name is SAFE against
  * id-stamped files (strict id resolution can't see the old values);
  * the remaining unsafe changes (type, position) fail loud.
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
       "dropped name re-adds SAFELY under a fresh field id") {
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

      // the bytes are still in the files, but they carry FIELD IDS:
      // re-adding the name takes a FRESH id, so strict id resolution
      // reads the re-added column as null everywhere — never the old x
      spark.sql(s"ALTER TABLE $cat.db.d ADD COLUMN x INT")
      assert(spark.table(s"$cat.db.d").schema.fieldNames.toSeq ==
        Seq("k", "v", "x"))
      assert(spark.table(s"$cat.db.d").where(col("x").isNotNull).count()
        == 0, "re-added x must NOT resurrect the dropped column's values")
      spark.sql(s"INSERT INTO $cat.db.d SELECT 999, 'new', 7")
      assert(spark.table(s"$cat.db.d").where(col("x") === 7).count() == 1,
        "new writes land in the re-added column")
      // a FRESH name is fine too
      spark.sql(s"ALTER TABLE $cat.db.d ADD COLUMN y INT")
      assert(spark.table(s"$cat.db.d").schema.fieldNames.toSeq ==
        Seq("k", "v", "x", "y"))
    }
  }

  test("RENAME COLUMN is a metadata-only evolution: the id survives, " +
       "old files read under the new name, filters prune through the " +
       "rename, and a rename round-trip is clean") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.r (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO $cat.db.r SELECT id, concat('v', id) FROM range(100)")
      val filesBefore = LakeLog.current(s"$root/db/r").get.files

      spark.sql(s"ALTER TABLE $cat.db.r RENAME COLUMN v TO label")
      assert(spark.table(s"$cat.db.r").schema.fieldNames.toSeq ==
        Seq("k", "label"))
      assert(LakeLog.current(s"$root/db/r").get.files == filesBefore,
        "rename is metadata-only — no file changed hands")
      // OLD files readable under the NEW name (id resolution)
      assert(spark.table(s"$cat.db.r")
        .where(col("label") === "v42").count() == 1)
      // pushed filters keep working (stats live under the old name in
      // old files; the planner retargets per file)
      assert(spark.table(s"$cat.db.r")
        .where(col("k") >= 90).count() == 10)
      // new writes + DML through the new name, mixed-vintage scan
      spark.sql(s"INSERT INTO $cat.db.r SELECT id, concat('w', id) FROM range(100, 120)")
      spark.sql(s"UPDATE $cat.db.r SET label = 'patched' WHERE k = 5")
      val t = spark.table(s"$cat.db.r")
      assert(t.count() == 120)
      assert(t.where(col("label") === "patched").count() == 1)
      assert(t.where(col("label") === "w110").count() == 1)
      // round-trip back to the original name
      spark.sql(s"ALTER TABLE $cat.db.r RENAME COLUMN label TO v")
      assert(spark.table(s"$cat.db.r")
        .where(col("v") === "v42").count() == 1, "round-trip resolves")
      // audit trail carries both renames as dataChange=false commits
      val renames = LakeLog.versions(s"$root/db/r")
        .map(LakeLog.snapshotAt(s"$root/db/r", _))
        .filter(_.operation.startsWith("alter_rename"))
      assert(renames.size == 2 && renames.forall(!_.dataChange))
    }
  }

  test("unsafe ALTERs fail loud: FIRST/AFTER position, non-nullable " +
       "add, type change; renaming TO a prior name of another column " +
       "is rejected (legacy ambiguity)") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.u (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO $cat.db.u SELECT id, 'a' FROM range(5)")
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.u ADD COLUMN z INT FIRST")
      }
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.u ALTER COLUMN k TYPE INT")
      }
      // v -> w leaves "v" as a prior name; renaming k to "v" (or adding
      // a new column "v") would make legacy name resolution ambiguous
      spark.sql(s"ALTER TABLE $cat.db.u RENAME COLUMN v TO w")
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.u RENAME COLUMN k TO v")
      }
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.u ADD COLUMN v INT")
      }
      // table unharmed by the rejected changes
      assert(spark.table(s"$cat.db.u").schema.fieldNames.toSeq ==
        Seq("k", "w"))
      assert(spark.table(s"$cat.db.u").count() == 5)
    }
  }

  test("type WIDENING is metadata-only: INT->BIGINT and FLOAT->DOUBLE " +
       "promote without rewrites, old vintages upcast at read, filters " +
       "spanning both vintages stay exact and never misprune, and a " +
       "rename composes with the promotion") {
    withCatalog { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.w (k INT, x FLOAT, v STRING)")
      spark.range(0, 100).selectExpr("CAST(id AS INT) AS k",
        "CAST(id AS FLOAT) / 4 AS x", "concat('o', id) AS v")
        .coalesce(1).createOrReplaceTempView("evo_w_v1")
      spark.sql(s"INSERT INTO $cat.db.w SELECT * FROM evo_w_v1")
      val filesBefore = LakeLog.current(s"$root/db/w").get.files.toSet
      spark.sql(s"ALTER TABLE $cat.db.w ALTER COLUMN k TYPE BIGINT")
      spark.sql(s"ALTER TABLE $cat.db.w ALTER COLUMN x TYPE DOUBLE")
      // zero data files changed hands — the promotion is metadata
      assert(LakeLog.current(s"$root/db/w").get.files.toSet == filesBefore)
      val t = spark.table(s"$cat.db.w")
      assert(t.schema("k").dataType ==
        org.apache.spark.sql.types.LongType)
      assert(t.schema("x").dataType ==
        org.apache.spark.sql.types.DoubleType)
      // a second vintage written under the WIDE types, beyond int range
      spark.sql(s"INSERT INTO $cat.db.w SELECT id, CAST(id AS DOUBLE), " +
        "concat('n', id) FROM range(5000000000, 5000000050)")
      // reads span both vintages: upcast old, native new
      assert(spark.table(s"$cat.db.w").count() == 150)
      assert(spark.table(s"$cat.db.w").where("k >= 50").count() == 100,
        "50..99 old + all 50 new")
      assert(spark.table(s"$cat.db.w").where("k > 4000000000").count() == 50,
        "a literal past int range must not misprune the old vintage")
      assert(spark.table(s"$cat.db.w")
        .agg(org.apache.spark.sql.functions.sum("k")).collect()
        .head.getLong(0) == (0L until 100L).sum + (5000000000L until 5000000050L).sum)
      assert(spark.table(s"$cat.db.w").where("x = 2.5").count() == 1,
        "float 10/4 upcasts to exactly 2.5 double")
      // DML across vintages through the widened schema
      spark.sql(s"DELETE FROM $cat.db.w WHERE k % 2 = 1")
      assert(spark.table(s"$cat.db.w").count() == 75)
      // rename composes: the id carries the promotion with it
      spark.sql(s"ALTER TABLE $cat.db.w RENAME COLUMN k TO key")
      assert(spark.table(s"$cat.db.w").where("key >= 50").count() == 50)
      // lossy directions still fail loud
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.w ALTER COLUMN key TYPE INT")
      }
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.w ALTER COLUMN v TYPE BIGINT")
      }
    }
  }
}
