package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.pipeline.{AbrSchemas, Pipeline}

/** End-to-end pipeline test (SURVEY §5.4): a staging dir of synthetic
  * `VIC<yymmdd>_ABR_Agency_Data.txt` files → full run → assert lake
  * layout, single-file delta CSV names + contents, hook execution,
  * cleanup; plus the kill-switch abort path and the not-enough-partitions
  * log-and-continue path.
  */
class PipelineSpec extends SparkSpec {

  /** A 34-column pipe-delimited Agency_Data row: pid + 33 attrs, where
    * attr values default to "v<i>" and can be overridden per column name.
    */
  private def row(pid: String, over: Map[String, String] = Map.empty): String =
    (pid +: AbrSchemas.agencyCompareAttrs.zipWithIndex.map { case (c, i) =>
      over.getOrElse(c, s"v$i")
    }).mkString("|")

  private def freshDirs(): (Path, Path) = {
    val base = Files.createTempDirectory("graft-pipe")
    val staging = Files.createDirectory(base.resolve("staging"))
    val lake = base.resolve("lake")
    (staging, lake)
  }

  private def write(dir: Path, name: String, rows: Seq[String]): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  private def dropAgencyTable(): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${Pipeline.tableName("Agency_Data")}")

  test("full run: staging files -> partitioned lake -> delta CSVs " +
       "with the reference's exact paths, names, and rows") {
    dropAgencyTable()
    val (staging, lake) = freshDirs()
    // previous week: p1 unchanged, p2 will change, p3 will be removed
    write(staging, "VIC240108_ABR_Agency_Data.txt",
      Seq(row("p1"), row("p2"), row("p3")))
    // newest week: p2 changed org_nm, p4 added
    write(staging, "VIC240115_ABR_Agency_Data.txt",
      Seq(row("p1"), row("p2", Map("org_nm" -> "CHANGED")), row("p4")))
    write(staging, "notes.txt", Seq("decoy - must be ignored"))

    val log = new Pipeline.RunLog()
    val cfg = Pipeline.Config(staging.toString, lake.toString,
      runId = Some("testrun"))
    val loaded = Pipeline.run(spark, cfg, log)

    // O5: structured log stream persisted per run
    val logFile = lake.resolve("LOGS/testrun.jsonl")
    assert(Files.exists(logFile))
    val logLines = Files.readAllLines(logFile).asScala
    assert(logLines.head.contains("\"seq\":0"))
    assert(logLines.exists(_.contains("Running Delta Query (Change)")))

    assert(loaded.map(_.importdate).sorted == Seq("2024-01-08", "2024-01-15"))
    // lake layout (reference load.go:19-21), gzip files inside
    val p1 = lake.resolve("DATA/Agency_Data/importdate=2024-01-08")
    val p2 = lake.resolve("DATA/Agency_Data/importdate=2024-01-15")
    assert(Files.isDirectory(p1) && Files.isDirectory(p2))
    assert(Files.list(p2).iterator().asScala.exists(_.toString.endsWith(".csv.gz")))

    // delta output contract (agency-delta.go:35,40; Readme.md:14-17)
    val upd = lake.resolve(
      "DELTA/UPDATED/Agency_Data/importdate=2024-01-15/Agency_Data_updated.csv")
    val add = lake.resolve(
      "DELTA/ADDED/Agency_Data/importdate=2024-01-15/Agency_Data_added.csv")
    assert(Files.exists(upd), s"missing $upd")
    assert(Files.exists(add), s"missing $add")

    val updLines = Files.readAllLines(upd).asScala
    assert(updLines.head.startsWith("pid,abn,"), "header row expected")
    assert(updLines.tail.map(_.takeWhile(_ != ',')) == Seq("p2"))
    assert(updLines.tail.head.contains("CHANGED"))

    val addLines = Files.readAllLines(add).asScala
    assert(addLines.tail.map(_.takeWhile(_ != ',')) == Seq("p4"))

    // staging cleaned up for loaded files only (reference S10)
    assert(!Files.exists(staging.resolve("VIC240115_ABR_Agency_Data.txt")))
    assert(Files.exists(staging.resolve("notes.txt")))
    dropAgencyTable()
  }

  test("two datasets in one run: Businessname flows through the same " +
       "staging -> classify -> lake -> table path via Config.schemas, " +
       "with its own (pluggable) hook and no delta") {
    dropAgencyTable()
    val (staging, lake) = freshDirs()
    write(staging, "VIC240115_ABR_Agency_Data.txt", Seq(row("p1")))
    val bnCols = graft.queries.IngestQueries.businessnameCols
    write(staging, "VIC240115_ABR_Businessname.txt",
      Seq("b1|111|ACME PTY LTD|R|10.00", "b2|222|WIDGETS CO|C|20.50"))

    var hookRan: Option[String] = None
    val cfg = Pipeline.Config(staging.toString, lake.toString,
      schemas = Map(
        "Agency_Data" -> AbrSchemas.agencyColumns,
        "Businessname" -> bnCols),
      hooks = Map("Businessname" -> Seq((_, _, ds, log) => {
        hookRan = Some(ds); log(s"hook:$ds")
      })))
    val log = new Pipeline.RunLog()
    val loaded = Pipeline.run(spark, cfg, log)

    assert(loaded.map(_.dataset).sorted == Seq("Agency_Data", "Businessname"))
    val bnPart = lake.resolve("DATA/Businessname/importdate=2024-01-15")
    assert(Files.isDirectory(bnPart))
    assert(Files.list(bnPart).iterator().asScala
      .exists(_.toString.endsWith(".csv.gz")))
    assert(hookRan.contains("Businessname"))
    assert(log.events.contains("hook:Businessname"))
    // no delta hook configured for either dataset in this run
    assert(!Files.exists(lake.resolve("DELTA")))

    // MSCK-registered table reads the rows back with the placeholder schema
    val table = "abr_weekly_businessname_spec"
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    graft.sources.LakeIngest.registerTable(
      spark, table, lake.toString, "Businessname", bnCols)
    val back = spark.table(table)
      .orderBy("pid").collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(4)))
    assert(back.toSeq == Seq(
      ("b1", "ACME PTY LTD", "10.00"), ("b2", "WIDGETS CO", "20.50")))
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    dropAgencyTable()
  }

  test("zip-driven run: archive -> extract -> lake; archive and staging " +
       "files cleaned up (extract.go:56-63, abr-etl.go:52-57)") {
    dropAgencyTable()
    val (staging, lake) = freshDirs()
    val zip = staging.getParent.resolve("VIC_ABR_Extract.zip")
    val zout = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(zip))
    zout.putNextEntry(new java.util.zip.ZipEntry("VIC240115_ABR_Agency_Data.txt"))
    zout.write(Seq(row("p1"), row("p2")).mkString("\n").getBytes("UTF-8"))
    zout.closeEntry()
    // path component must be flattened (zip-slip guard)
    zout.putNextEntry(new java.util.zip.ZipEntry("sub/dir/notes.bin"))
    zout.write("x".getBytes("UTF-8"))
    zout.closeEntry()
    zout.close()

    val cfg = Pipeline.Config(staging.toString, lake.toString,
      zipFile = Some(zip.toString))
    val loaded = Pipeline.run(spark, cfg)
    assert(loaded.map(_.importdate) == Seq("2024-01-15"))
    assert(Files.isDirectory(
      lake.resolve("DATA/Agency_Data/importdate=2024-01-15")))
    assert(!Files.exists(zip), "archive must be cleaned up")
    assert(Files.exists(staging.resolve("notes.bin")), "flattened decoy kept")
    dropAgencyTable()
  }

  test("QueryApi: sql -> single CSV named <query-id>.csv at the output " +
       "location (agency-delta.go:248-279 contract)") {
    val out = Files.createTempDirectory("graft-qapi").toString
    val path = graft.pipeline.QueryApi.query(spark,
      "SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y'", out)
    assert(path.endsWith(".csv"))
    val lines = Files.readAllLines(Paths.get(
      path.stripPrefix("file:"))).asScala
    assert(lines.head == "a,b")
    assert(lines.tail.toSet == Set("1,x", "2,y"))
  }

  test("kill-switch: content 'disabled' aborts before any load " +
       "(abr-etl.go:59-78); other content does not") {
    dropAgencyTable()
    val (staging, lake) = freshDirs()
    write(staging, "VIC240115_ABR_Agency_Data.txt", Seq(row("p1")))
    Files.createDirectories(lake)
    Files.writeString(lake.resolve("disabled"), "disabled")

    val cfg = Pipeline.Config(staging.toString, lake.toString)
    intercept[Pipeline.DisabledException](Pipeline.run(spark, cfg))
    assert(!Files.exists(lake.resolve("DATA")), "nothing may be loaded")
    assert(Files.exists(staging.resolve("VIC240115_ABR_Agency_Data.txt")))

    // a flag with other content is ignored (reference compares the body)
    Files.writeString(lake.resolve("disabled"), "enabled")
    val loaded = Pipeline.run(spark, cfg)
    assert(loaded.size == 1)
    dropAgencyTable()
  }

  test("single partition: delta hook logs 'Not enough partitions' and " +
       "continues (agency-delta.go:24-27,123)") {
    dropAgencyTable()
    val (staging, lake) = freshDirs()
    write(staging, "VIC240115_ABR_Agency_Data.txt", Seq(row("p1")))
    val log = new Pipeline.RunLog()
    Pipeline.run(spark, Pipeline.Config(staging.toString, lake.toString), log)
    assert(log.events.contains("Not enough partitions to run delta"))
    assert(!Files.exists(lake.resolve("DELTA")))
    assert(log.events.contains("ABR ETL Process complete"))
    dropAgencyTable()
  }
}
