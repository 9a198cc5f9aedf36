package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.col

import graft.operators.LakeSnapshots
import graft.queries.{DeltaQueries, LakeQueries}
import graft.sources.dsv2.{LakeCatalogs, LakeLog}

/** Plan- and IO-level evidence for the versioned-lake queries: the
  * contracts the oracle can't see (which files a read touches, which
  * snapshot a scan pins) asserted directly on the plans and manifests.
  */
class Round10bQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("lake_time_travel pins its scan to snapshot v2 — visible in the " +
       "scan description, not just the result") {
    val df = LakeQueries.queries("lake_time_travel")(spark, dir)
    val descs = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }
    assert(descs.exists(_.contains("@v2")),
      s"time-travel scan must name its pinned snapshot:\n${descs.mkString("\n")}")
  }

  test("lake_cdc reads ONLY the files that changed hands between the two " +
       "snapshots — never the whole table") {
    LakeQueries.queries("lake_cdc")(spark, dir) // builds table + merge
    val tdir = s"${LakeCatalogs.root}/${LakeCatalogs.ns(dir)}/lake_cdc"
    val v1 = LakeLog.snapshotAt(tdir, 1L).files.toSet
    val v2 = LakeLog.snapshotAt(tdir, 2L).files.toSet
    val changed = (v2 -- v1) ++ (v1 -- v2)
    val cdc = LakeSnapshots.changes(spark, tdir, 1L, 2L)
    val read = cdc.inputFiles.map(_.split('/').last).toSet
    assert(read.nonEmpty && read.subsetOf(changed),
      s"CDC read ${read.size} files, outside the changed set: " +
        s"${(read -- changed).take(3)}")
    // (a FULL prev->newest merge legitimately covers every file; the
    // narrow-rewrite case — most files untouched AND unread — is pinned
    // by LakeTableSpec's runtime-group-filter test)
  }

  test("the full-merge CDC equals the declared delta family's " +
       "updated+added+removed accounting") {
    val cdc = LakeQueries.queries("lake_cdc")(spark, dir)
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the NULL-SAFE delta variant: CDC's exceptAll is null-safe row
    // equality, so the legacy 3-valued predicate (which silently skips
    // NULL transitions — the reference's bug-compat mode) undercounts
    // against it by exactly the nulled-priority rows
    val updated =
      DeltaQueries.queries("delta_updated_nullsafe")(spark, dir).count()
    val added = DeltaQueries.queries("delta_added")(spark, dir).count()
    val removed = DeltaQueries.queries("delta_removed")(spark, dir).count()
    assert(cdc("insert") == updated + added,
      s"inserts = updated+added: $cdc vs $updated+$added")
    assert(cdc("delete") == updated + removed,
      s"deletes = updated+removed: $cdc vs $updated+$removed")
  }

  test("lake_compact shrinks the file count and leaves a dataChange=false " +
       "head commit") {
    LakeQueries.queries("lake_compact")(spark, dir)
    val tdir = s"${LakeCatalogs.root}/${LakeCatalogs.ns(dir)}/lake_cmp"
    val head = LakeLog.current(tdir).get
    assert(head.operation == "compact" && !head.dataChange)
    val before = LakeLog.snapshotAt(tdir, head.version - 1).files.size
    assert(before == 16 && head.files.size < before,
      s"16 fragmented files must compact: $before -> ${head.files.size}")
  }

  test("lake_schema_evolution scans read all three vintages in one plan " +
       "(pre-column, pre-rename, post-rename) and the audit trail " +
       "records the metadata-only ALTERs") {
    val df = LakeQueries.queries("lake_schema_evolution")(spark, dir)
    assert(df.where(col("note").isNull).count() > 0, "old vintage")
    assert(df.where(col("note").startsWith("n")).count() > 0,
      "pre-rename vintage (written as o_note) resolves by field id")
    assert(df.where(col("note").startsWith("m")).count() > 0,
      "post-rename vintage")
    val tdir = s"${LakeCatalogs.root}/${LakeCatalogs.ns(dir)}/lake_evo"
    val snaps = LakeLog.versions(tdir).map(LakeLog.snapshotAt(tdir, _))
    val alter = snaps.find(_.operation.startsWith("alter_add"))
    assert(alter.exists(s => !s.dataChange && s.added.isEmpty),
      "ALTER must log a no-file, no-data commit")
    assert(snaps.exists(s => s.operation.startsWith("alter_rename") &&
      !s.dataChange && s.added.isEmpty),
      "RENAME must log a no-file, no-data commit")
  }
}
