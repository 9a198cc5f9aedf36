package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Round-10 tranche invariants beyond the oracle hash-compare:
  *
  *   - delta_merge_sql (the SQL MERGE spelling) recovers the newest
  *     snapshot exactly and agrees row-for-row with the DataFrame
  *     merge-upsert operator;
  *   - ingest_dsv2_lake_scan's plan pins: only the requested columns
  *     reach the reader, and footer-stats pruning plans a strict subset
  *     of the mounted table's row groups.
  */
class Round10QueriesSpec extends SparkSpec {

  test("delta_merge_sql recovers the newest snapshot and matches the " +
       "DataFrame merge-upsert operator row for row") {
    val sql = SparkEntry.queries("delta_merge_sql")(spark, sfDir)
    val df = SparkEntry.queries("delta_merge_upsert")(spark, sfDir)
    assert(sql.count() == df.count())
    assert(sql.exceptAll(df).isEmpty && df.exceptAll(sql).isEmpty,
      "SQL MERGE and DataFrame merge-upsert disagree")
    // the merge really deleted (prev-only keys), updated (changed
    // attrs), and inserted (newest-only keys)
    val newest = queries.DeltaQueries.newest(spark, sfDir)
    assert(sql.exceptAll(newest).isEmpty && newest.exceptAll(sql).isEmpty,
      "merged table is not the newest snapshot")
  }

  test("delta_merge_sql is idempotent across runs: a second full run " +
       "rebuilds and converges to the same result") {
    val first = SparkEntry.queries("delta_merge_sql")(spark, sfDir).count()
    val second = SparkEntry.queries("delta_merge_sql")(spark, sfDir).count()
    assert(first == second)
  }

  test("ingest_dsv2_lake_scan plans only the requested columns and a " +
       "strict subset of row groups") {
    val q = SparkEntry.queries("ingest_dsv2_lake_scan")(spark, sfDir)
    val desc = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }.mkString("\n")
    assert(desc.contains("cols=[o_orderkey,o_orderstatus,o_totalprice]"),
      s"projection not pruned to the probe columns (table field order): $desc")
    val m = "rowgroups=(\\d+)/(\\d+)".r.findFirstMatchIn(desc).get
    val (planned, total) = (m.group(1).toInt, m.group(2).toInt)
    assert(total >= 8, s"fixture has too few row groups to prove pruning: $desc")
    assert(planned < total, s"stats pruning planned every row group: $desc")
    // correctness independent of pruning: rows match a raw-parquet probe
    val hi = Tables(spark, sfDir, "orders")
      .agg(max(col("o_orderkey"))).collect()(0).getLong(0) / 10L * 9L
    val expect = Tables(spark, sfDir, "orders")
      .where(col("o_orderkey") >= hi).count()
    assert(q.count() == expect)
  }
}
