package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SnapshotDelta

/** Reference-parity delta queries (SURVEY.md §2.2 R1-R5), oracle-checked.
  *
  * The reference diffs two weekly `importdate` partitions of
  * `abr_weekly_agency_data` keyed on `pid` (agency-delta.go:126-246). The
  * driver testdata has no multi-snapshot table, so we derive two
  * deterministic snapshots from `orders` — the derivation is mirrored
  * verbatim in the DuckDB oracle SQL:
  *
  *  - `previous` = orders with `o_orderkey % 13 <> 0`
  *  - `newest`   = orders with `o_orderkey % 17 <> 0`, with perturbations:
  *    status suffixed when `%5=0`, price +1 when `%7=3`, priority nulled
  *    when `%11=0` (exercises the 3-valued-logic corner of R3).
  *
  * Keys divisible by 13 (and not 17) are therefore "added"; keys divisible
  * by 17 (and not 13) are "removed"; perturbed keys present in both are
  * "updated".
  */
object DeltaQueries {

  /** Attributes compared by the change predicate — stands in for the
    * reference's 33-column list (agency-delta.go:168-200).
    */
  val compareAttrs: Seq[String] =
    Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  val key = "o_orderkey"

  def previous(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "orders").filter(col(key) % 13 =!= 0)

  def newest(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "orders")
      .filter(col(key) % 17 =!= 0)
      .withColumn("o_orderstatus",
        when(col(key) % 5 === 0, concat(col("o_orderstatus"), lit("U")))
          .otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(col(key) % 7 === 3, col("o_totalprice") + lit(1.0d))
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderpriority",
        when(col(key) % 11 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")))

  /** Shared oracle CTE prologue — must stay semantically identical to
    * `previous`/`newest` above.
    */
  private val snapshotCte =
    """WITH prev AS (
      |  SELECT * FROM orders WHERE o_orderkey % 13 <> 0
      |), newest AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 5 = 0 THEN o_orderstatus || 'U' ELSE o_orderstatus END AS o_orderstatus,
      |    CASE WHEN o_orderkey % 7 = 3 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate,
      |    CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority
      |  FROM orders WHERE o_orderkey % 17 <> 0
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R2+R3 legacy mode: inner self-join + OR of !=, NULL transitions invisible
    "delta_updated" -> ((s, dir) =>
      SnapshotDelta.updated(newest(s, dir), previous(s, dir), key, compareAttrs,
        SnapshotDelta.Legacy)),
    // R3 null-safe mode: NULL transitions detected
    "delta_updated_nullsafe" -> ((s, dir) =>
      SnapshotDelta.updated(newest(s, dir), previous(s, dir), key, compareAttrs,
        SnapshotDelta.NullSafe)),
    // R4 intent: anti-join
    "delta_added" -> ((s, dir) =>
      SnapshotDelta.added(newest(s, dir), previous(s, dir), key)),
    // extension: symmetric complement
    "delta_removed" -> ((s, dir) =>
      SnapshotDelta.removed(newest(s, dir), previous(s, dir), key)),
    // R5: top-2 partition-value selection, expressed over derived month
    // "partitions" of orders (reference: agency-delta.go:97-124)
    "delta_partition_pair" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .select(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("importdate"))
        .distinct()
        .orderBy(col("importdate").desc)
        .limit(2)),
  )

  def oracleSql: Map[String, String] = Map(
    "delta_updated" ->
      s"""$snapshotCte
         |SELECT n.* FROM newest n JOIN prev p ON n.o_orderkey = p.o_orderkey
         |WHERE n.o_custkey <> p.o_custkey
         |   OR n.o_orderstatus <> p.o_orderstatus
         |   OR n.o_totalprice <> p.o_totalprice
         |   OR n.o_orderdate <> p.o_orderdate
         |   OR n.o_orderpriority <> p.o_orderpriority""".stripMargin,
    "delta_updated_nullsafe" ->
      s"""$snapshotCte
         |SELECT n.* FROM newest n JOIN prev p ON n.o_orderkey = p.o_orderkey
         |WHERE n.o_custkey IS DISTINCT FROM p.o_custkey
         |   OR n.o_orderstatus IS DISTINCT FROM p.o_orderstatus
         |   OR n.o_totalprice IS DISTINCT FROM p.o_totalprice
         |   OR n.o_orderdate IS DISTINCT FROM p.o_orderdate
         |   OR n.o_orderpriority IS DISTINCT FROM p.o_orderpriority""".stripMargin,
    "delta_added" ->
      s"""$snapshotCte
         |SELECT n.* FROM newest n
         |WHERE NOT EXISTS (SELECT 1 FROM prev p WHERE p.o_orderkey = n.o_orderkey)""".stripMargin,
    "delta_removed" ->
      s"""$snapshotCte
         |SELECT p.* FROM prev p
         |WHERE NOT EXISTS (SELECT 1 FROM newest n WHERE n.o_orderkey = p.o_orderkey)""".stripMargin,
    "delta_partition_pair" ->
      """SELECT DISTINCT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS importdate
        |FROM orders ORDER BY importdate DESC LIMIT 2""".stripMargin,
  )
}
