package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal plumbing, oracle-gated: binary payload column → batched
  * partition-local decode (stubbed codec, real Spark plumbing) → typed
  * metadata. The synthetic payload derives from md5(text), so DuckDB can
  * reproduce the decoded header fields arithmetically from the hex
  * digest without any binary handling.
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary column -> mapPartitions batch decode -> per-row typed meta
    "mm_decode_meta" -> ((s, dir) =>
      Multimodal.decode(
        Multimodal.syntheticMedia(Tables(s, dir, "documents"))).toDF()),

    // downstream-of-decode aggregation: only the small metadata rows
    // reach the shuffle, never the payloads
    "mm_mode_stats" -> ((s, dir) =>
      Multimodal.decode(
        Multimodal.syntheticMedia(Tables(s, dir, "documents"))).toDF()
        .groupBy("mode")
        .agg(count(lit(1)).as("n"),
          sum("n_bytes").as("total_bytes"),
          max("width").as("max_width"))),
  )

  private val byteSql = (i: Int) =>
    s"CAST('0x' || substr(md5(text), ${2 * i + 1}, 2) AS BIGINT)"

  def oracleSql: Map[String, String] = Map(
    "mm_decode_meta" ->
      s"""SELECT doc_id, CAST(n_chars AS BIGINT) AS n_bytes,
         |  ${byteSql(0)} AS width,
         |  ${byteSql(1)} AS height,
         |  CASE WHEN ${byteSql(2)} % 2 = 0 THEN 'rgb' ELSE 'gray' END AS mode
         |FROM documents""".stripMargin,
    "mm_mode_stats" ->
      s"""SELECT mode, count(*) AS n,
         |  CAST(sum(n_chars) AS BIGINT) AS total_bytes,
         |  CAST(max(w) AS BIGINT) AS max_width
         |FROM (SELECT n_chars, ${byteSql(0)} AS w,
         |        CASE WHEN ${byteSql(2)} % 2 = 0 THEN 'rgb' ELSE 'gray' END AS mode
         |      FROM documents) q
         |GROUP BY mode""".stripMargin,
  )
}
