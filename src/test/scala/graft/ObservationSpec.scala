package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** The `Observation` API as the engine's zero-cost DQ seam: metrics
  * attach to a node of an EXISTING job and are collected as the rows
  * stream past — at 100 TB the difference between "row counts for free"
  * and a second full scan. The reference's pipeline logs row-level
  * outcomes driver-side (`load.go:65-67` log-and-continue); observe()
  * is the Spark-native form of the same bookkeeping.
  */
class ObservationSpec extends SparkSpec {

  test("observed metrics ride the existing job: pre-filter counts are " +
       "collected with no second scan, and match an independent count") {
    val obs = Observation("ingress")
    val orders = Tables(spark, sfDir, "orders")
      .observe(obs,
        count(lit(1)).as("rows_in"),
        count(when(col("o_totalprice") <= 0, 1)).as("nonpositive_price"),
        sum(col("o_orderkey")).as("key_sum"))
    // the downstream query filters; the observation still sees ingress
    val kept = orders.where(col("o_orderstatus") === "O").count()
    val m = obs.get
    val expectedRows = Tables(spark, sfDir, "orders").count()
    assert(m("rows_in") == expectedRows)
    assert(m("nonpositive_price") == 0L)
    assert(kept < expectedRows, "filter kept everything — bad fixture")
    val expectedKeySum = Tables(spark, sfDir, "orders")
      .agg(sum("o_orderkey")).collect()(0).getLong(0)
    assert(m("key_sum") == expectedKeySum)
  }

  test("streaming observed metrics surface per micro-batch: ingress " +
       "counts across the admission-controlled drain sum to the total") {
    val q = spark.readStream
      .format("graft.sources.dsv2.RangeStreamSource")
      .option("end", "100000").option("batchRows", "20000")
      .load()
      .observe("ingress", count(lit(1)).as("rows"),
        sum(col("v")).as("v_sum"))
      .groupBy("tag").agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("obs_stream_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val perBatch = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("ingress")))
      .map(r => (r.getAs[Long]("rows"), r.getAs[Long]("v_sum")))
      .filter(_._1 > 0)
    // 5 bounded micro-batches, metrics riding each batch's existing job
    assert(perBatch.length == 5 && perBatch.map(_._1).sum == 100000L,
      s"per-batch ingress: $perBatch")
    // the non-count metric survives batch splits too: per-batch v sums
    // total the closed-form generator sum
    val expectedVSum = (0L until 100000L)
      .map(graft.sources.dsv2.RangeSource.vOf).sum
    assert(perBatch.map(_._2).sum == expectedVSum)
  }

  test("an observation on the delta join's newest side reports the " +
       "snapshot's row count during the delta job itself") {
    import graft.sources.AgencyLake
    val obs = Observation("newest_side")
    val newest = AgencyLake.snapshot(spark, sfDir, AgencyLake.newestDate)
      .observe(obs, count(lit(1)).as("snapshot_rows"))
    val prev = AgencyLake.snapshot(spark, sfDir, AgencyLake.previousDate)
    val changed = newest.alias("n")
      .join(prev.alias("p"), col(s"n.${graft.queries.DeltaQueries.key}") === col(s"p.${graft.queries.DeltaQueries.key}"))
      .count()
    val m = obs.get
    assert(m("snapshot_rows") ==
      AgencyLake.snapshot(spark, sfDir, AgencyLake.newestDate).count())
    assert(changed > 0)
  }
}
