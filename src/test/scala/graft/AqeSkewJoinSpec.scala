package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join evidence (SURVEY §2.2 scale note). The repo carries two
  * skew guards: the *manual* salted join (operators/SkewJoin.scala, for
  * engines or paths where runtime re-planning is off) and Spark's
  * *runtime* one — AQE detecting an oversized shuffle partition in an
  * equi-join and splitting it so one hot key cannot serialize a
  * 1000-executor stage. This spec pins the runtime path with a plan
  * assertion (the `isSkewJoin` flag on the executed sort-merge join),
  * the same evidence style BucketedJoinSpec uses for the zero-exchange
  * delta plan.
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the skewed partition of a hot-key equi-join") {
    val s = spark
    val conf = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // harness-scale thresholds: the hot key's shuffle partition is a
      // few MB here, not the 256MB production default — the *mechanism*
      // under test is identical
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // force the sort-merge path: a broadcast join has no shuffle to skew
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.keys.map(k => k -> s.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // 90% of fact rows share key 0, each carrying a 128-byte payload so
      // the hot partition is oversized in BYTES (what AQE measures)
      val fact = s.range(0, 60000).select(
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        concat_ws("", Seq.fill(4)(md5(col("id").cast("string"))): _*)
          .as("payload"))
      val dim = s.range(0, 60000).select(col("id").as("k"),
        (col("id") % 97).as("w"))
      // global aggregate (not a groupBy on the join key): a downstream
      // operator that REQUIRES the join's hash partitioning would veto
      // the skew split (splitting breaks the partitioning guarantee);
      // partial aggregation is partitioning-agnostic, so the split is
      // legal — the same reason a delta writer sees skew handled while
      // a same-key re-aggregation would not
      val res = fact.join(dim, "k")
        .agg(sum(length(col("payload"))).as("bytes"), sum("w").as("ws"))
      val Array(row) = res.collect()
      assert(row.getLong(0) == 60000L * 128)
      val adaptive = res.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
        .getOrElse(fail("expected an adaptive plan root"))
      // query stages are leaf nodes to TreeNode.collect, so match on the
      // rendered final plan (toString descends into stages)
      val plan = adaptive.executedPlan.toString
      assert(plan.contains("SortMergeJoin(skew=true)"),
        s"expected a skew-split sort-merge join in:\n$plan")
      assert(plan.contains("AQEShuffleRead skewed"),
        s"expected a skewed AQE shuffle read in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of the DELTA shape (r16, the " +
       "delta_updated_wide_skewed receipt): a duplicate-keyed hot pid " +
       "family holding ~20% of both snapshots lands its quadratic " +
       "hot×hot pair work in one hash partition; the runtime skew " +
       "split parallelizes it, and the delta output is exact — the " +
       "identical family pairs fail the change predicate") {
    import graft.operators.SnapshotDelta
    val s = spark
    val conf = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // enough shuffle partitions that a NORMAL partition is small —
      // the skew test is relative (factor × median); at the session
      // default of a few partitions the family hides inside the noise
      "spark.sql.shuffle.partitions" -> "32")
    val saved = conf.keys.map(k => k -> s.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val attrs = Seq("a1", "a2", "a3", "a4")
      // every id % 5 == 0 collapses onto pid 'HOT' with PID-derived
      // (identical) COMPARED attrs — a 20% family; non-family rows
      // change attr a1 when id % 97 == 1. Each row also carries a
      // high-entropy NON-compared payload (compared attrs ⊂ row
      // columns is a legitimate delta shape): identical family attrs
      // would otherwise compress to nothing in the shuffle and hide
      // the hot partition from AQE's bytes-based skew detection —
      // per-row entropy is what a real record's uncompared columns
      // (timestamps, ids, free text) provide
      def snap(changed: Boolean) = {
        val pid = when(col("id") % 5 === 0, lit("HOT"))
          .otherwise(col("id").cast("string"))
        val payload = concat_ws("", (1 to 8).map(i =>
          md5(concat(col("id").cast("string"), lit(s"#$i")))): _*)
        val cols = pid.as("pid") +: payload.as("payload") +:
          attrs.map { c =>
            val base = concat_ws("", Seq.fill(2)(
              md5(concat(pid, lit(":" + c)))): _*)
            if (changed && c == "a1")
              when(col("id") % 5 =!= 0 && col("id") % 97 === 1,
                concat(base, lit("X"))).otherwise(base).as(c)
            else base.as(c)
          }
        s.range(0, 40000).select(cols: _*)
      }
      val res = SnapshotDelta.updated(snap(changed = true),
        snap(changed = false), "pid", attrs, SnapshotDelta.Legacy)
      val rows = res.collect()
      // exact: only the non-family %97==1 keys changed (ids 1 mod 97,
      // excluding multiples of 5)
      val expect = (0 until 40000)
        .count(id => id % 5 != 0 && id % 97 == 1)
      assert(rows.length == expect, s"${rows.length} != $expect")
      assert(rows.forall(_.getString(0) != "HOT"),
        "identical family pairs must fail the change predicate")
      val adaptive = res.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
        .getOrElse(fail("expected an adaptive plan root"))
      val plan = adaptive.executedPlan.toString
      assert(plan.contains("SortMergeJoin(skew=true)"),
        s"expected a skew-split sort-merge join in:\n$plan")
      assert(plan.contains("AQEShuffleRead skewed"),
        s"expected a skewed AQE shuffle read in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
