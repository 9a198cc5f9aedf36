package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the curation family's invariants that the oracle's
  * hash-compare can't articulate: sampling determinism under
  * repartitioning, pack-boundary behavior, and that decontamination
  * actually finds the injected leaks.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("stratified sample is identical under different partitioning " +
       "(hash-based: no rand(), no partition dependence)") {
    val q = graft.queries.CurationQueries.queries("cur_sample_stratified")
    val a = q(spark, sf).orderBy("doc_id").collect().toSeq
    // same query over a repartitioned session-read must pick the SAME
    // rows: the keep decision is a pure function of (doc_id, lang)
    val b = q(spark, sf).repartition(7).orderBy("doc_id").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("pack assignment: docs pack contiguously per source, a doc " +
       "starting past a capacity boundary opens the next pack") {
    val out = graft.queries.CurationQueries.queries("cur_pack_sequences")(
        spark, sf)
      .orderBy("source", "doc_id")
      .select("source", "n_tok", "pack_id")
      .as[(String, Long, Long)].collect()
    // per source: pack ids are non-decreasing and start at 0
    out.groupBy(_._1).foreach { case (_, rows) =>
      val packs = rows.map(_._3).toSeq
      assert(packs.head == 0L)
      assert(packs.zip(packs.tail).forall { case (x, y) => y >= x })
    }
    // global sanity: every pack's resident tokens (docs STARTING in it)
    // stay under capacity + one straddling doc
    val cap = 2048L
    val maxTok = out.map(_._2).max
    out.groupBy(r => (r._1, r._3)).foreach { case (_, rows) =>
      assert(rows.map(_._2).sum <= cap + maxTok)
    }
  }

  test("decontamination flags exactly the injected leaks at full overlap") {
    val out = graft.queries.CurationQueries.queries("cur_decon_ngram")(
        spark, sf)
      .select("eval_id", "train_id", "overlap4")
      .as[(Long, Long, Double)].collect()
    // injected: eval doc (id % 30 == 0) carries train doc id+1's text —
    // those pairs must be present with overlap 1.0
    val injected = out.filter { case (e, t, _) => t == e + 1 && e % 30 == 0 }
    assert(injected.nonEmpty)
    assert(injected.forall(_._3 == 1.0))
  }

  test("production decon: eval suite broadcasts, train shingle stream " +
       "is never shuffled before the probe join") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.catalyst.optimizer.BuildRight

    val df = graft.queries.CurationQueries
      .deconEval(spark, sf, checkpoint = false)
    df.collect()

    // query stages are leaves to TreeNode.collect — walk them explicitly
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val children = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      p +: children.flatMap(walk)
    }
    val all = walk(df.queryExecution.executedPlan)
    // the probe join: a broadcast hash join keyed on the shingle hash
    val probe = all.collectFirst {
      case b: BroadcastHashJoinExec
        if b.leftKeys.exists(_.toString.contains("sh")) => b
    }.getOrElse(fail("no broadcast hash join on the shingle key in:\n" +
      df.queryExecution.executedPlan))
    // the streamed (train) side must reach the parquet scan without any
    // shuffle — the whole point of the asymmetric decon shape
    val streamed = if (probe.buildSide == BuildRight) probe.left else probe.right
    val shuffles = walk(streamed).collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"train side must not shuffle before the probe:\n$streamed")
  }
}
