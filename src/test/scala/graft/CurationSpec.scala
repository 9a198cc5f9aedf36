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

  test("chunking is shuffle-free: sequence/slice/explode stay in one " +
       "codegen stage, no exchange anywhere in the plan") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val df = graft.queries.CurationQueries.queries("cur_chunk_overlap")(
      spark, sf)
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"cur_chunk_overlap must not shuffle:\n${df.queryExecution.executedPlan}")
    // stride invariant: docs longer than one stride produce multiple
    // chunks, indexed contiguously from 0
    val multi = df.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("chunk_idx").as("mx"))
      .where(col("n") >= 2)
    assert(multi.count() > 0, "fixture must contain multi-chunk docs")
    assert(multi.where(col("mx") =!= col("n") - 1).count() == 0,
      "chunk_idx must be contiguous from 0")
  }

  test("temperature mixing upweights rare languages relative to " +
       "proportional sampling") {
    val d = Tables(spark, sf, "documents")
    val rates = graft.queries.CurationQueries.queries("cur_mix_temperature")(
        spark, sf)
      .groupBy("lang").agg(first("rate6").as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val counts = d.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val big = counts.maxBy(_._2)._1
    val small = counts.minBy(_._2)._1
    // T=2 flattens the distribution: the rare language's keep RATE must
    // exceed the dominant one's (it gets oversampled relative to share)
    assert(rates(small) > rates(big),
      s"expected rate($small)=${rates(small)} > rate($big)=${rates(big)}")
  }
}
