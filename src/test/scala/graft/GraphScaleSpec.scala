package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.functions._

/** Plan-shape pins for the graph/clustering operators' 100 TB claims —
  * the properties a correctness hash can't see:
  *   - PageRank's per-round rank broadcast is BOUNDED: above the node
  *     threshold the rank table joins without a broadcast hint (no
  *     per-executor |V| materialization), and both paths produce
  *     identical ranks (the DECIMAL contribution sum makes the result
  *     aggregation-order independent, so the join strategy cannot move
  *     a rank).
  *   - Triangle enumeration runs on the AGGREGATED entity graph: every
  *     join whose both sides derive from the fact table sits ABOVE an
  *     aggregation on both sides — raw fact rows are never self-joined.
  *   - k-means assignment is a pure per-row expression: the final plan
  *     contains no join at all (centroids are literals, not a table).
  */
class GraphScaleSpec extends SparkSpec {
  import spark.implicits._

  private def hints(df: org.apache.spark.sql.DataFrame): Seq[ResolvedHint] =
    df.queryExecution.analyzed.collect { case h: ResolvedHint => h }

  test("pagerank: rank broadcast is node-count-bounded — the big-|V| " +
       "path plans no broadcast hint and matches the broadcast path " +
       "rank-for-rank") {
    // two components + a hub so ranks are non-uniform
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L)
    ).toDF("id1", "id2")
    val viaBroadcast = graft.operators.GraphOps.pagerank(edges)
    val viaJoin = graft.operators.GraphOps.pagerank(edges,
      rankBroadcastMaxNodes = 0L)
    assert(hints(viaBroadcast).nonEmpty,
      "small-|V| path should hint the rank broadcast")
    assert(hints(viaJoin).isEmpty,
      "big-|V| path must not force a rank-table broadcast")
    val a = viaBroadcast.as[(Long, Double)].collect().sortBy(_._1)
    val b = viaJoin.as[(Long, Double)].collect().sortBy(_._1)
    assert(a.sameElements(b),
      "join strategy must not change rank values (exact-DECIMAL sums)")
  }

  private def containsFactScan(p: LogicalPlan): Boolean =
    p.collectLeaves().exists(_.output.exists(_.name.startsWith("l_")))
  private def hasAggregate(p: LogicalPlan): Boolean =
    p.collectFirst { case a: Aggregate => a }.nonEmpty

  test("graph_triangles: enumeration happens on the post-aggregation " +
       "edge list — no join in the plan self-joins raw fact rows") {
    val df = graft.queries.RelationalQueries.queries("graph_triangles")(
      spark, sfDir)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    val factFact = joins.filter(j =>
      containsFactScan(j.left) && containsFactScan(j.right))
    if (factFact.nonEmpty) {
      // unstaged shape: the enumeration joins + the threshold crossJoin
      // have fact lineage on both sides — the pin is that EVERY such
      // join sits above an Aggregate on BOTH sides (the ≤|nations|²
      // entity graph). NOTE: with tradeEdges staged (r16) this branch
      // is revert-robustness only — the checkpointed edge frame has no
      // fact lineage, so the else branch is the live pin.
      assert(factFact.forall(j =>
        hasAggregate(j.left) && hasAggregate(j.right)),
        "a join of raw (un-aggregated) fact rows against fact rows " +
          "breaks the 100 TB contract")
    } else {
      // staged shape (r16): tradeEdges is an app-scoped checkpointed
      // artifact, so raw fact rows are not in the enumeration plan AT
      // ALL — the stronger form of the same contract. Pin the fold
      // that builds the artifact instead: its fact-fact joins (the
      // mean-volume threshold over the pair aggregate) must sit above
      // an Aggregate on both sides, i.e. fact rows aggregate to the
      // entity graph before any pairwise work.
      assert(joins.nonEmpty, "expected enumeration joins in the plan")
      val derive = graft.queries.RelationalQueries
        .tradeEdgesWeightedDerive(spark, sfDir)
      val dFactFact = derive.queryExecution.optimizedPlan
        .collect { case j: Join => j }
        .filter(j => containsFactScan(j.left) && containsFactScan(j.right))
      assert(dFactFact.nonEmpty,
        "expected fact-derived joins in the edge-list build")
      assert(dFactFact.forall(j =>
        hasAggregate(j.left) && hasAggregate(j.right)),
        "the edge-list build must aggregate fact rows to the entity " +
          "graph before any fact-fact join")
    }
  }

  test("emb_kmeans_lloyd: assignment is literal-centroid per-row work — " +
       "the final plan contains zero joins") {
    val df = graft.queries.SimilarityQueries.queries("emb_kmeans_lloyd")(
      spark, sfDir)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.isEmpty,
      s"kmeans plan must not join/broadcast the corpus, found: $joins")
    assert(df.count() > 0)
  }

  test("label propagation: the symmetrized edge shuffle is executed " +
       "once and reused by every round") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L),
      (3L, 4L)
    ).toDF("id1", "id2")
    val lp = graft.operators.GraphOps.labelPropagation(edges, rounds = 3)
    lp.collect() // force execution so AQE finalizes the reused stages
    val plan = lp.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      "each round must reuse the one src-clustered edge exchange, not " +
        s"re-shuffle the edge list per round:\n$plan")
  }

  test("label propagation: the early-exit path converges to the same " +
       "labels as the chained fixed-round path") {
    // two triangles + a bridge: label flow settles well inside 10
    // rounds, so the early-exit path stops at the fixpoint probe while
    // the chained path runs all 10 — identical labels proves the
    // fixpoint is absorbing (an unchanged table reproduces itself)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L),
      (3L, 4L)
    ).toDF("id1", "id2")
    val chained = graft.operators.GraphOps
      .labelPropagation(edges, rounds = 10)
      .as[(Long, Long)].collect().toSet
    val early = graft.operators.GraphOps
      .labelPropagation(edges, rounds = 10, earlyExit = true)
      .as[(Long, Long)].collect().toSet
    assert(early == chained,
      s"early-exit labels diverged: ${early -- chained} vs ${chained -- early}")
  }

  test("emb_pq_encode: literal-codebook encoding is one corpus scan — " +
       "zero joins and zero aggregates in the plan") {
    val df = graft.queries.SimilarityQueries.queries("emb_pq_encode")(
      spark, sfDir)
    val plan = df.queryExecution.optimizedPlan
    assert(plan.collect { case j: Join => j }.isEmpty,
      "PQ encode must not join the corpus against a codebook table")
    assert(plan.collect { case a: Aggregate => a }.isEmpty,
      "PQ encode must not regroup the corpus (per-row expression only)")
    assert(df.count() > 0)
  }
}
