package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed connected components over an edge list — the cluster
  * step of a dedup pipeline: pairwise near-dup verdicts (LSH + verify)
  * must be collapsed into groups before one representative per group can
  * be kept; a pair list alone under-deletes (A~B, B~C but A!~C).
  *
  * Algorithm: iterative min-label propagation with POINTER JUMPING.
  * Every node starts labelled with itself; each round every node takes
  * the minimum label among itself and its neighbours (edge step), then
  * replaces its label with its label's label (jump step — path
  * halving). The edge step moves information one hop; the jump step
  * doubles the effective reach, so convergence is O(log diameter)
  * rounds instead of O(diameter) — a 1000-node chain converges in ~10
  * rounds, not 1000. Fixpoint = per-component minimum everywhere. Each
  * round is two joins + one aggregation — fully distributed, no
  * driver-side graph. The driver only orchestrates rounds and checks
  * convergence (a `limit(1).count()` probe), which is how iterative
  * algorithms run on Spark generally (GraphX Pregel does the same
  * under the hood).
  *
  * Scale notes (100 TB): each round shuffles the edge list once on the
  * join key plus the (one-row-per-node) label table twice; round count
  * is logarithmic, so adversarially deep graphs can't starve the loop.
  * `localCheckpoint` after every round truncates lineage — without it
  * the plan doubles per round and planning cost explodes by round ~10.
  * `maxIter` is a safety net, not the convergence mechanism.
  */
object GraphOps {

  /** Connected components of the undirected graph given by (id1, id2)
    * pairs. Returns (id, component) where component = min node id
    * reachable — deterministic, engine-portable. Only nodes appearing
    * in at least one edge are returned (isolated nodes aren't in the
    * input's vocabulary).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges
      .select(col("id1").cast("long").as("src"), col("id2").cast("long").as("dst"))
      .unionByName(edges
        .select(col("id2").cast("long").as("src"), col("id1").cast("long").as("dst")))
      .distinct()
      .localCheckpoint() // edges reused every round — materialize once
    var labels = sym.select(col("src").as("id"))
      .distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // edge step: take the min label over self ∪ neighbours
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
        .unionByName(labels)
        .groupBy("id").agg(min("lbl").as("lbl"))
      // jump step (path halving): lbl ← lbl(lbl). The parent's label is
      // ≤ my label by construction, so this only ever improves, and it
      // doubles how far a round reaches.
      val parents = prop.select(col("id").as("_pid"), col("lbl").as("_plbl"))
      val jumped = prop.join(parents, col("lbl") === col("_pid"))
        .select(col("id"), col("_plbl").as("lbl"))
        .localCheckpoint() // truncate lineage each round
      val changed = jumped.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .where(col("n.lbl") =!= col("o.lbl"))
        .limit(1).count()
      labels = jumped
      converged = changed == 0
      i += 1
    }
    // non-convergence must be LOUD: labels that stopped short of the
    // fixpoint are silently-wrong cluster ids for every downstream
    // consumer. With path halving, maxIter=20 covers diameters beyond
    // 2^20 — hitting this is a bug or a pathological input, not a tuning
    // knob to absorb.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds; " +
          "labels are not a fixpoint — raise maxIter")
    labels.select(col("id"), col("lbl").as("component"))
  }

  /** Fixed-iteration PageRank over an undirected edge list (id1, id2) —
    * the second iterative-compute shape after [[connectedComponents]]:
    * CC converges to an exact fixpoint, PageRank runs a FIXED number of
    * power-iteration rounds (the production pattern — rank deltas decay
    * geometrically, so a fixed small round count is the cost contract).
    *
    * Engine-portable arithmetic: per-edge contributions are IEEE double
    * divisions (deterministic), but each node's contribution SUM crosses
    * a shuffle — summed as exact DECIMAL(28,18) so aggregation order
    * can't move the result, then cast back (a binary double never lands
    * on a decimal half-tie, so the cast rounds identically everywhere).
    * A differential oracle can therefore unroll the same iterations in
    * SQL and hash-match bit-for-bit.
    *
    * Scale notes: each round is one join of the edge list against the
    * one-row-per-node rank table plus a partial-agg'd groupBy — the
    * same cost shape as a CC round; `localCheckpoint` per round keeps
    * the plan from doubling. Undirected edges mean no dangling-mass
    * correction is needed (every node with an edge has out-degree).
    */
  /** The STAGED pagerank graph — everything that depends only on the
    * edge list, not on the iteration: the degree-joined, correctly
    * pre-partitioned edge table, the uniform initial rank vector, the
    * node count, and the rank-distribution mode. Callers that iterate
    * repeatedly over one graph (or run both rank-distribution modes on
    * it) should [[preparePagerank]] once, cache the result, and call
    * [[pagerankIterate]] per run — the stage/iterate split every
    * production graph pipeline makes (derive+partition the graph once,
    * power-iterate many times).
    */
  final case class PreparedPagerank(outEdges: DataFrame, pr0: DataFrame,
                                    nNodes: Long, broadcastRanks: Boolean)

  def pagerank(edges: DataFrame, iterations: Int = 5,
               damping: Double = 0.85,
               edgesDistinct: Boolean = false,
               rankBroadcastMaxNodes: Long = 10L * 1000 * 1000): DataFrame =
    pagerankIterate(
      preparePagerank(edges, edgesDistinct, rankBroadcastMaxNodes),
      iterations, damping)

  def preparePagerank(edges: DataFrame,
                      edgesDistinct: Boolean = false,
                      rankBroadcastMaxNodes: Long = 10L * 1000 * 1000)
      : PreparedPagerank = {
    // materialize the caller's edge derivation ONCE — the symmetrization
    // union consumes it twice, and without the checkpoint both branches
    // re-run whatever join/distinct produced it
    val e = edges
      .select(col("id1").cast("long").as("id1"), col("id2").cast("long").as("id2"))
      .localCheckpoint()
    val symRaw = e.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(e.select(col("id2").as("src"), col("id1").as("dst")))
    // `edgesDistinct = true` asserts the input pairs are already distinct
    // AND no pair appears in both orientations (e.g. bipartite graphs
    // with disjoint id namespaces) — then the symmetrized union is
    // dup-free by construction and the distinct's full-edge shuffle is
    // provably redundant. Wrong assertion = double-counted edges, so the
    // default stays safe.
    val sym = if (edgesDistinct) symRaw else symRaw.distinct()
    // deg is the vertex table too (every node of an undirected edge list
    // appears as a src): n, pr0, and the degree join all come from this
    // ONE aggregate instead of three separate distincts over sym
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val nNodes = deg.count()
    val n = nNodes.toDouble
    // The rank table is one row per node. Up to `rankBroadcastMaxNodes`
    // it is BROADCAST into each round's join (per-executor memory ∝ |V|:
    // a (long, double) row hash-relation-expands to ~40-60 B, so the
    // 10M default keeps the broadcast in the few-hundred-MB range an
    // executor can absorb; a hard ceiling at billion-node graphs);
    // above the threshold each round shuffle-joins the rank
    // table instead (rank shuffle ∝ |V| per round — small next to the
    // edge list, and with no per-executor materialization it has no
    // memory ceiling). The edge list is pre-partitioned ONCE to match
    // the per-round exchange it feeds: by DST for the broadcast path
    // (every round ends in groupBy(dst), making the aggregation
    // exchange-free), by SRC for the join path (every round starts with
    // a join on src, so the big side never re-shuffles; the dst groupBy
    // then moves contributions, not edges-with-arrays). The repartition
    // goes AFTER the checkpoint: a checkpointed RDD scan reports
    // UnknownPartitioning, so partitioning info must come from a live
    // Exchange node — the same exchange subtree appears in all rounds
    // and exchange reuse executes it ONCE. Five rounds thus share one
    // edge shuffle instead of re-shuffling the full edge list per round
    // — THE partitioning-reuse pattern for iterative graph compute (at
    // 100 TB the edge shuffle is the whole cost).
    val broadcastRanks = nNodes <= rankBroadcastMaxNodes
    val outEdges = sym.join(deg, "src").localCheckpoint()
      .repartition(if (broadcastRanks) col("dst") else col("src"))
    val pr0 = deg.select(col("src").as("node"))
      .withColumn("pr", lit(1.0) / n)
      .localCheckpoint()
    PreparedPagerank(outEdges, pr0, nNodes, broadcastRanks)
  }

  def pagerankIterate(g: PreparedPagerank, iterations: Int = 5,
                      damping: Double = 0.85): DataFrame = {
    val PreparedPagerank(outEdges, pr0, nNodes, broadcastRanks) = g
    val n = nNodes.toDouble
    var pr = pr0
    // rounds CHAIN inside one job: each round references the previous pr
    // exactly once (join), so the plan grows linearly with rounds — no
    // per-round materialization needed, and Spark executes the whole
    // power iteration as one pipelined job (5 chained shuffles) instead
    // of 5 jobs each paying checkpoint + scheduling overhead. The
    // checkpointed outEdges base keeps every round's big side a reused
    // in-memory scan with stable hash(src) partitioning. (For LARGE
    // iteration counts a periodic truncation would bound planning time —
    // at the fixed small counts production uses, linear depth is cheap.)
    (1 to iterations).foreach { _ =>
      pr = outEdges.join(if (broadcastRanks) broadcast(pr) else pr,
          col("src") === col("node"))
        .select(col("dst"), (col("pr") / col("deg")).as("c"))
        .groupBy(col("dst").as("node"))
        .agg((lit((1.0 - damping) / n) + lit(damping) *
          sum(col("c").cast("decimal(28,18)")).cast("double")).as("pr"))
    }
    pr
  }

  /** Fixed-round single-source shortest paths — distributed Bellman-Ford
    * relaxation over a WEIGHTED undirected edge list (id1, id2, w): the
    * fourth iterative shape (CC converges exactly, PageRank decays
    * numerically, LPA votes, SSSP RELAXES — after round k every node
    * holds the exact minimum path weight over paths of ≤ k hops, so a
    * fixed round count is a precise semantic contract, not an
    * approximation knob).
    *
    * Engine-portable arithmetic: edge weights and path sums are
    * DECIMAL(28,2) — additions and min() are exact and order-independent,
    * so a differential oracle can unroll the same rounds in SQL and
    * hash-match. (Float weights would make `min` order-stable but the
    * SUM along a path engine-dependent in rounding.)
    *
    * Scale shape: identical to a PageRank round — the edge list is
    * symmetrized, materialized ONCE, and clustered by `src` so all
    * rounds share a single edge exchange (exchange reuse executes it
    * once); each round joins the one-row-per-reached-node frontier
    * against it and folds with a partial-agg'd min. The distance table
    * is never broadcast — no per-executor |V| ceiling. Rounds chain
    * lazily into one pipelined job (plan depth linear in rounds), the
    * right shape for the fixed small round counts production uses.
    */
  def shortestPaths(edges: DataFrame, source: Long, rounds: Int = 4): DataFrame = {
    val e = edges
      .select(col("id1").cast("long").as("id1"), col("id2").cast("long").as("id2"),
        col("w").cast(DecimalType(28, 2)).as("w"))
      .localCheckpoint()
    val sym = e.select(col("id1").as("src"), col("id2").as("dst"), col("w"))
      .unionByName(e.select(col("id2").as("src"), col("id1").as("dst"), col("w")))
      .localCheckpoint()
      .repartition(col("src"))
    var dist = sym.sparkSession.range(1)
      .select(lit(source).as("node"),
        lit(java.math.BigDecimal.ZERO).cast(DecimalType(28, 2)).as("d"))
    (1 to rounds).foreach { _ =>
      val relaxed = sym.join(dist, col("src") === col("node"))
        .select(col("dst").as("node"), (col("d") + col("w")).as("d"))
      // min of (current, one-hop extensions); re-cast pins the decimal
      // type so plan width doesn't creep round over round
      dist = dist.unionByName(relaxed)
        .groupBy("node")
        .agg(min("d").cast(DecimalType(28, 2)).as("d"))
    }
    dist
  }

  /** Synchronous label propagation (community detection) over an
    * undirected edge list (id1, id2) — the third iterative shape: CC
    * converges to an exact fixpoint, PageRank numerically decays, LPA
    * runs a FIXED number of synchronous rounds with a DETERMINISTIC
    * update (asynchronous/random-order LPA — the textbook variant — is
    * irreproducible by construction; synchronous rounds with a total
    * tie-break give the same communities on every engine and run, which
    * is what a production curation pipeline needs from a clustering
    * signal). Every node starts as its own community; each round every
    * node adopts the most frequent label among its NEIGHBOURS, ties
    * broken by smallest label.
    *
    * Scale shape: per round one join of the (src-clustered, reused
    * exchange) edge list against the one-row-per-node label table plus
    * one partial-agg'd (dst, lbl) count and a bounded top-1 per node —
    * the same cost contract as a PageRank round; counts are exact longs,
    * so no float ties and the oracle can unroll rounds in SQL.
    */
  /** `earlyExit = false` (default) chains all rounds lazily into ONE
    * pipelined job sharing a single src-clustered edge exchange — the
    * right shape for the fixed small round counts production uses.
    * `earlyExit = true` materializes each round and stops as soon as a
    * round changes no label (the fixpoint is absorbing: an unchanged
    * label table reproduces the same neighbour counts, so every
    * remaining round is a no-op and the capped result is identical —
    * spec'd label-for-label in GraphScaleSpec). The probe costs one
    * job per round and forfeits the shared exchange, so it only pays
    * off when `rounds` is large relative to the graph's convergence
    * depth; at rounds=3 the chained shape measures faster.
    */
  def labelPropagation(edges: DataFrame, rounds: Int = 3,
                       earlyExit: Boolean = false): DataFrame = {
    val e = edges
      .select(col("id1").cast("long").as("id1"), col("id2").cast("long").as("id2"))
      .localCheckpoint()
    val sym = e.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(e.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
      .localCheckpoint()
      // every round joins on src then aggregates on dst; clustering the
      // reused edge exchange by SRC keeps the big side in place for the
      // join, and only (dst, lbl) count rows move afterwards
      .repartition(col("src"))
    def step(lbl: DataFrame): DataFrame = {
      val counts = sym.join(lbl, col("src") === col("node"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      graft.plans.TopKPerKey
        .topK(counts, "dst", Seq(("c", true), ("lbl", false)), 1)
        .select(col("dst").as("node"), col("lbl"))
    }
    var lbl = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    if (!earlyExit) {
      (1 to rounds).foreach(_ => lbl = step(lbl))
      lbl
    } else {
      lbl = lbl.localCheckpoint()
      var converged = false
      var i = 0
      while (!converged && i < rounds) {
        val next = step(lbl).localCheckpoint()
        val changed = next.alias("n")
          .join(lbl.alias("o"), col("n.node") === col("o.node"))
          .where(col("n.lbl") =!= col("o.lbl"))
          .limit(1).count()
        converged = changed == 0
        lbl = next
        i += 1
      }
      lbl
    }
  }
}
