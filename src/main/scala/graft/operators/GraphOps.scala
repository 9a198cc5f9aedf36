package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster
  * step of a dedup pipeline: pairwise near-dup verdicts (LSH + verify)
  * must be collapsed into groups before one representative per group can
  * be kept; a pair list alone under-deletes (A~B, B~C but A!~C).
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labelled with itself; each round every node takes the minimum label
  * among itself and its neighbours; fixpoint = per-component minimum
  * everywhere. Each round is one join + one aggregation — fully
  * distributed, no driver-side graph. The driver only orchestrates
  * rounds and checks convergence (a `limit(1).count()` probe), which is
  * how iterative algorithms run on Spark generally (GraphX Pregel does
  * the same under the hood).
  *
  * Scale notes (100 TB): rounds needed = component diameter, and dedup
  * components are shallow (near-dup clusters are cliques-ish through
  * their shared buckets), so a handful of rounds suffices; `maxIter`
  * bounds adversarial chains. `localCheckpoint` after every round
  * truncates lineage — without it the plan doubles per round and
  * planning cost explodes by round ~10. Each round shuffles the edge
  * list once on the join key; the label table is one row per node.
  * (The log-diameter alternating large-star/small-star variant is the
  * published upgrade path for deep graphs; the hook is the same
  * signature.)
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
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
        .unionByName(labels)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint() // truncate lineage each round
      val changed = prop.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .where(col("n.lbl") =!= col("o.lbl"))
        .limit(1).count()
      labels = prop
      converged = changed == 0
      i += 1
    }
    labels.select(col("id"), col("lbl").as("component"))
  }
}
