package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.LongType

/** Whole-operator extension (the (c) tier of the design brief): top-k
  * rows per key with a dense `rank` column appended — the workhorse
  * behind every similarity top-k in this engine.
  *
  * The built-in formulation (`row_number() OVER (PARTITION BY key ORDER
  * BY ...)` + filter) must fully SORT every key group ON THE ORDERING
  * COLUMNS before it can rank — O(n log n) comparisons on the full
  * ordering and the whole group resident. This operator keeps a bounded
  * k-heap per key instead: O(n log k) ordering comparisons and k rows
  * resident, the difference between "sort 100 TB of candidate pairs"
  * and "stream them through fixed memory".
  *
  * Planning: the logical node declares nothing but children/output; the
  * injected [[GraftTopKStrategy]] plans it to [[TopKPerKeyExec]], whose
  * `requiredChildDistribution` asks Catalyst for clustering on the key —
  * the exchange is planned by Spark like any aggregation's, so AQE still
  * owns shuffle sizing. `requiredChildOrdering` additionally asks for a
  * key-grouped child (Spark plans a SPILLABLE SortExec on just the
  * grouping key), so group runs arrive contiguously and exactly ONE
  * k-heap is ever resident — memory stays O(k) at any key cardinality,
  * instead of one heap per distinct key per partition.
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                      child: LogicalPlan,
                      // constructor parameter (not a body val) so that
                      // optimizer copies keep the exprId stable — a fresh
                      // id per copy would orphan downstream references
                      rankAttr: AttributeReference =
                        AttributeReference("rank", LongType, nullable = false)())
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  // rank is produced here, not consumed — without this, CheckAnalysis
  // counts the constructor's AttributeReference as a missing input
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

class GraftTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      TopKPerKeyExec(t.k, t.keys, t.order, t.rankAttr, planLater(t.child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression],
                          order: Seq[SortOrder],
                          rankAttr: AttributeReference,
                          child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numInputRows" -> SQLMetrics.createMetric(sparkContext, "input rows"),
    "numKeys" -> SQLMetrics.createMetric(sparkContext, "distinct keys"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  /** Key-grouped input: Spark satisfies this with a spillable SortExec on
    * the grouping key ONLY (not the ordering columns), so high key
    * cardinality degrades to disk-backed sorting instead of an OOM in a
    * per-key heap map.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keys.map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val numInput = longMetric("numInputRows")
    val numKeys = longMetric("numKeys")
    val numOutput = longMetric("numOutputRows")
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val ord: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(order, childOutput)
      val outProj = UnsafeProjection.create(output, childOutput :+ rankAttr)
      val joined = new JoinedRow
      val rankRow = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(1)
      // rows arrive grouped by key (requiredChildOrdering): keep ONE
      // bounded heap for the current group, flush it on key change —
      // memory is O(k) regardless of key cardinality
      new Iterator[InternalRow] {
        private var groupOut: Iterator[InternalRow] = Iterator.empty
        private var pending: InternalRow = if (it.hasNext) it.next() else null

        private def advance(): Unit = {
          while (!groupOut.hasNext && pending != null) {
            val groupKey: UnsafeRow = keyProj(pending).copy()
            // head = worst retained row under `ord`
            val heap = mutable.PriorityQueue.empty[InternalRow](ord)
            var inGroup = true
            while (inGroup) {
              val row = pending
              numInput += 1
              if (heap.size < k) heap.enqueue(row.copy())
              else if (ord.compare(row, heap.head) < 0) {
                heap.dequeue()
                heap.enqueue(row.copy())
              }
              if (it.hasNext) {
                pending = it.next()
                inGroup = keyProj(pending) == groupKey
              } else {
                pending = null
                inGroup = false
              }
            }
            numKeys += 1
            val best = heap.dequeueAll.reverse // ascending under ord
            groupOut = best.iterator.zipWithIndex.map { case (row, i) =>
              rankRow.update(0, (i + 1).toLong)
              numOutput += 1
              outProj(joined(row, rankRow))
            }
          }
        }

        override def hasNext: Boolean = { advance(); groupOut.hasNext }
        override def next(): InternalRow = { advance(); groupOut.next() }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** User-facing constructor with a builtin fallback. */
object TopKPerKey {

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graftbridge.Bridge

  /** Top `k` rows per `keyCol`, ordered by `orderSpec` (column name,
    * descending?) with a `rank` column (long, 1-based). Uses the native
    * operator when GraftExtensions is active, else the window
    * row_number fallback — identical results (the ordering must be
    * total per key for that to hold; include tie-breaker columns).
    */
  def topK(df: DataFrame, keyCol: String,
           orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (Bridge.hasStrategy(spark, classOf[GraftTopKStrategy])) {
      val analyzed = Bridge.analyzed(df)
      def attr(name: String): Attribute =
        analyzed.output.find(_.name == name).getOrElse(
          throw new IllegalArgumentException(s"no column $name"))
      val sortOrders = orderSpec.map { case (name, desc) =>
        SortOrder(attr(name),
          if (desc) org.apache.spark.sql.catalyst.expressions.Descending
          else org.apache.spark.sql.catalyst.expressions.Ascending)
      }
      Bridge.ofRows(spark, TopKPerKey(k, Seq(attr(keyCol)), sortOrders, analyzed))
    } else {
      val cols = orderSpec.map { case (name, desc) =>
        if (desc) col(name).desc else col(name).asc
      }
      val w = Window.partitionBy(keyCol).orderBy(cols: _*)
      df.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= k)
    }
  }
}
