package graft.sources.dsv2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => VExpression, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownOffset, SupportsPushDownRequiredColumns, SupportsPushDownTopN}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete custom DataSource V2 connector — the last rung of the
  * extension ladder (Expression → Aggregator → LogicalPlan+Strategy →
  * optimizer Rule → SOURCE): the seam a 100 TB deployment uses to mount
  * an internal storage/metadata system into Catalyst as a first-class
  * table, with the three scan-side contracts that make a source
  * cluster-grade rather than a driver-side iterator:
  *
  *   - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): the reader
  *     materializes only requested fields — a 2-column projection never
  *     pays for the wide row;
  *   - FILTER PUSHDOWN (`SupportsPushDownFilters`): range predicates on
  *     `id` narrow the generated interval BEFORE partition planning, so
  *     a selective scan plans fewer/smaller splits — the DSv2 analogue
  *     of parquet row-group skipping. Pushed filters are FULLY handled
  *     (not re-evaluated by Spark): correctness of the narrowing is
  *     oracle-checked, not just plan-shaped;
  *   - PARTITION PLANNING (`planInputPartitions`): the interval splits
  *     into `slices` contiguous ranges — the executor-parallel unit;
  *     each split knows its bounds, no shared driver state.
  *
  * The table itself is a deterministic synthetic row generator
  * (id, v = (id·1103515245 + 12345) mod 1 000 000, val = v/1000,
  * tag = 't' ++ id mod 5) — integer arithmetic a SQL oracle reproduces
  * exactly, which is what makes a custom SOURCE hash-checkable at all.
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // getTable receives options with their ORIGINAL casing — re-wrap so a
    // camelCase spelling can't silently fall to the default
    val opts = new CaseInsensitiveStringMap(properties)
    new RangeTable(
      opts.getLong("start", 0L),
      opts.getLong("end", 1000L),
      opts.getInt("slices", 8))
  }
}

object RangeSource {
  val schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("v", LongType, nullable = false)
    .add("val", DoubleType, nullable = false)
    .add("tag", StringType, nullable = false)

  def vOf(id: Long): Long =
    math.floorMod(id * 1103515245L + 12345L, 1000000L)
}

class RangeTable(start: Long, end: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range($start,$end)"
  override def schema(): StructType = RangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(start, end, slices)
}

/** Mutable narrowing state is the ScanBuilder idiom: Catalyst calls
  * pushFilters / pruneColumns, then build() snapshots into an immutable
  * Scan.
  */
class RangeScanBuilder(start: Long, end: Long, slices: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownOffset
    with SupportsPushDownTopN {
  private var lo = start
  private var hi = end
  private var pushed = Array.empty[Filter]
  private var required = RangeSource.schema
  private var aggFuncs: Option[Seq[String]] = None

  // ---- aggregate pushdown (the third scan-side contract): a global
  // COUNT/MIN/MAX over `id` is closed-form on a range — answered from
  // the (filter-narrowed) bounds without materializing a single row,
  // the DSv2 seam parquet footers / lake manifests answer count queries
  // through at 100 TB. Grouped or non-id aggregates decline the push
  // and fall back to the row scan.
  private def idRef(e: VExpression): Boolean = e match {
    case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
    case _ => false
  }
  private def encode(agg: Aggregation): Option[Seq[String]] =
    if (agg.groupByExpressions.nonEmpty) None
    else {
      val fs = agg.aggregateExpressions.toSeq.map {
        case _: CountStar => Some("count")
        case c: Count if !c.isDistinct && idRef(c.column) => Some("count")
        case m: Min if idRef(m.column) => Some("min")
        case m: Max if idRef(m.column) => Some("max")
        case _ => None
      }
      if (fs.forall(_.isDefined)) Some(fs.flatten) else None
    }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    encode(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean =
    encode(agg) match {
      case some @ Some(_) => aggFuncs = some; true
      case None => false
    }

  // ---- limit / offset / top-N pushdown: on an id-ordered range these
  // are pure interval arithmetic — LIMIT keeps the first n positions,
  // OFFSET skips the first n, and ORDER BY id [DESC] LIMIT n is the
  // first/last n of the interval with NO sort. The DSv2 analogue of
  // "read only the first row group": a `LIMIT 100` probe against a
  // 100 TB mount must not scan past its answer. Rows stay in generated
  // order and Spark re-applies the (now ≤n-row) sort/limit on top —
  // the push is a data-volume optimization, never a semantics change.
  //
  // CRITICAL ordering contract: V2ScanRelationPushDown runs aggregate
  // pushdown FIRST and then offers limit/offset on the SAME builder,
  // where they apply to the AGGREGATED output (one row here) — interval
  // arithmetic at that point would corrupt the closed-form answer
  // (count(*) with .limit(5) would report 5). Decline once an
  // aggregate is pushed.
  override def pushLimit(limit: Int): Boolean =
    aggFuncs.isEmpty && { hi = math.min(hi, lo + limit); true }
  override def pushOffset(offset: Int): Boolean =
    aggFuncs.isEmpty && { lo = math.min(hi, lo + offset); true }
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean =
    aggFuncs.isEmpty && (orders match {
      case Array(o) if idRef(o.expression) =>
        if (o.direction == SortDirection.ASCENDING)
          hi = math.min(hi, lo + limit)
        else lo = math.max(lo, hi - limit)
        true
      case _ => false
    })
  // partial push: rows stay in generated order and Spark re-applies the
  // (now <= n-row) sort/limit on top (inherited by both the Limit and
  // TopN traits — Scala requires the diamond be resolved explicitly)
  override def isPartiallyPushed(): Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("id", value: Long)        => lo = math.max(lo, value + 1)
      case GreaterThanOrEqual("id", value: Long) => lo = math.max(lo, value)
      case LessThan("id", value: Long)           => hi = math.min(hi, value)
      case LessThanOrEqual("id", value: Long)    => hi = math.min(hi, value + 1)
      case EqualTo("id", value: Long) =>
        lo = math.max(lo, value); hi = math.min(hi, value + 1)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    pushed ++= accepted
    residual // Spark re-evaluates only these
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = aggFuncs match {
    case Some(funcs) => RangeAggScan(lo, hi, funcs)
    case None        => RangeScan(lo, hi, slices, required)
  }
}

/** Completely-pushed global aggregate: one partition, one row, values
  * computed from the narrowed bounds in O(1). Empty range → count 0,
  * min/max NULL (SQL aggregate semantics).
  */
case class RangeAggScan(lo: Long, hi: Long, funcs: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType =
    funcs.zipWithIndex.foldLeft(new StructType()) { case (st, (f, i)) =>
      st.add(s"${f}_$i", LongType, nullable = f != "count")
    }
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRange [$lo, $hi) PushedAggregates=[${funcs.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(RangeInputPartition(0, 0))
  override def createReaderFactory(): PartitionReaderFactory = {
    val (l, h, fs) = (lo, hi, funcs)
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = !emitted && { emitted = true; true }
          override def get(): InternalRow = {
            val n = math.max(0L, h - l)
            InternalRow.fromSeq(fs.map {
              case "count" => n
              case "min"   => if (n == 0) null else l
              case "max"   => if (n == 0) null else h - 1
            })
          }
          override def close(): Unit = ()
        }
    }
  }
}

case class RangeScan(lo: Long, hi: Long, slices: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRange [$lo, $hi) slices=$slices cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, math.min(slices.toLong, math.max(0L, hi - lo)).toInt)
    (0 until n).map { i =>
      val a = lo + (hi - lo) * i / n
      val b = lo + (hi - lo) * (i + 1) / n
      RangeInputPartition(a, b): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required.fieldNames)
}

case class RangeInputPartition(a: Long, b: Long) extends InputPartition

/** Serialized to executors; builds rows holding ONLY the pruned columns,
  * in the requested order.
  */
class RangeReaderFactory(fieldNames: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val RangeInputPartition(a, b) = p
    new PartitionReader[InternalRow] {
      private var id = a - 1
      override def next(): Boolean = { id += 1; id < b }
      override def get(): InternalRow = {
        val v = RangeSource.vOf(id)
        InternalRow.fromSeq(fieldNames.toIndexedSeq.map {
          case "id"  => id
          case "v"   => v
          case "val" => v / 1000.0
          case "tag" => UTF8String.fromString("t" + (math.floorMod(id, 5L)))
          case other => throw new IllegalStateException(s"unknown col $other")
        })
      }
      override def close(): Unit = ()
    }
  }
}
