package graft.sources.dsv2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = start
  private var hi = end
  private var pushed = Array.empty[Filter]
  private var required = RangeSource.schema

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
  override def build(): Scan = RangeScan(lo, hi, slices, required)
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
