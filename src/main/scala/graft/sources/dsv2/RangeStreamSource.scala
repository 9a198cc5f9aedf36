package graft.sources.dsv2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The STREAMING half of the custom-source seam ([[RangeSource]] is the
  * batch half): a DataSource V2 `MicroBatchStream` with real offset
  * management and admission control — the contracts that make a custom
  * stream restartable and rate-bounded rather than a fire-hose:
  *
  *   - OFFSETS are plain row positions, serialized to the checkpoint log
  *     (`RangeOffset.json`) and re-hydrated on restart
  *     (`deserializeOffset`) — the source holds NO state the checkpoint
  *     doesn't: a killed query resumes from the committed offset with no
  *     duplicate and no gap (exactly-once with an idempotent sink);
  *   - ADMISSION CONTROL (`SupportsAdmissionControl.latestOffset(start,
  *     limit)`) caps each micro-batch at `batchRows` rows via the
  *     default `ReadLimit.maxRows` — a 100 TB backfill becomes a paced
  *     sequence of bounded batches instead of one unbounded one;
  *   - `SupportsTriggerAvailableNow` pins the run's END at
  *     `prepareForTriggerAvailableNow` time, so Trigger.AvailableNow
  *     drains exactly the data that existed at start across several
  *     bounded batches, then stops — the batch-as-stream shape the
  *     engine's other streaming queries use.
  *
  * Rows and splits are shared with the batch source (same generator
  * arithmetic, same `RangeInputPartition`/`RangeReaderFactory`), so one
  * oracle covers both halves.
  */
class RangeStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // getTable receives the options with their ORIGINAL casing (unlike
    // inferSchema's CaseInsensitiveStringMap), so a camelCase option like
    // `batchRows` silently falls to its default under a lowercase lookup
    // — re-wrap to make the lookup case-insensitive
    val opts = new CaseInsensitiveStringMap(properties)
    new RangeStreamTable(
      opts.getLong("end", 1000L),
      opts.getLong("batchrows", 100L),
      opts.getInt("slices", 8))
  }
}

class RangeStreamTable(end: Long, batchRows: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range_stream($end)"
  override def schema(): StructType = RangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = RangeSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new RangeMicroBatchStream(end, batchRows, slices)
      }
    }
}

/** Row-position offset; `json` is what lands in the checkpoint log. */
case class RangeOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

class RangeMicroBatchStream(end: Long, batchRows: Long, slices: Int)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // pinned by prepareForTriggerAvailableNow: AvailableNow drains to the
  // end that existed at start, even if a live source kept growing
  private var target: Long = end

  override def prepareForTriggerAvailableNow(): Unit = { target = end }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)

  override def initialOffset(): Offset = RangeOffset(0L)
  override def deserializeOffset(json: String): Offset =
    RangeOffset(json.toLong)

  // admission-control path — the only latestOffset Spark calls for a
  // SupportsAdmissionControl source
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[RangeOffset].v
    val cap = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _              => batchRows
    }
    RangeOffset(math.min(target, s + cap))
  }
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "admission-control source: latestOffset(start, limit) is the entry point")
  override def reportLatestOffset(): Offset = RangeOffset(target)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[RangeOffset].v
    val b = end.asInstanceOf[RangeOffset].v
    val n = math.max(1, math.min(slices.toLong, math.max(0L, b - a)).toInt)
    (0 until n).map { i =>
      RangeInputPartition(a + (b - a) * i / n, a + (b - a) * (i + 1) / n): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(RangeSource.schema.fieldNames)

  override def commit(offset: Offset): Unit = ()
  override def stop(): Unit = ()
}
