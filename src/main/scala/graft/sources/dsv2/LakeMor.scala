package graft.sources.dsv2

import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, SupportsDelta, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** MERGE-ON-READ row-level operation ([[SupportsDelta]] — Spark's
  * delta-based rewrite, the plan Iceberg's position deltas use):
  * instead of copying whole affected files (the group-based
  * [[LakeRowLevelOperation]]), the write emits a STREAM of row-level
  * actions — inserts become ordinary new data files, deletes become
  * DELETION-VECTOR positions keyed by the row's `(_file, _pos)`
  * identity (the reserved metadata columns every [[LakeTable]] scan
  * can synthesize), and updates are represented as delete+insert.
  * Commit publishes the insert files and one DV sidecar per touched
  * data file, sealed by a single manifest whose `dvs` map readers
  * subtract at scan time.
  *
  * Write amplification flips accordingly: a DELETE of k rows costs
  * O(k) positions instead of rewriting every covered file — the right
  * trade for sparse deletes over huge tables; read-side cost is the DV
  * subtraction until `CALL system.rewrite_deletes` materializes it.
  *
  * The target scan is the ORDINARY [[LakeScanBuilder]]: column pruning
  * and residual filters apply (only rows matching the condition are
  * even candidates), existing DVs are subtracted (an already-deleted
  * row can't be deleted twice), and Spark projects the rowId metadata
  * columns itself.
  */
class LakeMorOperation(table: LakeTable,
                       cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(LakeTableIO.MetaFile),
      Expressions.column(LakeTableIO.MetaPos))

  // updates flow as delete + (re)insert — one writer path, and the
  // rewritten row lands in a fresh file like any insert
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeScanBuilder(table.dir, table.schema, None, branch = table.branch)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new LakeDeltaWrite(table.dir, info.schema(),
          cmd.toString.toLowerCase(java.util.Locale.ROOT) + "_mor",
          table.branch)
    }
}

/** One task's outcome: at most one staged insert file plus this task's
  * deletion positions per data file.
  */
case class LakeDeltaMessage(stagedPath: String, rows: Long,
                            deletes: Map[String, Array[Long]])
    extends WriterCommitMessage

class LakeDeltaWrite(dir: String, rowSchema: StructType, opName: String,
                     branch: Option[String]) extends DeltaWrite {
  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    override def createBatchWriterFactory(
        info: PhysicalWriteInfo): DeltaWriterFactory =
      new LakeDeltaWriterFactory(dir, rowSchema)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(dir).getFileSystem(new Configuration())
      val msgs = messages.collect { case m: LakeDeltaMessage => m }
      // publish insert files (stage-then-publish, as the batch write)
      val published = msgs.filter(_.stagedPath != null).map { m =>
        val dest = new Path(dir, s"part-${UUID.randomUUID()}.parquet")
        if (!fs.rename(new Path(m.stagedPath), dest))
          throw new java.io.IOException(
            s"failed to publish ${m.stagedPath} -> $dest")
        (dest.getName, m.rows)
      }
      // merge deletes across tasks; ONE DV sidecar per touched file
      val merged = mutable.Map.empty[String, mutable.ArrayBuffer[Long]]
      msgs.foreach(_.deletes.foreach { case (f, ps) =>
        merged.getOrElseUpdate(f, mutable.ArrayBuffer.empty) ++= ps
      })
      val dvAdded: Map[String, Seq[String]] = merged.map { case (f, ps) =>
        val distinct = ps.distinct.sorted.toSeq
        f -> Seq(LakeDv.write(dir, f, distinct))
      }.toMap
      if (published.isEmpty && dvAdded.isEmpty) return // no-op DML
      try LakeLog.commit(dir, opName, published.map(_._1).toSeq,
        Seq.empty, published.map(_._2).sum, branch = branch,
        dvAdded = dvAdded)
      catch {
        case e: Throwable =>
          // conflict (a covered file was rewritten concurrently): the
          // published inserts and freshly-written DVs are in no
          // manifest — remove them and abort loud
          published.foreach { case (n, _) =>
            try fs.delete(new Path(dir, n), false)
            catch { case _: java.io.IOException => () }
          }
          dvAdded.values.flatten.foreach { n =>
            try fs.delete(new Path(dir, n), false)
            catch { case _: java.io.IOException => () }
          }
          throw e
      }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(dir).getFileSystem(new Configuration())
      messages.collect {
        case m: LakeDeltaMessage if m.stagedPath != null =>
          try fs.delete(new Path(m.stagedPath), false)
          catch { case _: java.io.IOException => () }
      }
    }
  }
}

class LakeDeltaWriterFactory(dir: String, rowSchema: StructType)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      // inserts reuse the ordinary stage-then-publish parquet writer
      private val inner = new LakeWriterFactory(dir, rowSchema)
        .createWriter(partitionId, taskId)
      private var insertedAny = false
      private val deletes =
        mutable.Map.empty[String, mutable.ArrayBuffer[Long]]

      override def insert(row: InternalRow): Unit = {
        insertedAny = true
        inner.write(row)
      }

      /** `id` carries the rowId projection `(_file, _pos)` in
        * [[LakeMorOperation.rowId]] order.
        */
      override def delete(metadata: InternalRow, id: InternalRow): Unit = {
        val file = id.getUTF8String(0).toString
        val pos = id.getLong(1)
        deletes.getOrElseUpdate(file, mutable.ArrayBuffer.empty) += pos
      }

      override def update(metadata: InternalRow, id: InternalRow,
                          row: InternalRow): Unit =
        throw new IllegalStateException(
          "updates are represented as delete+insert " +
            "(representUpdateAsDeleteAndInsert=true)")

      override def commit(): WriterCommitMessage = {
        val m = inner.commit().asInstanceOf[LakeFileMessage]
        LakeDeltaMessage(if (insertedAny) m.stagedPath else null,
          m.rows, deletes.view.mapValues(_.toArray).toMap)
      }
      override def abort(): Unit = inner.abort()
      override def close(): Unit = inner.close()
    }
}
