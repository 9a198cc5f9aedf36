package graft.sources.dsv2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Snapshot-version offset; `json` lands in the checkpoint log. `-1`
  * means "before the first commit", so batch (start, end] replays
  * manifests start+1 .. end.
  */
case class LakeVersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** Streaming read of a [[LakeTable]]: the [[LakeLog]] IS the
  * write-ahead log, so the stream's offsets are snapshot VERSIONS and a
  * micro-batch reads exactly the files the commits in its version range
  * ADDED — the change-data-feed-as-source design (Delta's streaming
  * source, Iceberg's incremental read). Contracts:
  *
  *   - restartable: the offset in the checkpoint is a version number;
  *     a restarted query resumes from the committed version with no
  *     replays and no gaps (manifests are immutable once published);
  *   - append-flowing: append/bootstrap/create commits stream through;
  *     a `dataChange=false` commit (compaction/clustering — same rows,
  *     new layout) is skipped NATIVELY, so table maintenance never
  *     disturbs consumers; a data-changing REPLACE commit (copy-on-write
  *     merge/update/delete) is not expressible as an append delta — it
  *     FAILS LOUD by default, or is skipped wholesale under
  *     `skipChangeCommits` (the same semantics Delta exposes) so
  *     downstream consumers at least keep their append-only invariant
  *     explicit;
  *   - bounded planning: each batch opens only the footers of its added
  *     files; column pruning and row-group stats narrowing apply per
  *     batch exactly as in the batch scan (shared
  *     [[LakeTableIO.planRowGroups]]).
  *
  * At scale a micro-batch is "the files commit N added" — planning cost
  * tracks the COMMIT size, never the table size.
  */
class LakeMicroBatchStream(dir: String, projected: StructType,
                           pushed: Array[Filter],
                           skipChangeCommits: Boolean = false,
                           startingVersion: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // AvailableNow pins the drain target at start; a live writer landing
  // more commits mid-run doesn't extend this execution
  @volatile private var target: Option[Long] = None

  private def headVersion: Long =
    LakeLog.current(dir).map(_.version).getOrElse(-1L)

  override def prepareForTriggerAvailableNow(): Unit =
    target = Some(headVersion)

  // a fresh checkpoint starts at `startingVersion` (inclusive — the
  // backfill cursor, a version id or tag via the startingVersion
  // option); a resumed query ignores this and reads its checkpoint
  override def initialOffset(): Offset =
    LakeVersionOffset(startingVersion.map(_ - 1).getOrElse(-1L))

  override def deserializeOffset(json: String): Offset =
    LakeVersionOffset(json.toLong)

  // admission control: at most `maxCommitsPerBatch` commits advance per
  // micro-batch, so a backlogged table (a week of commits after a
  // consumer outage) drains as a paced sequence of commit-sized batches
  // rather than one unbounded catch-up batch
  private val maxCommitsPerBatch = 8L

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LakeVersionOffset].v
    val head = target.getOrElse(headVersion)
    LakeVersionOffset(math.min(head, s + maxCommitsPerBatch))
  }

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "admission-control source: latestOffset(start, limit) is the entry point")

  override def reportLatestOffset(): Offset =
    LakeVersionOffset(target.getOrElse(headVersion))

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[LakeVersionOffset].v
    val b = end.asInstanceOf[LakeVersionOffset].v
    val added = (a + 1 to b).flatMap { v =>
      val snap = LakeLog.snapshotAt(dir, v)
      if (!snap.dataChange) Seq.empty // compaction/clustering: same rows,
                                      // new layout — nothing to emit
      else if (snap.removed.nonEmpty) {
        if (skipChangeCommits) Seq.empty
        else throw new IllegalStateException(
          s"streaming read of $dir hit replace commit v$v " +
            s"(${snap.operation}, removes ${snap.removed.size} files); " +
            "a copy-on-write rewrite has no append delta — set option " +
            "skipChangeCommits=true to skip such commits, or stream the " +
            "CDC view (LakeSnapshots.changes) instead")
      } else snap.added
    }
    LakeTableIO.planRowGroups(added.map(new Path(dir, _)),
      projected.fieldNames, pushed, pruneGroups = true).parts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeReaderFactory(projected)

  override def commit(offset: Offset): Unit = ()
  override def stop(): Unit = ()
}
