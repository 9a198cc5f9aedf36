package graft.operators

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.dsv2.{LakeLog, LakePartitioning, LakeTableIO}

/** Table-maintenance surface over a [[graft.sources.dsv2.LakeTable]]'s
  * snapshot log — the operations a lakehouse user runs daily next to
  * their queries: audit history, row-level change capture between
  * versions, rollback, and history expiry.
  *
  * All of it is LOG work: `history` renders manifests (driver-side
  * metadata, O(versions) not O(data)); `changes` reads ONLY the files
  * that changed hands between two snapshots — at 100 TB a CDC pull for
  * one commit reads that commit's files, never the table.
  */
object LakeSnapshots {

  /** One tuple per committed version — the single source the DataFrame
    * AND the CALL-procedure renderings of the audit trail both map from
    * (they drifted once; never again).
    */
  def historyRows(dir: String): Seq[(Long, String, Int, Int, Int, Long,
      Boolean)] =
    LakeLog.versions(dir).map(LakeLog.snapshotAt(dir, _))
      .map(s => (s.version, s.operation, s.files.size, s.added.size,
        s.removed.size, s.addedRows, s.dataChange))

  /** One row per committed version: the audit trail. */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    historyRows(dir)
      .toDF("version", "operation", "n_files", "n_added", "n_removed",
        "added_rows", "data_change")
  }

  /** Row-level changes between two snapshots, computed from the file
    * sets alone: rows in files the range ADDED minus rows in files it
    * REMOVED are inserts; the converse are deletes (an update surfaces
    * as its delete+insert pair — standard CDC without a key contract).
    * Carry-over rows of a copy-on-write rewrite appear in both file
    * sets and cancel in the `exceptAll`, so only true changes surface.
    */
  def changes(spark: SparkSession, dir: String, fromVersion: Long,
              toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"changes($fromVersion -> $toVersion): range must go forward")
    // an equality-delete commit changes NO files, so a file-diff feed
    // would silently MISS its deleted rows; loud until retired (a
    // rewrite materializes them as ordinary file replacements)
    ((fromVersion + 1) to toVersion).foldLeft(
      LakeLog.snapshotAtPruned(dir, fromVersion, None, _ => false).eqs) {
      (prev, v) =>
        val cur = LakeLog.snapshotAtPruned(dir, v, None, _ => false).eqs
        require(prev == cur,
          s"graft_lake $dir: version $v changed the equality-delete " +
            "set — the change feed cannot represent equality-delete " +
            "commits; CALL system.rewrite_deletes and diff across the " +
            "rewrite instead")
        cur
    }
    val from = LakeLog.snapshotAt(dir, fromVersion)
    val to = LakeLog.snapshotAt(dir, toVersion)
    val before = from.files.toSet
    val after = to.files.toSet
    val schema = LakeTableIO.tableSchema(dir)
    // a file's LIVE rows at a version = its bytes minus that version's
    // deletion-vector positions; reading through the stock parquet
    // source with `_metadata.row_index` gives the same position
    // semantics the connector reader uses (its `_pos` IS the parquet
    // row index)
    def dvDf(snap: graft.sources.dsv2.LakeLog.Snapshot,
             names: Seq[String]): DataFrame = {
      val rows = names.flatMap(f => snap.dvs.get(f).toSeq.flatMap(dvs =>
        graft.sources.dsv2.LakeDv.positions(dir, dvs).map(p => (f, p))))
      if (rows.isEmpty)
        spark.createDataFrame(Seq.empty[(String, Long)])
          .toDF("__f", "__p")
      else spark.createDataFrame(rows).toDF("__f", "__p")
    }
    def readLive(snap: graft.sources.dsv2.LakeLog.Snapshot,
                 names: Seq[String]): DataFrame =
      if (names.isEmpty)
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], schema)
      else {
        val raw = spark.read.schema(schema)
          .parquet(names.map(n => s"$dir/$n"): _*)
        if (names.forall(n => !snap.dvs.contains(n))) raw
        else raw
          .withColumn("__f", col("_metadata.file_name"))
          .withColumn("__p", col("_metadata.row_index"))
          .join(broadcast(dvDf(snap, names)), Seq("__f", "__p"),
            "left_anti")
          .drop("__f", "__p")
      }
    val newRows = readLive(to, (after -- before).toSeq.sorted)
    val oldRows = readLive(from, (before -- after).toSeq.sorted)
    // merge-on-read deltas: positions DV'd between the two versions on
    // files present in BOTH are row-level DELETES (DV sets only grow
    // while a file survives — a replace retires file and DVs together)
    val common = (before intersect after).toSeq.sorted
    val dvDeltaRows = common.flatMap { f =>
      val pBefore = from.dvs.get(f).map(d =>
        graft.sources.dsv2.LakeDv.positions(dir, d).toSet)
        .getOrElse(Set.empty)
      val pAfter = to.dvs.get(f).map(d =>
        graft.sources.dsv2.LakeDv.positions(dir, d).toSet)
        .getOrElse(Set.empty)
      (pAfter -- pBefore).toSeq.sorted.map(p => (f, p))
    }
    val dvDeleted =
      if (dvDeltaRows.isEmpty)
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], schema)
      else {
        val files = dvDeltaRows.map(_._1).distinct.sorted
        spark.read.schema(schema)
          .parquet(files.map(n => s"$dir/$n"): _*)
          .withColumn("__f", col("_metadata.file_name"))
          .withColumn("__p", col("_metadata.row_index"))
          .join(broadcast(
            spark.createDataFrame(dvDeltaRows).toDF("__f", "__p")),
            Seq("__f", "__p"), "left_semi")
          .drop("__f", "__p")
      }
    newRows.exceptAll(oldRows).withColumn("change_type", lit("insert"))
      .unionByName(
        oldRows.exceptAll(newRows).withColumn("change_type", lit("delete")))
      .unionByName(dvDeleted.withColumn("change_type", lit("delete")))
  }

  /** Restore the table to `version` as a NEW commit (history preserved). */
  def rollback(dir: String, version: Long): Long =
    LakeLog.rollback(dir, version).version

  /** Drop all but the newest `keepLast` snapshots (tagged ones survive)
    * and delete data files nothing retained references and older than
    * the grace window (see [[LakeLog.defaultExpireGraceMs]] — the guard
    * against vacuuming a concurrent writer's just-published,
    * not-yet-committed file). Returns (expired manifests, deleted
    * files).
    */
  def expire(dir: String, keepLast: Int): (Int, Int) =
    LakeLog.expire(dir, keepLast)

  def expire(dir: String, keepLast: Int, graceMs: Long): (Int, Int) =
    LakeLog.expire(dir, keepLast, graceMs)

  /** Maintenance rewrites stage through Spark's parquet writer, whose
    * default `outputTimestampType` is INT96 — an encoding the
    * connector's reader deliberately rejects. Without this pin, ONE
    * compact/zorder of a TIMESTAMP-typed table would pass its row-count
    * check, publish, and leave the table unreadable through the
    * connector. Scoped set-and-restore: maintenance is a foreground
    * single operation on the calling session.
    */
  private def withMicrosTimestamps[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Delete just-published files after a failed log commit: their names
    * are fresh UUIDs referenced by no manifest, so removing them cannot
    * affect any reader — without this, a lost commit race leaks the
    * whole rewrite onto disk until an expire.
    */
  private def unpublish(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                        names: Seq[String]): Unit =
    names.foreach(n =>
      try fs.delete(new Path(dir, n), false)
      catch { case _: java.io.IOException => () })

  /** Group file names by their hidden-partitioning tuple (None =
    * tuple-less / unpartitioned). Every maintenance rewrite operates
    * WITHIN these groups: a rewritten file inherits its group's tuple,
    * so partition pruning, storage-partitioned joins, and dynamic
    * overwrite survive compaction — mixing partitions in one output
    * file would silently discard the layout DML paid to create.
    */
  private def byTuple(parts: Map[String, Seq[String]],
                      files: Seq[String])
      : Seq[(Option[Seq[String]], Seq[String])] =
    files.groupBy(parts.get).toSeq.sortBy(_._2.head)

  /** Rewrite the table clustered by the interleaved z-value of `cols`
    * (numeric), as a `dataChange=false` commit — same rows, new layout
    * with tight per-file/row-group min-max rectangles on EVERY listed
    * dimension, so footer-stats pruning works for predicates on any of
    * them (a single-column sort clusters one dim and scatters the
    * rest). The min/max handshake is one metadata-scale aggregate;
    * everything else is integer shifts. On a partitioned table the
    * clustering runs per partition (`targetFiles` spreads across
    * partitions proportionally to bytes). Returns
    * (files before, files after).
    */
  def zorder(spark: SparkSession, dir: String, cols: Seq[String],
             targetFiles: Int): (Int, Int) = {
    require(cols.nonEmpty && cols.size <= 4,
      s"zorder takes 1-4 numeric columns, got ${cols.size}")
    require(targetFiles >= 1, s"targetFiles must be >= 1: $targetFiles")
    val head = LakeLog.current(dir).getOrElse(throw new IllegalStateException(
      s"$dir has no snapshot log to cluster"))
    // the plain parquet rewrite cannot subtract equality deletes, and
    // its outputs' fresh add versions would detach them from every
    // live ref — deleted rows would resurrect. Same remedy as DVs.
    require(head.eqs.isEmpty,
      s"graft_lake $dir holds live equality deletes — CALL " +
        "system.rewrite_deletes before zorder")
    if (head.files.isEmpty) return (0, 0)
    val fs = new Path(dir).getFileSystem(new Configuration())
    // files carrying deletion vectors are excluded — the plain parquet
    // rewrite below cannot subtract DV positions, and the replace
    // commit retires a replaced file's DVs, so clustering a DV'd file
    // would silently RESURRECT its deleted rows (under dataChange=false,
    // invisible to streams/CDC). Same guard as compact: rewriteDeletes
    // is the pass that materializes DVs first, after which those files
    // cluster normally.
    val zFiles = head.files.filterNot(head.dvs.contains)
    if (zFiles.isEmpty) return (head.files.size, head.files.size)
    val srcRows = LakeTableIO.footerRows(zFiles.map(new Path(dir, _)))
    // 16 bits/dim caps the z at 2^32 well inside Long; `1L <<` because
    // the single-column case (bits=32 under the old Int math) wrapped
    // (1 << 32) - 1 to 0 and normalized every row to bucket zero
    val bits = math.min(16, 32 / cols.size)
    // derived-column names carry a fresh UUID so a user column can
    // never collide: a table legitimately named `__z` used to have its
    // DATA silently replaced by z-values under a dataChange=false
    // commit — the worst kind of corruption
    val tag = UUID.randomUUID().toString.replace("-", "")
    def lo(i: Int) = s"__lo_${tag}_$i"
    def hi(i: Int) = s"__hi_${tag}_$i"
    val zCol = s"__zval_$tag"
    // old evolution vintages — and tuple-less files in a partitioned
    // table — MIGRATE to the current layout like compact does (same
    // connector-writer staging), so zorder leaves a uniform
    // current-spec table: pre-clustered by expression mirrors of the
    // transforms and z-SORTED within, each migrated partition comes
    // out clustered on every listed dimension too
    val specs = LakePartitioning.specsOf(dir)
    val partitioned = specs.nonEmpty && specs.last.nonEmpty
    def isCurrentLayout(f: String): Boolean =
      !partitioned || head.parts.get(f).exists { t =>
        val (id, slots) = LakePartitioning.splitTuple(t)
        id == specs.length - 1 && slots.length == specs.last.length
      }
    val migrate = zFiles.filterNot(isCurrentLayout)
    val groups = byTuple(head.parts, zFiles.filter(isCurrentLayout))
    val sizeOf = zFiles.map(f =>
      f -> fs.getFileStatus(new Path(dir, f)).getLen).toMap
    val totalBytes = math.max(1L, sizeOf.values.sum)
    val stage = new Path(dir, s".zorder-${UUID.randomUUID()}")
    // ONE z-value definition for every rewrite this call does (min/max
    // normalized over the given frame): the in-layout groups and the
    // migrated vintages must cluster under the same encoding, and the
    // encoding carries history (the `1L <<` Int-wrap fix above) that
    // must never fork
    def withZ(df: DataFrame): DataFrame = {
      val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(min(c).cast("double").as(lo(i)),
          max(c).cast("double").as(hi(i)))
      }
      val mm = df.agg(aggs.head, aggs.tail: _*)
      val n = df.crossJoin(broadcast(mm))
      val normed = cols.zipWithIndex.map { case (c, i) =>
        floor((col(c).cast("double") - col(lo(i))) *
          lit((1L << bits) - 1) /
          greatest(col(hi(i)) - col(lo(i)), lit(1.0d))).cast("long")
      }
      val z = (0 until bits).flatMap(b => normed.zipWithIndex.map {
        case (nc, d) =>
          shiftleft(shiftright(nc, b).bitwiseAND(1), b * cols.size + d)
      }).reduce(_ + _)
      n.withColumn(zCol, z)
    }
    try {
      // cluster WITHIN each partition group (min/max normalization per
      // group — tighter rectangles than global bounds anyway); the
      // single-group case is the unpartitioned table
      val stagedByGroup = groups.zipWithIndex.map {
        case ((tuple, files), gi) =>
          val df = spark.read.schema(LakeTableIO.tableSchema(dir))
            .parquet(files.map(f => s"$dir/$f"): _*)
          val nOut = math.max(1, math.round(targetFiles.toDouble *
            files.map(sizeOf).sum / totalBytes).toInt)
          val gStage = new Path(stage, s"g$gi")
          withMicrosTimestamps(spark) {
            withZ(df)
              .repartitionByRange(nOut, col(zCol))
              .sortWithinPartitions(zCol)
              .select(df.columns.map(col): _*)
              .write.parquet(gStage.toString)
          }
          val staged = fs.listStatus(gStage).toSeq
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .map(_.getPath)
          (tuple, staged)
      }
      // layout migration: old vintages rewrite THROUGH the connector
      // writer (rows split per current-spec tuple), pre-clustered by
      // transform mirrors and z-sorted within each cluster — the
      // writer computes the authoritative tuple per row, so a mirror
      // bug could only cost extra files, never misplace a row
      val stagedMigrated: Seq[(Path, Option[Seq[String]])] =
        if (migrate.isEmpty) Seq.empty
        else {
          val schema = LakeTableIO.tableSchema(dir)
          val boundSpec = LakePartitioning.bind(specs.last, schema)
          val df = spark.read.schema(schema)
            .parquet(migrate.map(f => s"$dir/$f"): _*)
          val nOut = math.max(1, math.round(targetFiles.toDouble *
            migrate.map(sizeOf).sum / totalBytes).toInt)
          val cl = clusterExprs(boundSpec)
          val clustered = withZ(df)
            .repartition(nOut, cl: _*)
            .sortWithinPartitions(cl :+ col(zCol): _*)
            .select(df.columns.map(col): _*)
          withMicrosTimestamps(spark) {
            LakeTableIO.stageThroughConnector(clustered, dir)
          }.map(s => (new Path(s.stagedPath), s.tuple))
        }
      val allStaged: Seq[(Path, Option[Seq[String]])] =
        stagedByGroup.flatMap { case (tuple, staged) =>
          staged.map(p => (p, tuple))
        } ++ stagedMigrated
      val stagedRows = LakeTableIO.footerRows(allStaged.map(_._1))
      require(stagedRows == srcRows,
        s"zorder would lose rows: staged $stagedRows != source $srcRows")
      val published = allStaged.map { case (p, tuple) =>
        val dest = new Path(dir, s"part-${UUID.randomUUID()}.parquet")
        if (!fs.rename(p, dest))
          throw new java.io.IOException(s"failed to publish $p -> $dest")
        (dest.getName, tuple)
      }
      try LakeLog.commit(dir, s"zorder(${cols.mkString(",")})",
        published.map(_._1), zFiles, addedRows = 0L,
        dataChange = false,
        addedParts = published.collect {
          case (n, Some(t)) => n -> t
        }.toMap,
        // an eq ref committed mid-zorder would be detached from the
        // rewritten rows (deleted rows resurrect) — re-checked per
        // publish attempt, the rewrite_deletes eqGuard's twin
        prePublish = () => graft.sources.dsv2.LakeEq
          .requireStillNone(dir, None, "zorder"))
      catch { case e: Throwable =>
        unpublish(fs, dir, published.map(_._1)); throw e }
      (head.files.size, head.files.size - zFiles.size + published.size)
    } finally fs.delete(stage, true)
  }

  /** Bin small files into ~`targetBytes` ones as a `dataChange=false`
    * commit — same rows, new layout, so incremental consumers (the
    * streaming source) skip it natively and time travel still sees the
    * old layout. Files already at/above target are left alone; row
    * preservation is asserted from parquet FOOTERS (metadata, not a
    * data pass) before the commit publishes. Returns
    * (files before, files after).
    *
    * Racing writers are safe: a concurrent rewrite of a compacted file
    * makes the log commit CONFLICT (covered files no longer current),
    * and the staged output is abandoned — compaction can lose a race,
    * never rows.
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val head = LakeLog.current(dir).getOrElse(throw new IllegalStateException(
      s"$dir has no snapshot log to compact"))
    // merged outputs get a fresh add version past every live eq ref —
    // compacting under live equality deletes would resurrect deleted
    // rows (and the raw rewrite cannot subtract them). Same guard
    // class as DV'd files, lifted to the whole pass for sequencing.
    require(head.eqs.isEmpty,
      s"graft_lake $dir holds live equality deletes — CALL " +
        "system.rewrite_deletes before compact")
    val fs = new Path(dir).getFileSystem(new Configuration())
    val sized = head.files.map(f =>
      f -> fs.getFileStatus(new Path(dir, f)).getLen)
    // files carrying deletion vectors are excluded: their FOOTER row
    // counts include dead rows, so the exact row-preservation check
    // below cannot hold — rewriteDeletes is the maintenance pass that
    // materializes them first (after which they compact normally)
    val small = sized.filter(_._2 < targetBytes)
      .filterNot { case (f, _) => head.dvs.contains(f) }
    // current-layout groups bin WITHIN their partition (merging across
    // partitions would strip the merged file of any tuple; a group
    // with one small file has nothing to merge). Files of an OLD
    // evolution vintage — or tuple-less ones in a partitioned table —
    // MIGRATE to the current layout instead, regardless of size:
    // compaction is the pass that makes a post-evolution table uniform
    // again (re-enabling dynamic overwrite and SPJ grouping).
    val specs = LakePartitioning.specsOf(dir)
    val partitioned = specs.nonEmpty && specs.last.nonEmpty
    def isCurrentLayout(f: String): Boolean =
      !partitioned || head.parts.get(f).exists { t =>
        val (id, slots) = LakePartitioning.splitTuple(t)
        id == specs.length - 1 && slots.length == specs.last.length
      }
    val migrate = head.files
      .filter(f => partitioned && !isCurrentLayout(f))
      .filterNot(head.dvs.contains)
    val groups = byTuple(head.parts,
      small.map(_._1).filter(isCurrentLayout)).filter(_._2.size >= 2)
    if (groups.isEmpty && migrate.isEmpty)
      return (head.files.size, head.files.size)
    val sizeOf = sized.toMap
    val compacted = groups.flatMap(_._2) ++ migrate
    val srcRows = LakeTableIO.footerRows(compacted.map(new Path(dir, _)))
    val stage = new Path(dir, s".compact-${UUID.randomUUID()}")
    try {
      // a declared write sort order ([[LakeTableIO.SortColsKey]]) is a
      // LAYOUT INVARIANT: compaction merges by range + within-file sort
      // instead of round-robin, so the merged files stay range-disjoint
      // and internally sorted — otherwise the maintenance pass would
      // destroy the very layout the pruning stack rides on
      val sortCols = LakeTableIO.sortColumnsOf(dir)
      val stagedByGroup = groups.zipWithIndex.map {
        case ((tuple, files), gi) =>
          val nOut = math.max(1, math.ceil(
            files.map(sizeOf).sum.toDouble / targetBytes).toInt)
          val gStage = new Path(stage, s"g$gi")
          withMicrosTimestamps(spark) {
            val merged = spark.read.schema(LakeTableIO.tableSchema(dir))
              .parquet(files.map(f => s"$dir/$f"): _*)
            val shaped =
              if (sortCols.isEmpty) merged.repartition(nOut)
              else merged
                .repartitionByRange(nOut, sortCols.map(col): _*)
                .sortWithinPartitions(sortCols.map(col): _*)
            shaped.write.parquet(gStage.toString)
          }
          fs.listStatus(gStage).toSeq
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .map(s => (s.getPath, tuple))
      }
      // layout migration: rewrite THROUGH the connector writer (rows
      // split per current-spec tuple), pre-clustered by expression
      // mirrors of the transforms so each task holds whole partitions
      val stagedMigrated: Seq[(Path, Option[Seq[String]])] =
        if (migrate.isEmpty) Seq.empty
        else {
          val schema = LakeTableIO.tableSchema(dir)
          val bound = LakePartitioning.bind(specs.last, schema)
          val nOut = math.max(1, math.ceil(
            migrate.map(f => sizeOf.getOrElse(f,
              fs.getFileStatus(new Path(dir, f)).getLen))
              .sum.toDouble / targetBytes).toInt)
          val df0 = spark.read.schema(schema)
            .parquet(migrate.map(f => s"$dir/$f"): _*)
          val clustered0 =
            df0.repartition(nOut, clusterExprs(bound): _*)
          // within each task: group by tuple, then the declared sort —
          // migrated files come out sorted too
          val clustered =
            if (sortCols.isEmpty) clustered0
            else clustered0.sortWithinPartitions(
              (clusterExprs(bound) ++ sortCols.map(col)): _*)
          withMicrosTimestamps(spark) {
            LakeTableIO.stageThroughConnector(clustered, dir)
          }.map(s => (new Path(s.stagedPath), s.tuple))
        }
      val allStaged = stagedByGroup.flatten ++ stagedMigrated
      val stagedRows = LakeTableIO.footerRows(allStaged.map(_._1))
      require(stagedRows == srcRows,
        s"compaction would lose rows: staged $stagedRows != source $srcRows")
      val published = allStaged.map { case (p, tuple) =>
        val dest = new Path(dir, s"part-${UUID.randomUUID()}.parquet")
        if (!fs.rename(p, dest))
          throw new java.io.IOException(s"failed to publish $p -> $dest")
        (dest.getName, tuple)
      }
      try LakeLog.commit(dir, "compact", published.map(_._1), compacted,
        addedRows = 0L, dataChange = false,
        addedParts = published.collect {
          case (n, Some(t)) => n -> t
        }.toMap,
        // same mid-operation eq guard as zorder/rewrite_deletes: the
        // merged outputs' fresh add versions would escape a ref
        // committed during the (long) rewrite window
        prePublish = () => graft.sources.dsv2.LakeEq
          .requireStillNone(dir, None, "compact"))
      catch { case e: Throwable =>
        unpublish(fs, dir, published.map(_._1)); throw e }
      (head.files.size, head.files.size - compacted.size + published.size)
    } finally {
      fs.delete(stage, true)
      // failed migrations leave staged files under _staging — the
      // expire vacuum's usual territory; nothing to do here
    }
  }

  /** Spark-expression CLUSTERING mirrors of the transforms — rows with
    * equal tuples land in one task, so the connector writer emits one
    * file per partition. Only co-location is needed (same tuple ⇒ same
    * expression value); the writer computes the authoritative tuple
    * per row, so even a wrong mirror could only cost extra files,
    * never misplace a row. The bucket mirror `pmod(hash, n)` is pinned
    * EQUAL to the writer's hash in LakePartitionSpec.
    */
  private def clusterExprs(
      bound: Seq[graft.sources.dsv2.LakePartitioning.Bound])
      : Seq[org.apache.spark.sql.Column] = {
    import graft.sources.dsv2.LakePartitioning._
    import org.apache.spark.sql.types.{DateType, StringType}
    bound.map { b =>
      val c = col(b.t.col)
      b.t match {
        case _: PIdentity => c
        case PBucket(n, _) => pmod(hash(c), lit(n))
        case PTruncate(w, _) => b.srcType match {
          case StringType => substring(c, 1, w)
          case _          => c - pmod(c, lit(w))
        }
        case _: PDays => b.srcType match {
          case DateType => c
          case _        => date_trunc("DAY", c)
        }
        case _: PMonths => b.srcType match {
          case DateType => trunc(c, "month")
          case _        => date_trunc("MONTH", c)
        }
        case _: PYears => b.srcType match {
          case DateType => trunc(c, "year")
          case _        => date_trunc("YEAR", c)
        }
        case _: PHours => date_trunc("HOUR", c)
      }
    }
  }

  /** Materialize merge-on-read deletion vectors: every DV'd data file
    * is rewritten with its dead positions dropped, replacing the file
    * (and, by [[graft.sources.dsv2.LakeLog.commit]]'s replace
    * semantics, retiring its DVs) in one `dataChange=false` commit —
    * live rows are IDENTICAL before and after, verified against the
    * DV-adjusted footer counts, so streaming consumers skip it like
    * any compaction. Returns (files rewritten, positions materialized).
    * This is the read-cost reclamation pass MOR tables run periodically
    * (Delta's PURGE, Iceberg's rewrite_position_delete_files).
    */
  def rewriteDeletes(spark: SparkSession, dir: String): (Int, Long) = {
    import graft.sources.dsv2.LakeEq
    val head = LakeLog.current(dir).getOrElse(throw new IllegalStateException(
      s"$dir has no snapshot log"))
    if (head.dvs.isEmpty && head.eqs.isEmpty) return (0, 0L)
    val fs = new Path(dir).getFileSystem(new Configuration())
    val schema = LakeTableIO.tableSchema(dir)
    val stage = new Path(dir, s".rewrite-dv-${UUID.randomUUID()}")
    // EQUALITY-DELETE retirement: every file a live ref applies to
    // (sequencing rule) rewrites with its matching keys subtracted;
    // the commit then retires the WHOLE ref list — remaining files
    // provably predate no ref, rewritten files get a fresh add version
    // past every ref. Sequenceability is a precondition, loud.
    LakeEq.requireSequenceable(dir, head.eqs, head.files, head.stats)
    val eqTableCols = LakeTableIO.columnRefs(schema)
    val eqApplicable: Map[String, Seq[String]] =
      if (head.eqs.isEmpty) Map.empty
      else head.files.iterator.map { f =>
        // key-statistics scoping ([[LakeEq.scopedApplicable]]): a file
        // whose key-column bounds/blooms provably hold none of a ref's
        // keys need not rewrite — retiring the ref cannot resurrect
        // anything there. Same scope the scan attaches and the
        // `db.t.deletes` inventory advertises.
        f -> LakeEq.scopedApplicable(dir, head.eqs,
          head.stats(f).addV, head.stats.get(f), eqTableCols, schema)
          .map(_.name)
      }.filter(_._2.nonEmpty).toMap
    val targets =
      (head.dvs.keys ++ eqApplicable.keys).toSeq.distinct.sorted
    // the eq-set-stability guard: a concurrent upsert epoch appending
    // a NEW ref between our head read and the publish must fail THIS
    // commit (our eqsOverride would silently wipe it — resurrecting
    // that epoch's deletes); re-checked adjacent to every publish
    // attempt, where the version CAS makes it airtight
    val eqGuard: () => Unit = () => {
      val now = LakeLog.current(dir).map(_.eqs).getOrElse(Seq.empty)
      if (now != head.eqs)
        throw new java.util.ConcurrentModificationException(
          s"rewrite_deletes of $dir: the equality-delete set changed " +
            "mid-rewrite (concurrent upsert epoch?) — re-run")
    }
    if (targets.isEmpty) {
      // refs exist but apply to nothing (every file postdates them):
      // retire the dead list without touching any bytes
      if (head.eqs.nonEmpty)
        LakeLog.commit(dir, "rewrite_deletes", Seq.empty, Seq.empty, 0L,
          dataChange = false, eqsOverride = Some(Seq.empty),
          prePublish = eqGuard)
      return (0, 0L)
    }
    val deadByFile = targets.map(f =>
      f -> head.dvs.get(f).map(vs => graft.sources.dsv2.LakeDv
        .positions(dir, vs).length.toLong).getOrElse(0L)).toMap
    val liveRows = LakeTableIO.footerRows(
      targets.map(new Path(dir, _))) - deadByFile.values.sum
    // the eq membership machinery, shared by every group's job: one
    // canonical key column per distinct keyCols shape (encoded exactly
    // as the reader/writer canon — int/long/string decimal strings,
    // dates as epoch days; any null key value → null → never matches)
    import org.apache.spark.sql.functions.{array, col, concat_ws, datediff, lit, to_date, udf, when}
    val kcShapes: Seq[Seq[String]] = head.eqs.map(_.keyCols).distinct
    val shapeOf: Map[String, Int] = head.eqs.map(r =>
      r.name -> kcShapes.indexOf(r.keyCols)).toMap
    val keySets: Map[String, Set[String]] =
      head.eqs.map(r => r.name -> LakeEq.read(dir, r.name)._2).toMap
    def canonCol(name: String): org.apache.spark.sql.Column = {
      val f = schema.fields.find(_.name.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalStateException(
          s"rewrite_deletes of $dir: eq key column '$name' missing"))
      f.dataType match {
        case org.apache.spark.sql.types.StringType => col(f.name)
        case org.apache.spark.sql.types.DateType =>
          datediff(col(f.name), to_date(lit("1970-01-01"))).cast("string")
        case _ => col(f.name).cast("string")
      }
    }
    def keyExpr(cols: Seq[String]): org.apache.spark.sql.Column = {
      val anyNull = cols.map(col(_).isNull).reduce(_ || _)
      when(anyNull, lit(null: String))
        .otherwise(concat_ws("\u0000", cols.map(canonCol): _*))
    }
    val applicableB = eqApplicable
    val keySetsB = keySets
    val shapeOfB = shapeOf
    val isEqDeleted = udf((f: String, eks: Seq[String]) =>
      applicableB.getOrElse(f, Seq.empty).exists { n =>
        val k = eks(shapeOfB(n))
        k != null && keySetsB(n).contains(k)
      })
    try {
      // read THROUGH the stock parquet source with `_metadata
      // .row_index` and subtract each file's positions — the same
      // position semantics the connector's reader applies (its _pos IS
      // the parquet row index) — then the eq membership filter, the
      // same canonical-key semantics the connector reader applies.
      // Rewrites run per partition GROUP so the materialized files
      // inherit their tuple.
      val groups = byTuple(head.parts, targets)
      var eqRemoved = 0L
      val stagedByGroup = groups.zipWithIndex.map {
        case ((tuple, files), gi) =>
          val dvRows = files.flatMap(f =>
            head.dvs.get(f).toSeq.flatMap(vs =>
              graft.sources.dsv2.LakeDv.positions(dir, vs))
              .map(p => (f, p)))
          val dvDf = spark.createDataFrame(
            if (dvRows.isEmpty) Seq(("", -1L)) else dvRows)
            .toDF("__f", "__p")
          val gStage = new Path(stage, s"g$gi")
          withMicrosTimestamps(spark) {
            val afterDv = spark.read.schema(schema)
              .parquet(files.map(f => s"$dir/$f"): _*)
              .withColumn("__f", col("_metadata.file_name"))
              .withColumn("__p", col("_metadata.row_index"))
              .join(org.apache.spark.sql.functions.broadcast(dvDf),
                Seq("__f", "__p"), "left_anti")
            val withFlag =
              if (head.eqs.isEmpty) afterDv.withColumn("__eqd", lit(false))
              else afterDv.withColumn("__eqd", isEqDeleted(col("__f"),
                array(kcShapes.map(keyExpr): _*)))
            // the removed-count action and the write share ONE scan
            // via a spill-safe persist — re-reading the group (scan +
            // anti-join + key UDF) twice doubles the retirement pass's
            // I/O for a consistency counter; the write pipeline itself
            // is single-sourced across both modes
            if (head.eqs.nonEmpty) withFlag.persist(
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              if (head.eqs.nonEmpty)
                eqRemoved += withFlag.filter(col("__eqd")).count()
              withFlag.filter(!col("__eqd"))
                .drop("__f", "__p", "__eqd")
                .write.parquet(gStage.toString)
            } finally if (head.eqs.nonEmpty) withFlag.unpersist()
          }
          val staged = fs.listStatus(gStage).toSeq
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .map(_.getPath)
          (tuple, staged)
      }
      val stagedRows = LakeTableIO.footerRows(stagedByGroup.flatMap(_._2))
      require(stagedRows == liveRows - eqRemoved,
        s"rewriteDeletes would change contents: staged $stagedRows " +
          s"!= live $liveRows - eq-deleted $eqRemoved")
      val published = stagedByGroup.flatMap { case (tuple, staged) =>
        staged.map { p =>
          val dest = new Path(dir, s"part-${UUID.randomUUID()}.parquet")
          if (!fs.rename(p, dest))
            throw new java.io.IOException(s"failed to publish $p -> $dest")
          (dest.getName, tuple)
        }
      }
      try LakeLog.commit(dir, "rewrite_deletes", published.map(_._1),
        targets, addedRows = 0L, dataChange = false,
        addedParts = published.collect {
          case (n, Some(t)) => n -> t
        }.toMap,
        eqsOverride =
          if (head.eqs.isEmpty) None else Some(Seq.empty),
        prePublish = if (head.eqs.isEmpty) () => () else eqGuard)
      catch { case e: Throwable =>
        unpublish(fs, dir, published.map(_._1)); throw e }
      (targets.size, deadByFile.values.sum + eqRemoved)
    } finally fs.delete(stage, true)
  }
}
