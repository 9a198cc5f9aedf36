package graft

import java.nio.file.Files

import graft.sources.dsv2.{GraftCatalog, LakeLog}

/** The manifest TREE ([[graft.sources.dsv2.LakeLog.SegRef]]): past the
  * inline threshold a manifest stores a segment list instead of flat
  * per-file maps — Iceberg's manifest-list/manifest-file split. The
  * contracts pinned here are the two that make it worth having at 10⁶
  * files:
  *
  *   - O(delta) COMMITS: a small append to a big table reuses every
  *     parent segment and writes exactly one new sidecar; a replace
  *     rewrites only the segments its removals touch;
  *   - BOUNDED READS: a partition-filtered plan loads only segments
  *     whose tuple summaries might match (counterized, like the
  *     sweep-K planning pins).
  *
  * Plus the safety net: every lake behavior (time travel, expire,
  * rollback, pruning) is unchanged under the tree — the threshold is a
  * pure encoding switch.
  */
class LakeManifestTreeSpec extends SparkSpec {

  private var n = 0
  private def withTreeCatalog[A](threshold: Int)(
      f: (String, String) => A): A = {
    val prev = sys.props.get("graft.lake.manifest.inline.threshold")
    sys.props("graft.lake.manifest.inline.threshold") = threshold.toString
    try {
      val root = Files.createTempDirectory("graft-mtree").toString
      n += 1
      val cat = s"mtreecat$n"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      f(cat, root)
    } finally prev match {
      case Some(v) =>
        sys.props("graft.lake.manifest.inline.threshold") = v
      case None =>
        sys.props.remove("graft.lake.manifest.inline.threshold")
    }
  }

  private def segFiles(dir: String): Set[String] = {
    val d = new java.io.File(s"$dir/_log/seg")
    if (!d.exists()) Set.empty
    else d.listFiles().map(_.getName).filter(_.startsWith("seg-")).toSet
  }

  private def manifestJson(dir: String, v: Long): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$dir/_log/v$v%020d.json")),
      java.nio.charset.StandardCharsets.UTF_8)

  test("past the threshold a manifest graduates to the tree: per-file " +
       "maps live in segments, a small append reuses every parent " +
       "segment and writes exactly ONE new sidecar, reads stay exact") {
    withTreeCatalog(8) { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.t (g BIGINT, x BIGINT) " +
        "PARTITIONED BY (g)")
      val dir = s"$root/db/t"
      // 16 partitions -> 16 files, past the threshold of 8
      spark.sql(s"INSERT INTO $cat.db.t " +
        "SELECT id % 16, id FROM range(0, 1600, 1, 4)")
      val h1 = LakeLog.current(dir).get
      assert(h1.files.size == 16)
      assert(h1.segments.nonEmpty, "manifest must be a tree")
      assert(h1.segments.map(_.n).sum == 16)
      assert(!manifestJson(dir, h1.version).contains("\"files\""),
        "a tree manifest must not inline the flat file list")
      assert(spark.table(s"$cat.db.t").count() == 1600)

      // O(delta) commit: one partition's append = ONE new segment, all
      // parent segments reused by reference
      val segsBefore = segFiles(dir)
      spark.sql(s"INSERT INTO $cat.db.t SELECT 3, id " +
        "FROM range(1600, 1700)")
      val h2 = LakeLog.current(dir).get
      val segsAfter = segFiles(dir)
      assert((segsAfter -- segsBefore).size == 1,
        s"append must write exactly one segment, wrote " +
          s"${(segsAfter -- segsBefore).size}")
      assert(h1.segments.toSet.subsetOf(h2.segments.toSet),
        "parent segments must be reused verbatim")
      assert(spark.table(s"$cat.db.t").count() == 1700)
      // history shares structure: both versions resolve, bit-exact
      assert(LakeLog.snapshotAt(dir, h1.version).files == h1.files)

      // a replace (copy-on-write DELETE) rewrites only the touched
      // segments: untouched parents stay referenced
      spark.sql(s"DELETE FROM $cat.db.t WHERE g = 5")
      val h3 = LakeLog.current(dir).get
      val untouched = h2.segments.filter(r =>
        r.tuples.exists(_.forall(t => !t.exists(_.contains("5")))))
      assert(untouched.nonEmpty &&
        untouched.toSet.subsetOf(h3.segments.toSet),
        "a partition-local replace must keep unrelated segments")
      assert(spark.table(s"$cat.db.t").count() == 1700 - 100)
    }
  }

  test("segment bin-packing keeps partition-tuple groups whole: a " +
       "commit whose groups exceed the threshold yields single-tuple " +
       "segments for every full chunk, remainders pack together, and " +
       "segment count stays within the 2x bound") {
    withTreeCatalog(4) { (_, root) =>
      val dir = s"$root/packing"
      new java.io.File(dir).mkdirs()
      // 3 partition groups x 6 synthetic files at threshold 4: the
      // old boundary-oblivious chunker would straddle partitions in 2
      // of 5 chunks; whole-group packing must emit one straddling BIN
      // at most (the 2+2 remainders), everything else single-tuple
      val parts = (for {
        p <- 0 until 3; i <- 0 until 6
      } yield f"f$p$i.parquet" -> Seq(s"vp$p")).toMap
      LakeLog.commit(dir, "pack-test", parts.keys.toSeq.sorted,
        Seq.empty, 18L, addedParts = parts)
      val head = LakeLog.current(dir).get
      assert(head.files.size == 18)
      assert(head.segments.nonEmpty, "18 files at threshold 4 -> tree")
      assert(head.segments.map(_.n).sum == 18)
      assert(head.segments.size <= 6, // ceil(18/4) + 1: the 2x bound
        s"packing must not blow up segment count: ${head.segments.size}")
      val summaries = head.segments.map(_.tuples.getOrElse(fail(
        "all files tupled -> every segment needs a prune summary")))
      val single = summaries.count(_.size == 1)
      assert(single >= 4,
        s"full chunks must be single-tuple: only $single of " +
          s"${summaries.size} are")
      assert(summaries.count(_.size > 1) <= 1,
        "at most the remainder bin may straddle tuples: " +
          summaries.map(_.size).mkString(","))
      // every group's files land in segments that list its tuple —
      // proved through the pruned-read path (keep only the segments
      // summarizing vpN, the files must all be there)
      (0 until 3).foreach { p =>
        val s = LakeLog.snapshotAtPruned(dir, head.version, None,
          r => r.tuples.exists(_.contains(Seq(s"vp$p"))))
        assert((0 until 6).forall(i => s.files.contains(f"f$p$i.parquet")),
          s"partition $p's files must be fully covered by its segments")
      }
    }
  }

  test("bounded manifest I/O: a partition-filtered plan on a many-file " +
       "tree table loads only matching segments (counterized), with " +
       "exact results; the unfiltered plan loads them all") {
    withTreeCatalog(4) { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.b (g BIGINT, x BIGINT) " +
        "PARTITIONED BY (g)")
      val dir = s"$root/db/b"
      // several commits x 16 partitions -> many segments
      (0 until 3).foreach(i =>
        spark.sql(s"INSERT INTO $cat.db.b SELECT id % 16, id " +
          s"FROM range(${i * 1600}, ${(i + 1) * 1600}, 1, 4)"))
      val head = LakeLog.current(dir).get
      val total = head.segments.size
      assert(total >= 8, s"fixture needs many segments, got $total")

      LakeLog.clearSegmentCache()
      val b1 = LakeLog.segmentReads.get()
      val one = spark.table(s"$cat.db.b").where("g = 7").count()
      val filteredReads = LakeLog.segmentReads.get() - b1
      assert(one == 300)
      assert(filteredReads < total,
        s"partition-filtered plan read $filteredReads of $total segments")
      assert(filteredReads <= total / 2,
        s"expected a bounded fraction, read $filteredReads of $total")

      LakeLog.clearSegmentCache()
      val b2 = LakeLog.segmentReads.get()
      assert(spark.table(s"$cat.db.b").count() == 4800)
      assert(LakeLog.segmentReads.get() - b2 == total.toLong,
        "the unfiltered plan reads every segment exactly once")
    }
  }

  test("delta-shaped CDC reads on a tree table load O(commit) manifest " +
       "segments, not O(table): one version's change feed touches only " +
       "the segments holding that commit's files") {
    withTreeCatalog(4) { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.c (g BIGINT, x BIGINT) " +
        "PARTITIONED BY (g)")
      val dir = s"$root/db/c"
      (0 until 4).foreach(i =>
        spark.sql(s"INSERT INTO $cat.db.c SELECT id % 16, id " +
          s"FROM range(${i * 800}, ${(i + 1) * 800}, 1, 4)"))
      val head = LakeLog.current(dir).get
      val total = head.segments.size
      assert(total >= 10, s"fixture needs many segments, got $total")
      // the LAST commit appended one partition's worth of files — its
      // change feed must not read the whole tree
      spark.sql(s"INSERT INTO $cat.db.c SELECT 3, id " +
        "FROM range(3200, 3300)")
      val v = LakeLog.current(dir).get.version
      LakeLog.clearSegmentCache()
      val b = LakeLog.segmentReads.get()
      val events = spark.read
        .option("startingVersion", v.toString)
        .option("endingVersion", v.toString)
        .table(s"$cat.db.c.changes")
        .selectExpr("x", "_change_type").collect()
      val reads = LakeLog.segmentReads.get() - b
      assert(events.length == 100)
      assert(events.forall(_.getString(1) == "insert"))
      assert(reads <= 2,
        s"delta CDC read loaded $reads of $total segments")
    }
  }

  test("the tree changes nothing observable: time travel, rollback, " +
       "expire (with orphan-segment sweep), and file pruning behave " +
       "exactly as on flat manifests") {
    withTreeCatalog(4) { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.e (g BIGINT, x BIGINT) " +
        "PARTITIONED BY (g)")
      val dir = s"$root/db/e"
      spark.sql(s"INSERT INTO $cat.db.e SELECT id % 8, id " +
        "FROM range(0, 800, 1, 4)")
      val v1 = LakeLog.current(dir).get.version
      spark.sql(s"INSERT INTO $cat.db.e SELECT id % 8, id " +
        "FROM range(800, 1200, 1, 4)")
      // time travel across the tree
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.db.e VERSION AS OF $v1")
        .head().getLong(0) == 800)
      // rollback restores the exact old state
      graft.operators.LakeSnapshots.rollback(dir, v1)
      assert(spark.table(s"$cat.db.e").count() == 800)
      assert(LakeLog.current(dir).get.files ==
        LakeLog.snapshotAt(dir, v1).files)
      // expire drops old manifests AND their now-orphaned segments;
      // retained versions keep every referenced segment
      spark.sql(s"INSERT INTO $cat.db.e SELECT id % 8, id " +
        "FROM range(1200, 1600, 1, 4)")
      val refsKept = LakeLog.current(dir).get.segments.map(_.name).toSet
      graft.operators.LakeSnapshots.expire(dir, keepLast = 1,
        graceMs = 0L)
      val onDisk = segFiles(dir)
      assert(refsKept.subsetOf(onDisk),
        "expire deleted a referenced segment")
      assert(onDisk == refsKept,
        s"expire left ${(onDisk -- refsKept).size} orphan segments")
      assert(spark.table(s"$cat.db.e").count() == 1200)
      assert(spark.table(s"$cat.db.e").where("g = 3").count() == 150)
    }
  }

  test("a missing segment sidecar fails FAST with the segment named — " +
       "not 50 transient-rename retries blaming the manifest") {
    withTreeCatalog(4) { (cat, root) =>
      spark.sql(s"CREATE TABLE $cat.db.x (g BIGINT, x BIGINT) " +
        "PARTITIONED BY (g)")
      val dir = s"$root/db/x"
      spark.sql(s"INSERT INTO $cat.db.x SELECT id % 8, id " +
        "FROM range(0, 800, 1, 4)")
      val victim = LakeLog.current(dir).get.segments.head.name
      assert(new java.io.File(s"$dir/_log/seg/$victim").delete())
      LakeLog.clearSegmentCache()
      val t0 = System.nanoTime()
      val e = intercept[LakeLog.SegmentMissingException] {
        LakeLog.current(dir)
      }
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(e.getMessage.contains(victim),
        s"error must name the missing segment: ${e.getMessage}")
      // 50 retries sleep 1-10ms each (~250ms+); one attempt is <50ms
      assert(elapsedMs < 200.0,
        f"missing segment burned retries: $elapsedMs%.0f ms")
    }
  }
}
