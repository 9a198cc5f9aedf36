package graft.sources.dsv2

import java.util.{ArrayList, HashMap => JHashMap, List => JList, Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType, StructType}

/** EQUALITY DELETES — Iceberg v2's second delete contract, beside the
  * positional deletion vectors ([[LakeDv]]). An equality-delete file is
  * a set of KEY VALUES: every row (in scope) whose key columns match a
  * listed key is deleted, without anyone ever locating its file or
  * position. That asymmetry is the point: a positional delete costs a
  * scan per epoch to FIND the rows (the foreachBatch-MERGE shape —
  * O(table) per epoch), while an equality delete costs O(epoch) to
  * WRITE and defers the matching to readers — the contract that makes
  * a keyed streaming upsert sink cheap at 100 TB. The read-side cost is
  * bounded by retirement: `CALL system.rewrite_deletes` materializes
  * and retires them (compaction's dual).
  *
  * SCOPE (the sequencing rule): an eq-delete committed at snapshot
  * version V applies to a data file iff the file's add version
  * ([[LakeStats.FileStats.addV]]) is KNOWN and < V. The same commit's
  * own post-image files (addV = V) and all later rows are never
  * affected — exactly Iceberg's data-vs-delete sequence-number rule.
  * A file with UNKNOWN addV under a live eq-delete is un-sequenceable
  * (applying could eat newer rows; skipping could resurrect deleted
  * ones), so both the eq commit and the scan fail LOUD on that state
  * rather than guess — [[requireSequenceable]].
  *
  * SIDECAR format (`eq-<uuid>.json` in the table dir, write-once like
  * DV sidecars): `{"keyCols": [...], "keys": ["<enc>", ...]}` where
  * each key is the canonical ENCODING of its column values
  * ([[encodeKey]] — the same canonical strings both the writer's
  * internal values and the reader's decoded values map to), multi-col
  * values joined by U+0000. Admitted key types are the exactly-
  * canonical ones: int/long/string/date; keys are non-null by
  * contract (the sink rejects null keys loud).
  */
object LakeEq {

  /** One equality-delete file as the manifest carries it: sidecar name,
    * the snapshot version it committed at (fills in at commit), its key
    * columns, the key count (bookkeeping/inventory), and — when the
    * key columns functionally determine the partition (every current-
    * spec source column is a key column) — the PARTITION TUPLE all of
    * its keys share (versioned slots, [[LakePartitioning]] encoding):
    * Iceberg v2's partition-scoped delete files. A tupled ref attaches
    * only to same-spec files with the SAME tuple — any row matching
    * one of its keys computes that tuple by transform determinism, so
    * a same-spec different-tuple file provably holds none of them.
    * Different-spec or tuple-less files attach conservatively.
    */
  final case class EqRef(name: String, version: Long,
                         keyCols: Seq[String], n: Long,
                         tuple: Option[Seq[String]] = None)

  private val mapper = new ObjectMapper()

  /** Key column types whose canonical encoding is exact. */
  def admits(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType | DateType => true
    case _ => false
  }

  /** Canonical string of one INTERNAL key value (Int / Long /
    * UTF8String; DateType's internal is the epoch-day Int). Null keys
    * are a contract violation — fail loud, a silent mis-encoding would
    * tombstone the wrong rows.
    */
  def encodeValue(v: Any): String = v match {
    case null => throw new IllegalArgumentException(
      "graft_lake equality delete: key value is NULL — upsert keys " +
        "must be non-null")
    case i: Int => i.toString
    case l: Long => l.toString
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case other => throw new IllegalArgumentException(
      s"graft_lake equality delete: unencodable key value class " +
        s"${other.getClass.getName}")
  }

  /** Canonical multi-column key: values joined by NUL (unambiguous —
    * no admitted type's encoding contains NUL).
    */
  def encodeKey(values: Seq[Any]): String =
    values.map(encodeValue).mkString("\u0000")

  /** Write one sidecar; returns its name. Write-once (never
    * overwritten), staged content — orphaned by a lost commit race and
    * reclaimed by the expire vacuum like any unpublished file.
    */
  def write(dir: String, keyCols: Seq[String],
            keys: Iterable[String]): String = {
    val name = s"eq-${java.util.UUID.randomUUID()}.json"
    val fs = new Path(dir).getFileSystem(new Configuration())
    val m = new JHashMap[String, Object]()
    val kc = new ArrayList[String](keyCols.size)
    keyCols.foreach(kc.add)
    m.put("keyCols", kc)
    val ks = new ArrayList[String]()
    keys.foreach(ks.add)
    m.put("keys", ks)
    val out = fs.create(new Path(dir, name), false)
    try out.write(mapper.writeValueAsBytes(m)) finally out.close()
    name
  }

  /** Read one sidecar: (keyCols, canonical key set). Fails loud — a
    * missing/torn eq sidecar under a live ref means deleted rows would
    * resurrect; there is no conservative direction.
    */
  def read(dir: String, name: String): (Seq[String], Set[String]) = {
    val fs = new Path(dir).getFileSystem(new Configuration())
    val in = fs.open(new Path(dir, name))
    val bytes = try in.readAllBytes() finally in.close()
    val m = mapper.readValue(bytes, classOf[JMap[String, Object]])
    val cols = m.get("keyCols") match {
      case l: JList[_] => l.asScala.map(_.toString).toSeq
      case _ => throw new java.io.IOException(
        s"graft_lake: eq sidecar $name has no keyCols")
    }
    val keys = m.get("keys") match {
      case l: JList[_] => l.asScala.map(_.toString).toSet
      case _ => throw new java.io.IOException(
        s"graft_lake: eq sidecar $name has no keys")
    }
    (cols, keys)
  }

  // Executor-wide sidecar cache: eq files are immutable write-once
  // content read by every task scanning an affected file — one read
  // per executor, not per split. Crude size cap (clear past 256
  // entries): refs retire via rewrite_deletes, so steady state is the
  // handful of un-retired epochs.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Seq[String], Set[String])]()

  def cached(dir: String, name: String): (Seq[String], Set[String]) = {
    if (cache.size > 256) cache.clear()
    cache.computeIfAbsent(new Path(dir, name).toUri.toString,
      _ => read(dir, name))
  }

  /** The eq-deletes applicable to a file added at `addV` (see the
    * sequencing rule above). Callers must have proven sequenceability
    * first — an unknown addV under a non-empty ref list is the loud
    * state, not a silent skip.
    */
  def applicable(refs: Seq[EqRef], addV: Long): Seq[EqRef] =
    refs.filter(r => addV >= 0 && addV < r.version)

  // ------------------------------------------------- key-stat scoping

  /** Per-value In-list cap for key-statistics scoping: refs with more
    * keys than this scope by per-column RANGE only (two comparisons
    * per file instead of O(keys) bound/bloom probes) — pruning power
    * degrades gracefully, per-file planning cost stays O(1).
    */
  private val ScopeInCap = 1024

  // driver-side decoded-literals cache (sidecar URI → per-column
  // literal arrays); sidecars are immutable write-once content
  private val scopeCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Decode one sidecar's canonical keys back into per-COLUMN typed
    * literal arrays (the classes [[LakeStats.mightMatchFile]] and
    * [[LakeBloom.hashLiteral]] compare exactly: Int/Long/String/
    * LocalDate). None when any key fails to decode (foreign sidecar,
    * drifted schema) — callers attach conservatively.
    */
  def scopeValues(dir: String, name: String,
                  types: Seq[DataType]): Option[Seq[Array[Any]]] = {
    if (scopeCache.size > 256) scopeCache.clear()
    scopeCache.computeIfAbsent(new Path(dir, name).toUri.toString,
      _ => try {
        val keys = cached(dir, name)._2
        val cols = Array.fill(types.size)(
          Array.newBuilder[Any])
        val it = keys.iterator
        while (it.hasNext) {
          // -1: a trailing empty string value must survive the split
          val parts =
            if (types.size == 1) Array(it.next())
            else it.next().split("\u0000", -1)
          if (parts.length != types.size) throw new MatchError(parts)
          var i = 0
          while (i < types.size) {
            cols(i) += (types(i) match {
              case IntegerType => parts(i).toInt
              case LongType    => parts(i).toLong
              case StringType  => parts(i)
              case DateType    =>
                java.time.LocalDate.ofEpochDay(parts(i).toLong)
              case other => throw new MatchError(other)
            })
            i += 1
          }
        }
        Some(cols.map(_.result()).toSeq): AnyRef
      } catch { case scala.util.control.NonFatal(_) => None: AnyRef })
      .asInstanceOf[Option[Seq[Array[Any]]]]
  }

  /** Can `file` (judged from its manifest stats) contain ANY of `ref`'s
    * keys? True on any uncertainty — skipping attachment is the
    * dangerous direction (a skipped ref resurrects deleted rows), so
    * false only on PROOF: every key column's value set provably absent
    * by min/max bounds (and blooms, for refs within [[ScopeInCap]]).
    * On a sorted or bloom-indexed 100 TB table this is what keeps an
    * upsert epoch's read debt local to the files that hold its keys
    * instead of attaching key-probe work to every sequenced file.
    */
  def mayApply(dir: String, ref: EqRef, st: LakeStats.FileStats,
               tableCols: Array[LakeColumnRef],
               schema: StructType): Boolean = {
    val bound =
      try bindKeys(schema, ref.keyCols)
      catch { case scala.util.control.NonFatal(_) => return true }
    scopeValues(dir, ref.name, bound.map(_._2)) match {
      case None => true
      case Some(perCol) =>
        val filters: Array[org.apache.spark.sql.sources.Filter] =
          bound.zip(perCol).map { case ((idx, _), vals) =>
            // the schema-canonical spelling — mightMatchFile resolves
            // stats entries by the table ref's exact name
            val name = schema.fields(idx).name
            if (vals.isEmpty)
              // an empty key set matches nothing anywhere
              org.apache.spark.sql.sources.In(name, Array.empty[Any])
            else if (vals.length <= ScopeInCap)
              org.apache.spark.sql.sources.In(name, vals)
            else {
              // large ref: range-only scoping, O(1) per file
              val ord = scopeOrdering(vals(0))
              org.apache.spark.sql.sources
                .GreaterThanOrEqual(name, vals.min(ord))
            }
          }.toArray ++ bound.zip(perCol).collect {
            case ((idx, _), vals) if vals.length > ScopeInCap =>
              val ord = scopeOrdering(vals(0))
              org.apache.spark.sql.sources
                .LessThanOrEqual(schema.fields(idx).name, vals.max(ord))
          }
        LakeStats.mightMatchFile(st, tableCols, filters)
    }
  }

  private def scopeOrdering(sample: Any): Ordering[Any] = (sample match {
    case _: Int    => Ordering.Int.on((v: Any) => v.asInstanceOf[Int])
    case _: Long   => Ordering.Long.on((v: Any) => v.asInstanceOf[Long])
    case _: java.time.LocalDate =>
      Ordering.Long.on((v: Any) =>
        v.asInstanceOf[java.time.LocalDate].toEpochDay)
    // parquet's unsigned UTF-8 byte order — the stats' own comparator
    case _ => Ordering.comparatorToOrdering(
      java.util.Comparator.comparing((v: Any) =>
        org.apache.parquet.io.api.Binary.fromString(
          v.asInstanceOf[String])))
  })

  /** The refs of `refs` that BOTH apply to a file by the sequencing
    * rule AND may hold one of its keys per the file's statistics — the
    * single scoping entry the scan's attachment, `rewrite_deletes`'
    * target set, and the `db.t.deletes` inventory all share (the
    * inventory advertises exactly what a rewrite would touch).
    * `st` None (no stats entry) attaches conservatively.
    */
  def scopedApplicable(dir: String, refs: Seq[EqRef], addV: Long,
                       st: Option[LakeStats.FileStats],
                       tableCols: Array[LakeColumnRef],
                       schema: StructType,
                       fileTuple: Option[Seq[String]] = None): Seq[EqRef] =
    applicable(refs, addV)
      // partition scoping: a tupled ref skips a SAME-SPEC file with
      // DIFFERENT slots (the keys' rows cannot live there — transform
      // determinism); different-spec/tuple-less stays conservative.
      // Compared in splitTuple-NORMALIZED form: a legacy version-less
      // tuple reads as spec 0, and raw Seq comparison against a
      // versioned "s0"-headed ref tuple would wrongly skip a file
      // that genuinely holds the keys (second-pass review finding —
      // the resurrection direction)
      .filter(r => r.tuple.forall(rt => fileTuple.forall { ft =>
        val (ri, rs) = LakePartitioning.splitTuple(rt)
        val (fi, fs) = LakePartitioning.splitTuple(ft)
        ri != fi || rs == fs
      }))
      .filter(r => st.forall(s => mayApply(dir, r, s, tableCols, schema)))

  /** Does any of `refs` ATTACH to file `name` under the full scoped
    * rule (sequencing + key statistics + partition tuples — exactly
    * what the scan subtracts and rewrite_deletes touches)? Missing
    * stats or an unknown add version read as ATTACHED (the
    * conservative direction for every caller: fast paths decline,
    * inventories report NULL). The ONE predicate the metadata fast
    * paths, the LIMIT/TopN gate, and both inventories share — a
    * scoping refinement edited here cannot diverge them.
    */
  def attachedTo(dir: String, refs: Seq[EqRef], name: String,
                 stats: Map[String, LakeStats.FileStats],
                 parts: Map[String, Seq[String]],
                 tableCols: Array[LakeColumnRef],
                 schema: StructType): Boolean =
    refs.nonEmpty && {
      val st = stats.get(name)
      !st.exists(_.addV >= 0) ||
        scopedApplicable(dir, refs, st.get.addV, st, tableCols,
          schema, parts.get(name)).nonEmpty
    }

  /** Fail loud when any current file cannot be SEQUENCED against the
    * eq-delete list (unknown add version) — checked at eq commit time
    * (friendly error, with the remedy) and re-checked at scan plan
    * time (a concurrent bootstrap sweep can add sequence-less files).
    */
  def requireSequenceable(dir: String, refs: Seq[EqRef],
                          files: Seq[String],
                          stats: Map[String, LakeStats.FileStats]): Unit =
    if (refs.nonEmpty) {
      val bad = files.filter(f => !stats.get(f).exists(_.addV >= 0))
      if (bad.nonEmpty)
        throw new IllegalStateException(
          s"graft_lake $dir: equality deletes are live but " +
            s"${bad.take(3).mkString(", ")}${if (bad.size > 3) ", …" else ""}" +
            " carry no add version — the deletes cannot be sequenced " +
            "against them (applying could delete newer rows; skipping " +
            "would resurrect deleted ones). CALL system.rewrite_deletes" +
            " / system.compact to rewrite those vintages first")
    }

  /** Commit-time guard for REWRITE operations that MATERIALIZE
    * existing physical rows into new files (copy-on-write DML, MOR
    * post-images, compact, zorder): their outputs get a fresh add
    * version past every eq ref, so an equality delete committed
    * BETWEEN the operation's plan (which saw no refs — the plan-time
    * decline) and its publish would be silently detached from the
    * rewritten rows — deleted rows resurrect. Re-checked inside the
    * log's commit retry loop adjacent to every publish attempt
    * (prePublish), where the version CAS makes it airtight: a racing
    * eq commit takes the contended version, this publish loses, the
    * retry re-runs the guard and fails loud.
    */
  def requireStillNone(dir: String, branch: Option[String] = None,
                       what: String): Unit = {
    val now = LakeLog.current(dir, branch).map(_.eqs).getOrElse(Seq.empty)
    if (now.nonEmpty)
      throw new java.util.ConcurrentModificationException(
        s"graft_lake $dir: equality deletes were committed while " +
          s"$what was in flight — its rewritten rows would escape " +
          "them (deleted rows would resurrect); re-run after " +
          "CALL system.rewrite_deletes")
  }

  /** prePublish guard for REWRITE operations whose plan consumed the
    * eq state AS OF its snapshot (row-level DML under live refs): the
    * current ref set must still EQUAL the plan-time set — a ref
    * committed mid-operation would be silently escaped by the
    * rewritten rows (fresh add versions) while the operation's scan
    * never subtracted it. Re-checked adjacent to every publish
    * attempt, where the version CAS makes it airtight; with an empty
    * plan-time set this is exactly [[requireStillNone]].
    */
  def requireUnchanged(dir: String, branch: Option[String],
                       atPlan: Seq[EqRef], what: String): Unit = {
    val now = LakeLog.current(dir, branch).map(_.eqs).getOrElse(Seq.empty)
    if (now != atPlan)
      throw new java.util.ConcurrentModificationException(
        s"graft_lake $dir: the equality-delete set changed while " +
          s"$what was in flight — its rewritten rows would escape " +
          "the new deletes (deleted rows would resurrect); re-run")
  }

  /** Manifest encoding of the ref list. */
  def toJson(refs: Seq[EqRef]): ArrayList[Object] = {
    val l = new ArrayList[Object](refs.size)
    refs.foreach { r =>
      val m = new JHashMap[String, Object]()
      m.put("name", r.name)
      m.put("version", java.lang.Long.valueOf(r.version))
      val kc = new ArrayList[String](r.keyCols.size)
      r.keyCols.foreach(kc.add)
      m.put("keyCols", kc)
      m.put("n", java.lang.Long.valueOf(r.n))
      r.tuple.foreach { t =>
        val tl = new ArrayList[String](t.size)
        t.foreach(tl.add)
        m.put("tuple", tl)
      }
      l.add(m)
    }
    l
  }

  def fromJson(v: Object): Seq[EqRef] = v match {
    case l: JList[_] => l.asScala.toSeq.flatMap {
      case m: JMap[_, _] =>
        val mm = m.asInstanceOf[JMap[String, Object]]
        val ver = mm.get("version") match {
          case n: Number => n.longValue(); case _ => -1L
        }
        val cols = mm.get("keyCols") match {
          case kl: JList[_] => kl.asScala.map(_.toString).toSeq
          case _            => Seq.empty
        }
        val n = mm.get("n") match {
          case x: Number => x.longValue(); case _ => 0L
        }
        val tuple = mm.get("tuple") match {
          case tl: JList[_] => Some(tl.asScala.map(_.toString).toSeq)
          case _            => None
        }
        if (ver >= 0 && cols.nonEmpty)
          Some(EqRef(String.valueOf(mm.get("name")), ver, cols, n, tuple))
        else None
      case _ => None
    }
    case _ => Seq.empty
  }

  /** Resolve `keyCols` to their schema ordinals + types, validating the
    * admitted kinds — the write-side fold and the read-side membership
    * test both bind through this.
    */
  def bindKeys(schema: StructType, keyCols: Seq[String])
      : Seq[(Int, DataType)] =
    keyCols.map { c =>
      val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(c))
      require(i >= 0,
        s"graft_lake upsert: key column '$c' is missing from schema " +
          s"[${schema.fieldNames.mkString(",")}]")
      val dt = schema.fields(i).dataType
      require(admits(dt),
        s"graft_lake upsert: key column '$c' has type " +
          s"${dt.simpleString} — upsert keys admit int/bigint/string/date")
      (i, dt)
    }
}
