package graft.sources.dsv2

import org.apache.hadoop.fs.Path

/** Planning-time unit bounding for pushed LIMIT / ORDER-BY-LIMIT —
  * manifest/footer metadata only, applied at TWO granularities: whole
  * files (manifest stats, before any footer opens) and row groups
  * (footer stats of the surviving files, already in hand for group
  * pruning).
  *
  * Both pushes are PARTIAL (Spark retains its Limit / TakeOrdered
  * operator above the scan), so this layer never computes an answer; it
  * only shrinks the planned unit set to a SUPERSET that provably still
  * contains one. That makes the soundness obligations small and
  * checkable:
  *
  *   - [[limitBound]]: the kept units must contain at least
  *     `min(n, total live rows)` rows. Units are taken in plan order
  *     until their proven live counts cover `n`; a unit whose live
  *     count is not provable contributes zero and is simply kept, so
  *     uncertainty can only ever KEEP more units.
  *   - [[topNKeepMask]]: the CUTOFF formulation. Sort proof units by
  *     their WORST sort bound (every proven row ranks at-or-before its
  *     unit's worst), accumulate proven live rows in that order until
  *     they cover `n`; the bound W where coverage lands is a rank that
  *     provably has >= n rows at-or-before it. A unit is dropped only
  *     when its BEST possible row ranks STRICTLY after W — its rows
  *     then rank strictly after n kept rows, so no valid top-n needs
  *     them. Strictness is what makes this sound under TIES, and the
  *     cutoff shape is what makes it non-circular: every proof unit
  *     has worst <= W, hence best <= W, hence is itself KEPT — the n
  *     vouched rows are always in the planned set. (The tempting
  *     per-unit formulation — drop U when >= n rows ELSEWHERE rank <=
  *     U's best — is unsound exactly there: two files with identical
  *     constant bounds each prove the other out and the true top row
  *     is lost.)
  *
  * Nulls are a rank TIER, not a value: under NULLS FIRST every null
  * ranks before every value (proof accumulation starts from proven
  * null counts; if nulls alone cover n, only units that might hold a
  * null survive), under NULLS LAST nulls rank after every value (an
  * all-null unit is dropped once value rows alone cover n; if they do
  * not, nothing is dropped — any value beats the proof nulls, so every
  * value-bearing unit may contribute).
  *
  * Why this matters at scale: `LIMIT 10` against a million-file table
  * should plan ONE file, and `ORDER BY ts LIMIT 100` against a
  * time-clustered table should plan only the files — and within the
  * survivors, only the row groups — whose `ts` bounds can reach the
  * top 100; the interactive-probe contract every warehouse honors and
  * a naive DSv2 source breaks by planning the whole snapshot behind a
  * retained Limit.
  *
  * Proof-side conservatism mirrors [[LakeStats]]: only units whose
  * live row and null counts are provable may vouch (file level: DV-free
  * + manifest stats; group level: footer counts with the file's DV
  * positions intersected per group), value-bound proofs additionally
  * require every bounds-carrying unit to share ONE comparable stats
  * kind (schema widening can mix `int`/`long` vintages — cross-kind
  * canonical strings do not compare) and refuse float/double outright
  * (NaN ordering diverges from parquet stats, the same exclusion
  * [[LakeTableIO.metaAggregate]] applies).
  */
object LakeLimits {

  /** One pushed ORDER BY <col>[, …] LIMIT n, reduced to its FIRST sort
    * column: direction and null placement of that column. A
    * multi-column order bounds soundly on the first key alone because
    * the cutoff is STRICT — dropped units rank strictly past W on the
    * first key, where >= n rows rank at-or-before it, so tie-breaker
    * columns can never promote a dropped row; units tying AT W survive
    * and Spark's retained TakeOrdered re-sorts on the full order.
    */
  final case class TopNPush(col: String, asc: Boolean,
                            nullsFirst: Boolean, n: Int)

  /** One boundable unit — a whole file or a single row group — in the
    * TopN arithmetic.
    *
    * @param rows        physical rows, -1 when unknown
    * @param cs          the sort column's resolved stats (bounds, null
    *                    count, kind); None = nothing known, unit is
    *                    unconditionally kept and vouches nothing
    * @param proverNulls null rows provably LIVE in this unit
    * @param proverVals  non-null rows provably LIVE in this unit
    *                    (countable against the unit's WORST bound when
    *                    bounds are known)
    */
  final case class TopNUnit(rows: Long, cs: Option[LakeStats.ColStats],
                            proverNulls: Long, proverVals: Long)

  /** The pushed bounds a batch scan threads into row-group planning:
    * at most one of limit/topN is set by Spark, both carried for
    * orthogonality. `topN._2` is the sort column's resolution ref
    * (the column need not be projected-first; refs come from the TABLE
    * schema).
    */
  final case class ScanBound(limit: Option[Int],
                             topN: Option[(TopNPush, LakeColumnRef)]) {
    def isEmpty: Boolean = limit.isEmpty && topN.isEmpty
  }

  /** One planned row group's bounding facts: its [[TopNUnit]] view, its
    * EXACT live rows (physical minus the file's DV positions falling in
    * the group's row range — always known at this granularity), and its
    * projected bytes (so trimmed plans report trimmed statistics).
    */
  final case class GroupFact(unit: TopNUnit, live: Long, bytes: Long)

  /** Exact proven live rows of `name`: the manifest footer row count
    * when the file is DV-free and stats-backed; 0 (nothing provable)
    * otherwise. Never an estimate — limitBound's guarantee rides on it.
    */
  private def provenLive(name: String,
                         stats: Map[String, LakeStats.FileStats],
                         dvs: Map[String, Seq[String]]): Long =
    if (dvs.contains(name)) 0L
    else stats.get(name).map(s => math.max(0L, s.rows)).getOrElse(0L)

  /** Keep files in snapshot order until their exact proven live counts
    * cover `n`; everything after is provably redundant for a plain
    * LIMIT (any n rows answer it). If the proofs never reach `n` —
    * legacy files, DVs everywhere, a genuinely small table — every
    * file stays and the retained Limit still caps the result.
    */
  def limitBound(files: Seq[Path],
                 stats: Map[String, LakeStats.FileStats],
                 dvs: Map[String, Seq[String]], n: Int): Seq[Path] = {
    var acc = 0L
    val keep = Seq.newBuilder[Path]
    var done = false
    for (f <- files if !done) {
      keep += f
      acc += provenLive(f.getName, stats, dvs)
      if (acc >= n) done = true
    }
    if (done) keep.result() else files
  }

  /** [[limitBound]] at an arbitrary unit granularity: keep units in
    * plan order until `live` (proven live rows per unit, 0 = unknown)
    * covers `n`. Returns the keep mask.
    */
  def limitMask(live: IndexedSeq[Long], n: Int): IndexedSeq[Boolean] = {
    var acc = 0L
    var cut = live.size // first index NOT kept
    var i = 0
    while (i < live.size && acc < n) { acc += live(i); i += 1 }
    if (acc >= n) cut = i
    live.indices.map(_ < cut)
  }

  /** The cutoff-based TopN keep mask over abstract units (see class
    * doc for the soundness argument). True = keep.
    */
  def topNKeepMask(units: IndexedSeq[TopNUnit],
                   t: TopNPush): IndexedSeq[Boolean] = {
    if (units.size <= 1) return units.map(_ => true)

    // ONE comparable kind across every bounds-carrying unit, or no
    // value proofs at all (null-tier proofs are kind-free)
    val kinds = units.flatMap(_.cs)
      .filter(cs => cs.min.isDefined || cs.max.isDefined)
      .map(_.kind).distinct
    val valueKind: Option[String] = kinds match {
      case Seq(k) if k != "double" && k != "float" && k != "bin" => Some(k)
      case _ => None
    }
    val dir = if (t.asc) 1 else -1
    def cmpRank(a: String, b: String): Int =
      LakeStats.cmpSame(valueKind.get, a, b) * dir
    def bestOf(cs: LakeStats.ColStats): Option[String] =
      if (t.asc) cs.min else cs.max
    def worstOf(cs: LakeStats.ColStats): Option[String] =
      if (t.asc) cs.max else cs.min

    // ---- the cutoff W: walk proof rows in pessimistic rank order ----
    // value provers: (worst bound, proven live non-null rows)
    val valProvers: Seq[(String, Long)] =
      if (valueKind.isEmpty) Seq.empty
      else units.flatMap { u =>
        u.cs match {
          case Some(c) if c.kind == valueKind.get && u.proverVals > 0 =>
            worstOf(c).map(_ -> u.proverVals)
          case _ => None
        }
      }.sortWith((a, b) => cmpRank(a._1, b._1) < 0)
    val totalNullProofs = units.map(_.proverNulls).sum

    // the cutoff as (coveredByNullTier, valueBound): under NULLS FIRST
    // nulls rank before every value, under NULLS LAST after
    sealed trait Cutoff
    case object AtNullTier extends Cutoff   // W = the null tier itself
    case class AtValue(w: String) extends Cutoff
    case object NoCutoff extends Cutoff     // proofs never cover n

    def valueCutoff(need: Long): Cutoff = {
      var acc = 0L
      for ((w, c) <- valProvers) {
        acc += c
        if (acc >= need) return AtValue(w)
      }
      NoCutoff
    }
    val cutoff: Cutoff =
      if (t.nullsFirst) {
        if (totalNullProofs >= t.n) AtNullTier
        else valueCutoff(t.n - totalNullProofs)
      } else {
        // NULLS LAST: if value proofs alone cover n the cutoff is a
        // value bound (all-null units drop); otherwise nulls would
        // land the cutoff at the null tier, after every value — no
        // unit ranks strictly past it, nothing drops
        valueCutoff(t.n.toLong)
      }

    // ---- keep decision: drop only when best rank STRICTLY after W ----
    units.map { u =>
      u.cs match {
        case None => true // nothing known: best unknowable, keep
        case Some(c) =>
          val mayHaveNull = c.nulls != 0 // >0 or unknown (-1)
          val allNull = c.nulls >= 0 && u.rows >= 0 && c.nulls == u.rows
          cutoff match {
            case NoCutoff => true
            case AtNullTier =>
              // W is the null tier (NULLS FIRST): only a unit that
              // cannot hold a null ranks strictly after it
              mayHaveNull
            case AtValue(w) =>
              if (t.nullsFirst && mayHaveNull) true // null tier <= W
              else if (!t.nullsFirst && allNull) false // null tier > W
              else bestOf(c) match {
                case Some(v) if valueKind.contains(c.kind) =>
                  cmpRank(v, w) <= 0 // keep unless strictly past W
                case _ => true // unbounded/mismatched best: keep
              }
          }
      }
    }
  }

  /** File-granularity TopN bounding from manifest stats: adapt each
    * file to a [[TopNUnit]] (DV-free + stats-backed files vouch their
    * exact null/value splits; anything else vouches nothing but is
    * judged as a candidate by whatever stats it has) and apply the
    * cutoff mask.
    */
  def topNBound(files: Seq[Path],
                stats: Map[String, LakeStats.FileStats],
                dvs: Map[String, Seq[String]], ref: LakeColumnRef,
                t: TopNPush): Seq[Path] = {
    val units = files.toIndexedSeq.map { f =>
      val name = f.getName
      val st = stats.get(name)
      val rows = st.map(_.rows).getOrElse(-1L)
      val cs = st.flatMap(LakeStats.resolveCol(_, ref))
      val (pn, pv) = cs match {
        case Some(c) if !dvs.contains(name) && rows >= 0 && c.nulls >= 0 =>
          (c.nulls, rows - c.nulls)
        case _ => (0L, 0L)
      }
      TopNUnit(rows, cs, pn, pv)
    }
    val mask = topNKeepMask(units, t)
    files.toIndexedSeq.zip(mask).collect { case (f, true) => f }
  }
}
