package graft.sources.dsv2

import org.apache.hadoop.fs.Path

/** Planning-time FILE bounding for pushed LIMIT / ORDER-BY-LIMIT —
  * manifest metadata only, zero file I/O.
  *
  * Both pushes are PARTIAL (Spark retains its Limit / TakeOrdered
  * operator above the scan), so this layer never computes an answer; it
  * only shrinks the planned file set to a SUPERSET that provably still
  * contains one. That makes the soundness obligations small and
  * checkable:
  *
  *   - [[limitBound]]: the kept files must contain at least
  *     `min(n, total live rows)` rows. Files are taken in snapshot
  *     order until their EXACT proven live counts cover `n`; a file
  *     whose live count is not provable from the manifest (no stats
  *     entry, or any deletion vector — the DV's cardinality lives in
  *     the sidecar, not the manifest) contributes zero and is simply
  *     kept, so uncertainty can only ever KEEP more files.
  *   - [[topNBound]]: a file may be dropped only when at least `n` rows
  *     in OTHER kept-eligible files provably rank less-than-or-equal to
  *     EVERY row the file could contain (judged from its best possible
  *     sort bound). Rows that tie are interchangeable for a top-n
  *     (Spark's own tie selection is arbitrary), so a valid top-n
  *     exists entirely outside the dropped file.
  *
  * Why this matters at scale: `LIMIT 10` against a million-file table
  * should plan ONE file, and `ORDER BY ts LIMIT 100` against a
  * time-clustered table should plan only the files whose `ts` bounds
  * can reach the top 100 — the interactive-probe contract every
  * warehouse honors and a naive DSv2 source breaks by planning the
  * whole snapshot behind a retained Limit.
  *
  * Proof-side conservatism mirrors [[LakeStats]]: only DV-free files
  * with a manifest stats entry and a KNOWN null count may vouch for
  * rows; value-bound proofs additionally require every bounds-carrying
  * file to share ONE comparable stats kind (schema widening can mix
  * `int`/`long` vintages — cross-kind canonical strings do not compare)
  * and refuse float/double outright (NaN ordering diverges from parquet
  * stats, the same exclusion [[LakeTableIO.metaAggregate]] applies).
  */
object LakeLimits {

  /** One pushed ORDER BY <col> LIMIT n: single top-level sort column,
    * direction, null placement. (Multi-column orders never prune files:
    * the secondary key cannot break ties from file bounds alone, so the
    * builder refuses the push and Spark keeps the full sort.)
    */
  final case class TopNPush(col: String, asc: Boolean,
                            nullsFirst: Boolean, n: Int)

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

  /** Drop every file whose BEST possible rank under the pushed order is
    * provably beaten (or tied) by at least `t.n` rows in other files.
    * O(F log F): proof files sort once by their worst bound in rank
    * order and a prefix sum answers each candidate's count — the shape
    * that survives a million-file manifest, not an all-pairs sweep.
    */
  def topNBound(files: Seq[Path],
                stats: Map[String, LakeStats.FileStats],
                dvs: Map[String, Seq[String]], ref: LakeColumnRef,
                t: TopNPush): Seq[Path] = {
    if (files.size <= 1) return files

    // resolved per-file column stats (field-id first, names for legacy
    // files — the same resolution row reads use)
    val entries: Map[String, (Long, Option[LakeStats.ColStats])] =
      files.map { f =>
        val st = stats.get(f.getName)
        f.getName -> (st.map(_.rows).getOrElse(-1L),
          st.flatMap(LakeStats.resolveCol(_, ref)))
      }.toMap

    // ONE comparable kind across every bounds-carrying file, or no
    // value proofs at all (null-tier proofs below are kind-free)
    val kinds = entries.values.flatMap(_._2)
      .filter(cs => cs.min.isDefined || cs.max.isDefined)
      .map(_.kind).toSeq.distinct
    val valueKind: Option[String] = kinds match {
      case Seq(k) if k != "double" && k != "float" && k != "bin" => Some(k)
      case _ => None
    }

    // rank comparison on canonical stat strings: DESC flips the sign
    val dir = if (t.asc) 1 else -1
    def cmpRank(k: String, a: String, b: String): Int =
      LakeStats.cmpSame(k, a, b) * dir
    def bestOf(cs: LakeStats.ColStats): Option[String] =
      if (t.asc) cs.min else cs.max
    def worstOf(cs: LakeStats.ColStats): Option[String] =
      if (t.asc) cs.max else cs.min

    // ---- proof side: what each file can vouch for --------------------
    // A prover must be DV-free (a DV could have deleted the vouched
    // rows) with known row and null counts. `vals` rows are proven
    // non-null; they rank <= v when the file's WORST bound ranks <= v.
    final case class Prover(name: String, nulls: Long, vals: Long,
                            worst: Option[String])
    val provers = files.flatMap { f =>
      val name = f.getName
      val (rows, cs) = entries(name)
      if (dvs.contains(name) || rows < 0) None
      else cs match {
        case Some(c) if c.nulls >= 0 =>
          val worst = valueKind.flatMap(k =>
            if (c.kind == k) worstOf(c) else None)
          Some(Prover(name, c.nulls, rows - c.nulls, worst))
        case _ => None
      }
    }
    val totalNulls = provers.map(_.nulls).sum
    val totalRows = provers.map(p => p.nulls + p.vals).sum
    val proverByName = provers.map(p => p.name -> p).toMap

    // value provers sorted by worst bound in rank order + prefix sums;
    // valsLeq(v) = rows proven non-null and ranked <= v, via binary
    // search for the first worst-bound past v
    val valProvers = valueKind.fold(Seq.empty[Prover])(k =>
      provers.filter(_.worst.isDefined)
        .sortWith((a, b) => cmpRank(k, a.worst.get, b.worst.get) < 0))
    val prefix = valProvers.scanLeft(0L)(_ + _.vals).toArray
    def valsLeq(v: String): Long = valueKind.fold(0L) { k =>
      var lo = 0; var hi = valProvers.size // first index with worst > v
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cmpRank(k, valProvers(mid).worst.get, v) <= 0) lo = mid + 1
        else hi = mid
      }
      prefix(lo)
    }
    // f's own contribution to valsLeq(v) — subtracted for "other files"
    def ownValsLeq(name: String, v: String): Long =
      proverByName.get(name) match {
        case Some(p) if p.worst.isDefined && valueKind.exists(k =>
            cmpRank(k, p.worst.get, v) <= 0) => p.vals
        case _ => 0L
      }

    // ---- candidate side: keep unless provably out of the top n -------
    files.filter { f =>
      val name = f.getName
      val (rows, cs) = entries(name)
      cs match {
        case None => true // no stats: best rank unknowable, keep
        case Some(c) =>
          val mayHaveNull = c.nulls != 0
          val allNull = c.nulls >= 0 && rows >= 0 && c.nulls == rows
          val beaten: Long =
            if (t.nullsFirst) {
              if (mayHaveNull)
                // best tier is NULL: only other nulls rank <= it
                totalNulls -
                  proverByName.get(name).map(_.nulls).getOrElse(0L)
              else bestOf(c) match {
                case Some(v) if valueKind.contains(c.kind) =>
                  (totalNulls -
                    proverByName.get(name).map(_.nulls).getOrElse(0L)) +
                    (valsLeq(v) - ownValsLeq(name, v))
                case _ => -1L // unbounded best: keep
              }
            } else {
              if (allNull)
                // best tier is NULL (last): every proven row — values
                // rank before it, nulls tie
                totalRows - proverByName.get(name)
                  .map(p => p.nulls + p.vals).getOrElse(0L)
              else bestOf(c) match {
                case Some(v) if valueKind.contains(c.kind) =>
                  valsLeq(v) - ownValsLeq(name, v)
                case _ => -1L
              }
            }
          beaten < t.n
      }
    }
  }
}
