package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-diff ("delta") operators — the analytical core of the reference
  * pipeline (reference: agency-delta.go:126-246). Given two full snapshots of
  * a keyed table (the reference keys `Agency_Data` on `pid` and snapshots
  * weekly into `importdate` partitions), compute:
  *
  *  - '''updated''': rows whose key exists in both snapshots but at least one
  *    compared attribute changed (reference "change" query,
  *    agency-delta.go:126-201 — inner self-join on the key + OR-disjunction
  *    of 33 column inequalities).
  *  - '''added''': rows whose key is new in the newest snapshot (reference
  *    "new" query, agency-delta.go:203-246 — written there as
  *    LEFT JOIN + IS NULL; as literally written it returns 0 rows, see
  *    SURVEY.md §2.2 R4 — we implement the documented intent as an
  *    anti-join).
  *  - '''removed''': the symmetric complement (not in the reference; natural
  *    extension).
  *
  * All operators are pure `DataFrame => DataFrame` — no I/O — so Catalyst
  * sees one declarative plan: partition-pruned scans on each side, a single
  * shuffle on the key (or none, if both snapshots are bucketed by the key),
  * and the change predicate evaluated inside whole-stage codegen.
  *
  * Scale notes (100 TB): the join is an equi-join on the snapshot key, so
  * Spark plans a sort-merge join with both sides hash-partitioned by key;
  * AQE handles skewed keys. Because each side is exactly one `importdate`
  * partition, partition pruning keeps the scan at 1/N of the table. For a
  * standing deployment, bucket both snapshots by the key to eliminate the
  * shuffle entirely.
  */
object SnapshotDelta {

  /** NULL semantics of the change predicate (SURVEY.md §2.2 R3). */
  sealed trait ChangeMode
  /** Athena/ANSI parity: `a != b` is three-valued, so NULL→value and
    * value→NULL transitions are NOT detected (reference behavior,
    * agency-delta.go:168-200).
    */
  case object Legacy extends ChangeMode
  /** Null-safe: `NOT (a <=> b)` — NULL transitions count as changes. */
  case object NullSafe extends ChangeMode

  /** OR-disjunction of per-column inequalities between two sides of a
    * self-join (reference: agency-delta.go:168-200).
    */
  def changePredicate(attrs: Seq[String], leftAlias: String,
                      rightAlias: String, mode: ChangeMode): Column = {
    require(attrs.nonEmpty, "change predicate needs at least one attribute")
    attrs.map { c =>
      val l = col(s"$leftAlias.$c")
      val r = col(s"$rightAlias.$c")
      mode match {
        case Legacy   => l =!= r
        case NullSafe => !(l <=> r)
      }
    }.reduce(_ || _)
  }

  /** Rows present in both snapshots (matched on `key`) where any attribute in
    * `attrs` differs; result carries the newest-side columns, like the
    * reference SELECT list (agency-delta.go:127-160).
    */
  def updated(newest: DataFrame, previous: DataFrame, key: String,
              attrs: Seq[String], mode: ChangeMode = Legacy): DataFrame = {
    // Unchanged-row fast path (both modes): a per-row xxhash64 over the
    // compared attrs, computed ONCE per input row during the scan (not
    // per joined pair), dismisses the dominant unchanged rows with a
    // single long compare — the wide 33-way disjunction then runs only
    // on hash-differing pairs, where it both confirms the change exactly
    // (no false positives from the hash) and keeps the predicate the
    // source of truth. The dismissal is mode-agnostic: hash-equal rows
    // are attribute-identical, and an identical pair satisfies neither
    // `a <=> b` negated (NullSafe) nor any `a != b` (Legacy — `x != x`
    // is false, `NULL != NULL` is NULL; either way the row is filtered),
    // so Legacy's exact three-valued parity with agency-delta.go:168-200
    // is preserved on every pair the predicate actually sees. Each
    // column is hashed as an (IS NULL, value) pair: Spark's hash fold
    // SKIPS null fields (the running hash passes through), so without
    // the marker, rows differing only in which column holds a NULL —
    // ("x", NULL) vs (NULL, "x") — would collide and the change would
    // be missed; the never-null marker makes every column advance the
    // fold, leaving only the generic ~2^-64 collision risk.
    val rowHash = "_graft_rowhash"
    val h = xxhash64(
      struct(attrs.flatMap(c => Seq(col(c).isNull, col(c))): _*))
    val pre = col(s"n.$rowHash") =!= col(s"p.$rowHash")
    val n = newest.withColumn(rowHash, h).alias("n")
    val p = previous.withColumn(rowHash, h).alias("p")
    n.join(p, col(s"n.$key") === col(s"p.$key"), "inner")
      .where(pre && changePredicate(attrs, "n", "p", mode))
      .select(newest.columns.toIndexedSeq.map(c => col(s"n.$c")): _*)
  }

  /** [[updated]] with the wide-row shuffle factored OUT — the default
    * plan for UNBUCKETED snapshots at scale. The plain formulation
    * shuffles every compared column of BOTH sides through the join
    * (at 10× fixture scale: two ~750 MB full-width exchanges plus
    * ~1.1 GB of sort spill — the measured 73 s sort/spill cliff in
    * SCALING.md sweep H); this one joins only `(key, rowhash)` first —
    * a few dozen bytes per row — to find the CHANGED key set, then
    * semi-joins each wide side down to exactly those keys before the
    * full-width join runs. Weekly change rates are single-digit
    * percent, so the wide join's inputs shrink by ~20-100× and AQE
    * turns its exchange into a broadcast when the changed set fits;
    * even in the worst case (everything changed) the plan degrades to
    * the plain formulation's cost, never below it. Each side is
    * scanned twice, but a parquet scan is sequential map-side work —
    * trading it for the full-width exchange+sort is the right exchange
    * at any scale. Result rows are IDENTICAL to [[updated]] (the pair
    * filter and change predicate re-run on the rejoined pairs, so
    * multiplicity under duplicate keys and Legacy's three-valued
    * semantics are preserved bit-for-bit). Bucketed snapshots should
    * keep [[updated]]: their join has NO exchange to factor out, and
    * the extra semi-joins would only add work.
    */
  def updatedNarrow(newest: DataFrame, previous: DataFrame, key: String,
                    attrs: Seq[String],
                    mode: ChangeMode = Legacy,
                    maxChangedKeys: Long = -1L): DataFrame = {
    val rowHash = "_graft_rowhash"
    val h = xxhash64(
      struct(attrs.flatMap(c => Seq(col(c).isNull, col(c))): _*))
    val n = newest.withColumn(rowHash, h).alias("n")
    val p = previous.withColumn(rowHash, h).alias("p")
    // phase 1: the narrow join — key + 8-byte hash per side, nothing
    // else crosses the wire; distinct because a key with several
    // differing pairs must appear once in the steering set. Eagerly
    // materialized (persist + the guard's count below): the set steers
    // the plan choice AND seeds both semi-joins, so computing it once
    // beats three lazy recomputations of the narrow join. persist (not
    // localCheckpoint) keeps the lineage: an executor lost mid-query on
    // a long-running cluster recomputes the lost blocks instead of
    // failing the job (checkpointed blocks are NOT fault-tolerant).
    val changed = n.select(col(s"n.$key").as("ck"), col(rowHash).as("nh"))
      .join(p.select(col(s"p.$key").as("ck"), col(rowHash).as("ph")), "ck")
      .where(col("nh") =!= col("ph"))
      .select(col("ck")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // RUNTIME GUARD on the broadcast contract: the phase-2 semi build
    // side is hinted broadcast, which is only sane while the CHANGED
    // key set is change-rate sized. At a pathological change rate
    // (bulk re-key, full refresh) the set grows with the table and a
    // hinted broadcast would OOM the driver — so the materialized set
    // is counted (free: it is already checkpointed) and past the
    // budget the operator routes to [[updated]]'s plain wide join,
    // which is exactly the right plan when most rows changed (the
    // semi-joins would filter nothing). The count doubles as the
    // persist's materialization, so the guard costs no extra job.
    // Budget default: the session's autoBroadcastJoinThreshold at a
    // conservative 64 bytes/key.
    val budget =
      if (maxChangedKeys >= 0L) maxChangedKeys
      else {
        val t = newest.sparkSession.sessionState.conf
          .autoBroadcastJoinThreshold
        if (t <= 0) 160000L else math.max(1L, t / 64L)
      }
    if (changed.count() > budget) {
      changed.unpersist(blocking = false) // routed away: drop the cache
      return updated(newest, previous, key, attrs, mode)
    }
    // phase 2: shrink each wide side to the changed keys, then run the
    // exact pair-level logic of `updated` on what remains. The semi
    // build side is HINTED broadcast: size estimation cannot see that
    // the distinct-after-join output is change-rate sized (join size
    // estimates multiply), so the unhinted initial plan is a SMJ semi
    // whose ENSURE_REQUIREMENTS exchange materializes a full-width
    // shuffle WRITE of each side even after AQE converts the join and
    // reads it locally. The hint keeps the wide sides exchange-free
    // end-to-end (one broadcast, reused for both sides); the guard
    // above has already proven the build side fits.
    val n2 = n.join(broadcast(changed), col(s"n.$key") === col("ck"),
      "left_semi")
    val p2 = p.join(broadcast(changed), col(s"p.$key") === col("ck"),
      "left_semi")
    val pre = col(s"n.$rowHash") =!= col(s"p.$rowHash")
    n2.join(p2, col(s"n.$key") === col(s"p.$key"), "inner")
      .where(pre && changePredicate(attrs, "n", "p", mode))
      .select(newest.columns.toIndexedSeq.map(c => col(s"n.$c")): _*)
  }

  /** Rows whose key appears only in the newest snapshot — the documented
    * intent of the reference "new" query (Readme.md:13, "record didn't
    * exists in previous"). Anti-join: no row payload needed from the
    * previous side, so Spark can plan a broadcast/shuffled hash anti-join
    * over just the key column (column pruning drops the other 33).
    */
  def added(newest: DataFrame, previous: DataFrame, key: String): DataFrame =
    newest.join(previous.select(key), Seq(key), "left_anti")

  /** Rows whose key disappeared in the newest snapshot (extension). */
  def removed(newest: DataFrame, previous: DataFrame, key: String): DataFrame =
    previous.join(newest.select(key), Seq(key), "left_anti")

  /** Bug-compatible literal mode of the reference "new" query
    * (agency-delta.go:239-245): the LEFT JOIN lacks the partition filter in
    * the ON clause and then filters `n2.importdate = previous` in WHERE,
    * which collapses the outer join and makes `n2.pid IS NULL`
    * unsatisfiable — the query provably returns 0 rows. Kept for oracle
    * diffing; schema matches `added`.
    */
  def addedLiteral(newest: DataFrame): DataFrame =
    newest.where(lit(false))

  /** SCD2 (slowly-changing-dimension type 2) history build from two
    * snapshots — the delta family's natural extension: instead of
    * emitting change SETS (updated/added/removed), emit the versioned
    * history table a warehouse keeps. Per key:
    *
    *  - unchanged:      one `current` row, valid since `prevDate`
    *  - changed:        a `closed` row (old attrs, prevDate→newDate) AND
    *                    a `current` row (new attrs, since newDate)
    *  - added:          one `current` row since newDate
    *  - removed:        one `closed` row (prevDate→newDate)
    *
    * One FULL OUTER join on the key, then each joined row explodes into
    * its 1-2 output rows via an array of structs — single pass, no second
    * scan, no union of two joins. Change detection is null-safe (NULL
    * transitions open a new version — SCD2 semantics, not the reference's
    * 3-valued quirk). Scale shape: identical to `updated` (one equi-join
    * shuffle, prunable snapshot scans) plus a narrow explode.
    */
  def scd2(newest: DataFrame, previous: DataFrame, key: String,
           attrs: Seq[String], prevDate: String, newDate: String): DataFrame = {
    val n = newest.alias("n")
    val p = previous.alias("p")
    val cols = key +: attrs
    val changed = changePredicate(attrs, "n", "p", NullSafe)
    val inBoth = col(s"n.$key").isNotNull && col(s"p.$key").isNotNull
    val addedRow = col(s"p.$key").isNull
    val removedRow = col(s"n.$key").isNull
    def side(a: String) = struct(
      cols.map(c => col(s"$a.$c").as(c)) :+
        lit(if (a == "n") newDate else prevDate).as("valid_from") :+
        (if (a == "n") lit(null).cast("string").as("valid_to")
         else lit(newDate).as("valid_to")) :+
        lit(if (a == "n") "current" else "closed").as("status"): _*)
    // unchanged rows carry the ORIGINAL validity start (prevDate) — the
    // version is still the one opened in the previous snapshot
    def unchangedRow = struct(
      cols.map(c => col(s"n.$c").as(c)) :+
        lit(prevDate).as("valid_from") :+
        lit(null).cast("string").as("valid_to") :+
        lit("current").as("status"): _*)
    val versions =
      when(inBoth && changed, array(side("p"), side("n")))
        .when(inBoth && !changed, array(unchangedRow))
        .when(addedRow, array(side("n")))
        .when(removedRow, array(side("p")))
    n.join(p, col(s"n.$key") === col(s"p.$key"), "full_outer")
      .select(explode(versions).as("v"))
      .select(col("v.*"))
  }

  /** MERGE/upsert: apply the three change sets to the previous snapshot
    * — delete removed keys, replace updated rows, insert added rows —
    * reconstructing the newest snapshot exactly. This is the operation
    * the reference's delta CONSUMERS run (the CSVs exist to be merged
    * into a downstream store); implementing it closes the loop and
    * makes the change sets self-validating: merge(prev, deltas) must
    * equal newest, row for row.
    *
    * Shape: one anti-join (drop updated∪removed keys from prev — both
    * key sets in ONE broadcast-able side) + a union of the update and
    * insert sets. No full-outer join, no window: at 100 TB the deltas
    * are a fraction of the snapshot, so the dominant cost is the single
    * pass over `previous`.
    */
  def mergeUpsert(previous: DataFrame, updated: DataFrame, added: DataFrame,
                  removed: DataFrame, key: String): DataFrame = {
    val replacedKeys = updated.select(key).unionByName(removed.select(key))
    previous.join(replacedKeys, Seq(key), "left_anti")
      .unionByName(updated)
      .unionByName(added)
  }

  /** Top-2 partition-value selection (reference: GetDeltaPartitions,
    * agency-delta.go:97-124 — list, `sort.Strings`, take last two; error if
    * fewer than 2). Lexicographic max ≡ chronological for ISO dates.
    * Metadata-scale only (weekly partitions), so a driver-side sort mirrors
    * the reference exactly.
    */
  def partitionPair(values: Seq[String]): (String, String) = {
    val sorted = values.distinct.sorted
    if (sorted.size < 2)
      throw new IllegalStateException("Not enough partitions to run delta")
    (sorted(sorted.size - 1), sorted(sorted.size - 2))
  }
}
