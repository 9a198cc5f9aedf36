package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text deduplication operators for large-corpus pipelines: exact
  * (normalize → hash → keep-first), MinHash+LSH banded near-dup (shingle →
  * min-wise signature → band buckets → in-bucket candidate pairs → exact
  * Jaccard verify), and SimHash bucketing.
  *
  * Everything is Column algebra over built-in functions (md5, split,
  * transform, slice) so the whole path stays inside whole-stage codegen —
  * no UDFs, no driver-side loops.
  *
  * Scale notes (100 TB): the cost shape is what matters —
  *  - exact dedup: one shuffle on the 128-bit content hash; at any scale
  *    this is the groupBy-hash pattern with map-side partial aggregation.
  *  - MinHash: shingle explode (×~tokens per doc) feeds a single groupBy
  *    on doc id computing all signature mins in one pass; buckets shuffle
  *    on (band, bandKey); candidate pairs come ONLY from same-bucket
  *    self-joins — never an all-pairs cartesian. Bucket skew (a degenerate
  *    band key collecting millions of docs) is the known hazard: AQE skew
  *    join handles moderate skew, and a bucket-size cap filter is the
  *    standard guard.
  *  - min-wise hashing uses the lexicographic min of `md5(seed | shingle)`
  *    hex strings — engine-portable (any ANSI engine reproduces it), which
  *    is what makes the whole near-dup path differentially testable.
  */
object TextDedup {

  /** Shared oversized-bucket cap. [[candidatePairs]] defaults to it and
    * the incremental dedup path (DedupQueries.incrementalDedup) applies
    * the same value to its probe-side cap — the pinned "incremental ==
    * full-corpus restricted to newest pairs" invariant depends on both
    * sides agreeing, so neither hard-codes the number.
    */
  val DefaultMaxBucketSize: Int = 1000

  /** Whitespace-collapse + lowercase normalization. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Word n-gram shingles per id: (id, shingle). `dedup = true` gives set
    * semantics (needed for Jaccard); false keeps one row per occurrence
    * (frequency weights, one less shuffle). Documents with fewer than `n`
    * tokens yield no shingles (guarded — Spark's `sequence` would
    * otherwise count downward for negative spans).
    */
  def shingles(df: DataFrame, idCol: String, textCol: String,
               n: Int = 3, dedup: Boolean = true): DataFrame = {
    val exploded = df
      .select(col(idCol).as("doc_id"),
        split(normalize(col(textCol)), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n)))"
      )).as("shingle"))
    if (dedup) exploded.distinct() else exploded
  }

  /** Min-wise signature: ONE md5 per shingle, sliced into `numHashes`
    * 4-hex-char (16-bit) components; each component's per-doc minimum is
    * one signature entry. Slicing a single digest instead of hashing
    * `numHashes` times is the standard economy variant — the rare extra
    * band collisions it admits are removed by the exact-Jaccard verify
    * stage. One groupBy computes every component (columns m0..m{k-1});
    * duplicate shingles don't affect a min, so either shingle stream
    * (dedup'd or not) yields the same signature — but `sz` counts ROWS:
    * it equals the shingle-SET size only for a set-semantics (dedup'd)
    * input. Pass `shingles(..., dedup = true)` whenever `sz` feeds a
    * Jaccard denominator (as [[jaccardVerify]]'s `sizes` does).
    */
  def minhashSignature(sh: DataFrame, numHashes: Int = 8,
                       seedPrefix: String = "mh"): DataFrame = {
    require(numHashes <= 8, "32 hex chars / 4 per slice = max 8 components")
    val h = md5(concat(lit(s"$seedPrefix|"), col("shingle")))
    sh.select(col("doc_id"), h.as("h"))
      .groupBy("doc_id").agg(
        min(substring(col("h"), 1, 4)).as("m0"),
        (1 until numHashes).map(i =>
          min(substring(col("h"), 4 * i + 1, 4)).as(s"m$i")) :+
          // shingle-set size rides along in the SAME aggregation — the
          // Jaccard verify stage needs |set| per doc, and computing it
          // here saves a second full scan+shuffle of the shingle table
          count(lit(1)).as("sz"): _*)
  }

  /** Band the signature: `bands` × `rowsPerBand` layout, band key =
    * md5 of the band's concatenated components. Output (doc_id, band, key).
    */
  def bandBuckets(sig: DataFrame, bands: Int = 4,
                  rowsPerBand: Int = 2): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(parts: _*)).as("key"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Distinct candidate pairs (id1 < id2) sharing any bucket. The join is
    * keyed on (band, key) — candidates only ever meet inside a bucket.
    *
    * `maxBucketSize` is the skew guard: a degenerate band key (e.g. a
    * boilerplate-heavy corpus collapsing millions of docs into one
    * bucket) would make the in-bucket self-join quadratic; buckets larger
    * than the cap are dropped before the join, bounding any bucket's
    * contribution to maxBucketSize² pairs. Dropping is the standard LSH
    * trade: a bucket that big is all-boilerplate, near-zero-information
    * for near-dup ranking, and its members still meet through their other
    * (informative) bands. The size pre-pass is one groupBy over the
    * bucket stream — partial-agg cheap.
    */
  def candidatePairs(buckets: DataFrame,
                     maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(maxBucketSize >= 2, "a bucket needs 2 docs to form a pair")
    // bucket-size cap as a pre-aggregated OVERSIZED-key set + broadcast
    // anti-join: the oversized set is tiny by construction (only
    // degenerate boilerplate keys exceed the cap — usually zero rows), so
    // the cap costs one partial-agg'd groupBy over the bucket stream and
    // a map-side hash probe per row. The window formulation
    // (count(*) OVER (PARTITION BY band, key)) looks cheaper on paper —
    // one shuffle — but it SORTS the full bucket stream, materializes it
    // through the window exec, and does all of that twice because the
    // self-join consumes the capped stream through two aliases; it
    // benched 2.9x slower.
    val oversized = buckets.groupBy("band", "key")
      .agg(count(lit(1)).as("_bsz"))
      .where(col("_bsz") > maxBucketSize)
      .select("band", "key")
    // the cap is applied to ONE side only: the pair join is inner on
    // (band, key), so a key dropped from side a forms no pairs no matter
    // what side b holds — capping b too would just re-run the anti-join
    // chain (a second full pass over the bucket stream) for an
    // identical result
    val a = buckets
      .join(broadcast(oversized), Seq("band", "key"), "left_anti")
      .alias("a")
    val b = buckets.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
  }

  /** Exact Jaccard over the shingle sets of candidate pairs. Intersection
    * via a shingle-keyed join (bounded by candidate count × shared
    * shingles — never all-pairs), sizes via per-doc counts (pass a
    * precomputed `sizes` (doc_id, sz) — e.g. the one riding on
    * [[minhashSignature]] — to skip that scan).
    *
    * Both intersection sides are pre-filtered to CANDIDATE docs via a
    * broadcast semi-join on the pair ids: candidates are a tiny fraction
    * of the corpus (that's the point of LSH), so the (doc_id, shingle)
    * shuffle carries only their shingles instead of the whole table's —
    * at 100 TB this is the difference between shuffling the corpus and
    * shuffling the suspects.
    *
    * `pairs` is consumed twice (the id filter and the intersection join)
    * — persist or checkpoint it at the call site so the LSH pipeline that
    * produced it doesn't run twice.
    */
  def jaccardVerify(pairs: DataFrame, sh: DataFrame,
                    sizes: Option[DataFrame] = None,
                    eager: Boolean = true): DataFrame =
    overlapCounts(pairs, sh, sizes, eager)
      .select(col("id1"), col("id2"),
        (col("inter").cast("double") /
          (col("sz1") + col("sz2") - col("inter")).cast("double"))
          .as("jaccard"))

  /** Exact shingle-overlap counts for candidate pairs:
    * (id1, id2, inter, sz1, sz2). The shared machinery behind
    * [[jaccardVerify]] (symmetric: inter / union) and containment
    * scoring (asymmetric: inter / min size — catches a snippet embedded
    * in a longer document, which Jaccard dilutes by the size gap).
    */
  def overlapCounts(pairs: DataFrame, sh: DataFrame,
                    sizes: Option[DataFrame] = None,
                    eager: Boolean = true): DataFrame = {
    val sz = sizes.getOrElse(
      sh.groupBy("doc_id").agg(count(lit(1)).as("sz")))
    val candIds = pairs.select(col("id1").as("doc_id"))
      .unionByName(pairs.select(col("id2").as("doc_id")))
      .distinct()
    // candidate shingles collapse to 64-bit keys before the intersection
    // join: the (doc_id, shingle) shuffle then moves 8-byte longs instead
    // of ~25-byte n-gram strings (same trick as the decon queries'
    // shingleKeys). Intersection COUNTS are hash-invariant — a within-doc
    // collision among ~1M distinct shingles has probability ~5e-8 and
    // would be caught by the oracle hash gate.
    // MATERIALIZED (eager, lineage-truncated) by default: both
    // intersection sides read this frame, and without the checkpoint each
    // alias re-scans the full corpus shingle table for its semi-join — at
    // 100 TB that is two passes over the biggest table in the pipeline to
    // build the same small suspects-only result twice. The
    // materialization is bounded by candidate count × shingles-per-doc,
    // not corpus size. `eager = false` keeps the frame lazy so
    // plan-inspection callers don't trigger a Spark job at build time.
    val shCandLazy = sh.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), xxhash64(col("shingle")).as("shk"))
    val shCand = if (eager) shCandLazy.localCheckpoint() else shCandLazy
    val a = shCand.alias("sa")
    val b = shCand.alias("sb")
    val inter = pairs.alias("p")
      .join(a, col("p.id1") === col("sa.doc_id"))
      .join(b, col("p.id2") === col("sb.doc_id") &&
        col("sa.shk") === col("sb.shk"))
      .groupBy(col("p.id1").as("id1"), col("p.id2").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.withColumnRenamed("doc_id", "id1")
        .withColumnRenamed("sz", "sz1"), "id1")
      .join(sz.withColumnRenamed("doc_id", "id2")
        .withColumnRenamed("sz", "sz2"), "id2")
  }

  /** Exact repeated-span removal intervals (Lee et al. 2022 shape):
    * every `spanLen`-token span occurring in MORE THAN ONE document is
    * removed from every doc except the span's min-id keeper; overlapping
    * removals merge into per-doc half-open token intervals
    * `(doc_id, start_tok, end_tok, n_spans)`.
    *
    * Pipeline: positional token windows hash to md5 keys (one
    * posexplode — |tokens| rows), one hash-keyed shuffle groups
    * occurrences (cross-doc test = min≠max doc id, no distinct agg),
    * removals join back on the hash, and the interval merge is a
    * per-doc gaps-and-islands window (state bounded by doc length). The
    * linear full-scan alternative to suffix-array span dedup — every
    * stage shuffles on a fixed-width key, so it scales like exact
    * dedup, never like pairwise comparison.
    *
    * `df` must carry (`idCol`, `textCol`); persist/checkpoint the span
    * table at the call site if the frame feeds multiple consumers.
    */
  def repeatedSpanIntervals(df: DataFrame, idCol: String, textCol: String,
                            spanLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .select(col(idCol).as("doc_id"),
        split(normalize(col(textCol)), " ").as("t"))
      .where(size(col("t")) >= spanLen)
    val spans = toks.select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(t) - $spanLen), " +
          s"i -> md5(concat_ws(' ', slice(t, i + 1, $spanLen))))")))
      .select(col("doc_id"), col("pos"), col("col").as("h"))
      .persist()
    val dup = spans.groupBy("h")
      .agg(min("doc_id").as("keep_doc"), max("doc_id").as("max_doc"))
      .where(col("keep_doc") =!= col("max_doc"))
      .select("h", "keep_doc")
    val rem = spans.join(dup, "h")
      .where(col("doc_id") =!= col("keep_doc"))
      .select(col("doc_id"), col("pos").cast("long").as("s0"),
        (col("pos") + spanLen).cast("long").as("s1"))
    val w = Window.partitionBy("doc_id").orderBy("s0", "s1")
    val isl = rem
      .withColumn("pm",
        max("s1").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("island",
        sum(when(col("pm").isNull || col("s0") > col("pm"), 1L)
          .otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val out = isl.groupBy("doc_id", "island")
      .agg(min("s0").as("start_tok"), max("s1").as("end_tok"),
        count(lit(1)).as("n_spans"))
      .select("doc_id", "start_tok", "end_tok", "n_spans")
      .localCheckpoint() // eager — release the span cache below
    spans.unpersist()
    out
  }

  /** 16-bit SimHash per doc from its shingle stream (frequency-weighted:
    * pass a non-dedup'd stream so repeated shingles vote repeatedly —
    * the classic form): each shingle hashes to a 60-bit integer (first 15
    * hex chars of md5); per bit position the ±1 votes are summed and the
    * sign becomes the bit. Ties (sum == 0) count as 1 — fixed so the
    * result is engine-portable.
    *
    * The occurrence stream is pre-aggregated to `(doc_id, shingle) → cnt`
    * BEFORE hashing: corpora repeat shingles heavily, so each distinct
    * (doc, shingle) pair is md5'd once and votes with weight `cnt` —
    * identical result to per-occurrence voting (a sum over occurrences is
    * the distinct vote × its multiplicity) at a fraction of the hash
    * work. A doc's shingle occurrences are co-located in the partition
    * that exploded them, so the map-side partial collapses the duplicates
    * and the extra shuffle carries only distinct pairs.
    */
  def simhash16(sh: DataFrame): DataFrame = {
    val counted = sh.groupBy("doc_id", "shingle")
      .agg(count(lit(1)).as("cnt"))
    val v = expr("cast(conv(substring(md5(shingle), 1, 15), 16, 10) as bigint)")
    val votes = counted.select(col("doc_id"), v.as("v"), col("cnt"))
      .groupBy("doc_id")
      .agg(
        sum(expr(s"((shiftright(v, 0) & 1) * 2 - 1) * cnt")).as("b0"),
        (1 until 16).map(j =>
          sum(expr(s"((shiftright(v, $j) & 1) * 2 - 1) * cnt")).as(s"b$j")): _*)
    val simhash = (0 until 16)
      .map(j => expr(s"if(b$j >= 0, ${1 << j}, 0)"))
      .reduce(_ + _)
    votes.select(col("doc_id"), simhash.as("simhash"))
  }
}
