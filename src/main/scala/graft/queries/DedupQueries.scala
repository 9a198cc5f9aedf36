package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{KMeans, TextDedup, VectorSim}

/** Deduplication over the `documents` and `embeddings` corpora — the
  * training-data-pipeline operator family: exact content dedup, MinHash
  * banded LSH near-dup, SimHash bucketing, blocked n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * The driver fixtures contain no duplicates, so each query derives a
  * corpus with injected duplicates (exact copies / prepended-token
  * near-copies / perturbed vectors) — the same derivation is mirrored in
  * the DuckDB oracle, making even the LSH paths hash-checkable: every
  * hash is md5-based and every float reduction is a sequential fold, so
  * both engines compute bit-identical buckets, pairs, and scores.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** documents ∪ exact copies of every doc_id % 3 == 0 (ids offset 1e9). */
  private def corpusExact(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000000).as("doc_id"), col("text")))
  }

  /** documents ∪ near-copies ('xdup ' prepended) of doc_id % 5 == 0. */
  private def corpusNear(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000000).as("doc_id"),
          concat(lit("xdup "), col("text")).as("text")))
  }

  /** Sampled corpus with metadata for blocked pairwise comparison. */
  private def corpusNgram(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .filter(col("doc_id") % 10 === 0)
    d.unionByName(
      d.select((col("doc_id") + 1000000000).as("doc_id"),
        concat(lit("xdup "), col("text")).as("text"),
        col("lang"), col("source"), col("n_chars")))
  }

  /** embeddings ∪ perturbed copies (first component +0.05) of
    * vec_id % 7 == 0, widened to array<double>.
    */
  private def corpusVec(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
      .select(col("vec_id"),
        VectorSim.toDoubleArray(col("embedding")).as("e"))
    e.unionByName(
      e.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 1000000000).as("vec_id"),
          concat(array(element_at(col("e"), 1) + 0.05),
            slice(col("e"), lit(2), size(col("e")) - 1)).as("e")))
  }

  /** Verified near-dup pairs (jaccard >= 0.6), computed ONCE per
    * (SparkContext, sfDir) and shared by `doc_dedup_minhash` and
    * `doc_dedup_clusters` — the materialized-view pattern: the pairs are
    * the expensive artifact (shingle explode + LSH + exact verify), the
    * cluster collapse is a cheap consumer, and recomputing the whole
    * pipeline per consumer doubles the dominant cost. `localCheckpoint`
    * materializes the (small) result as executor blocks; keying by
    * `applicationId` scopes cached references to the context that owns
    * those blocks (a fresh context gets a fresh compute).
    */
  /** Shingle-set + minhash-signature tables for the PLAIN documents,
    * materialized ONCE per (SparkContext, sfDir) and shared by every
    * minhash consumer (`verifiedPairs` below and `doc_dedup_containment`).
    * A doc's shingles and signature depend only on its own text, so the
    * base-corpus slice is IDENTICAL across the different injected-dup
    * corpora — this is the production shape too: signature/shingle tables
    * are materialized artifacts computed once per corpus snapshot and
    * reused by every dedup job that week, not re-derived per query. Kept
    * `persist`ed for the app's lifetime (shingles ≈ |corpus tokens| rows —
    * the scale knob is cluster cache/disk; at 100 TB this lives as a
    * parquet side table, which `StorageLevel` spilling approximates here).
    */
  private val baseMinhashCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (DataFrame, DataFrame)]

  /** (shingles, signature) of the plain `documents` corpus. */
  private def baseMinhash(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    graft.CacheRegistry.read("dedup.base_minhash")
    baseMinhashCache.getOrElseUpdate(
      (s.sparkContext.applicationId, dir), {
        graft.CacheRegistry.built("dedup.base_minhash")
        val sh = TextDedup
          .shingles(docs(s, dir).select("doc_id", "text"), "doc_id", "text")
          .persist()
        val sig = TextDedup.minhashSignature(sh).persist()
        (sh, sig)
      })
  }

  /** SimHash signature table over the near-dup corpus, materialized
    * ONCE per (SparkContext, sfDir) and shared by `doc_dedup_simhash`
    * (bucket profile) and `doc_dedup_simhash_hamming` (pigeonhole-
    * banded Hamming join) — the same signature-as-artifact shape as
    * [[baseMinhash]]: a doc's 16-bit signature depends only on its own
    * text, the shingle explode + per-(doc,shingle) md5 is by far the
    * dominant cost of either consumer, and a production pipeline
    * computes signatures once per corpus snapshot and serves every
    * dedup job from the table. localCheckpoint'd — ~1 row of 2 longs
    * per doc, metadata-scale next to the shingle stream it replaces.
    */
  private val simhashSigCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), DataFrame]

  private def simhashSigs(s: SparkSession, dir: String): DataFrame = {
    graft.CacheRegistry.read("dedup.simhash_signatures")
    simhashSigCache.getOrElseUpdate(
      (s.sparkContext.applicationId, dir), {
        graft.CacheRegistry.built("dedup.simhash_signatures")
        TextDedup.simhash16(
          TextDedup.shingles(corpusNear(s, dir), "doc_id", "text",
            dedup = false))
          .localCheckpoint()
      })
  }

  /** Run the banded-LSH pipeline over base docs ∪ `extra` docs, reusing
    * the shared base shingle/signature tables: only the (small) injected
    * side pays explode + signature cost. Returns overlap counts
    * (id1, id2, inter, sz1, sz2) for verified candidate pairs.
    */
  private def minhashOverlap(s: SparkSession, dir: String,
                             extra: DataFrame): DataFrame = {
    val (baseSh, baseSig) = baseMinhash(s, dir)
    // the extra side is consumed twice (signature + intersection join)
    val extraSh = TextDedup.shingles(extra, "doc_id", "text").persist()
    val sh = baseSh.unionByName(extraSh)
    val sig = baseSig.unionByName(TextDedup.minhashSignature(extraSh))
      .persist()
    val pairs = TextDedup.candidatePairs(TextDedup.bandBuckets(sig))
      .persist()
    val out = TextDedup.overlapCounts(pairs, sh,
        sizes = Some(sig.select("doc_id", "sz")))
      .localCheckpoint() // eager — caches released before returning
    pairs.unpersist(); sig.unpersist(); extraSh.unpersist()
    out
  }

  /** Incremental cross-snapshot dedup — the weekly-cadence shape: dedup
    * the NEWEST snapshot (here: the injected near-copy delivery, ids
    * offset +1e9) against the PERSISTED historical minhash index
    * ([[baseMinhash]]) without re-shingling history. Only the new
    * snapshot pays explode + signature cost; the historical side is
    * consumed as two cached side tables (shingles + signatures — the
    * artifacts a production pipeline materializes once per corpus
    * snapshot). Candidate generation joins NEW band buckets against
    * history ∪ new buckets, so history×history candidates are never
    * formed — per delivery the work is O(|new| + matched suspects), not
    * O(|corpus|). The bucket-size cap is computed over the FULL bucket
    * stream so the capped candidate set is identical to the full-corpus
    * run's; the result therefore equals full-corpus dedup restricted to
    * newest-side pairs (the oracle's formulation, and pinned in
    * Round7QueriesSpec together with the plan property that every
    * shingle explode sits on the new side).
    *
    * `inspect = true` returns the un-materialized frame (no persists,
    * no checkpoint) so specs can walk the plan.
    */
  private[graft] def incrementalDedup(s: SparkSession, dir: String,
                                      inspect: Boolean = false): DataFrame = {
    val (baseSh, baseSig) = baseMinhash(s, dir)
    val newDocs = docs(s, dir).select("doc_id", "text")
      .filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000000).as("doc_id"),
        concat(lit("xdup "), col("text")).as("text"))
    val newShRaw = TextDedup.shingles(newDocs, "doc_id", "text")
    val newSh = if (inspect) newShRaw else newShRaw.persist()
    // ONE persisted signature union feeds every downstream consumer
    // (bucket stream ×3, sizes ×2) — measured faster at bench scale
    // than fanning consumers out over separate cached tables, and the
    // only per-run signature work is the (small) new side's
    val sigAllRaw = baseSig.unionByName(TextDedup.minhashSignature(newSh))
    val sigAll = if (inspect) sigAllRaw else sigAllRaw.persist()
    val allB = TextDedup.bandBuckets(sigAll)
    // same oversized-key cap as candidatePairs, over the FULL stream so
    // incremental and full-corpus candidate sets agree exactly
    val oversized = allB.groupBy("band", "key")
      .agg(count(lit(1)).as("_bsz"))
      .where(col("_bsz") > TextDedup.DefaultMaxBucketSize)
      .select("band", "key")
    // the cap is applied to the (small) probe side only — the pair join
    // is inner on (band, key), so keys dropped here form no pairs no
    // matter what the other side holds (same one-sided-cap argument as
    // candidatePairs); the probe side is a FILTER of the shared bucket
    // stream (new snapshot ids sit above the +1e9 offset), not a second
    // bucket pipeline
    val cappedNew = allB.where(col("doc_id") >= 1000000000L)
      .join(broadcast(oversized), Seq("band", "key"), "left_anti")
    val pairsRaw = cappedNew.alias("n")
      .join(allB.alias("o"),
        col("n.band") === col("o.band") && col("n.key") === col("o.key") &&
          col("n.doc_id") =!= col("o.doc_id"))
      .select(least(col("n.doc_id"), col("o.doc_id")).as("id1"),
        greatest(col("n.doc_id"), col("o.doc_id")).as("id2"))
      .distinct()
    val pairs = if (inspect) pairsRaw else pairsRaw.persist()
    val sh = baseSh.unionByName(newSh)
    val verified = TextDedup.jaccardVerify(pairs, sh,
        Some(sigAll.select("doc_id", "sz")), eager = !inspect)
      .where(col("jaccard") >= 0.6)
    if (inspect) verified
    else {
      val out = verified.localCheckpoint() // eager — release caches below
      pairs.unpersist(); sigAll.unpersist(); newSh.unpersist()
      out
    }
  }

  private val verifiedPairsCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def verifiedPairs(s: SparkSession, dir: String): DataFrame = {
    graft.CacheRegistry.read("dedup.verified_pairs")
    verifiedPairsCache.getOrElseUpdate(
      (s.sparkContext.applicationId, dir), {
        graft.CacheRegistry.built("dedup.verified_pairs")
        val d = docs(s, dir).select("doc_id", "text")
        val nearCopies = d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000000).as("doc_id"),
            concat(lit("xdup "), col("text")).as("text"))
        minhashOverlap(s, dir, nearCopies)
          .select(col("id1"), col("id2"),
            (col("inter").cast("double") /
              (col("sz1") + col("sz2") - col("inter")).cast("double"))
              .as("jaccard"))
          .where(col("jaccard") >= 0.6)
          .localCheckpoint()
      })
  }

  /** Historical cluster labels — connected components over the pairs
    * among PLAIN docs only (ids < 1e9), persisted per (SparkContext,
    * sfDir): the label table the incremental cluster query folds new
    * pairs into (one row per clustered doc — far smaller than the pair
    * history it summarizes).
    */
  private val histClustersCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def histClusters(s: SparkSession, dir: String): DataFrame = {
    graft.CacheRegistry.read("dedup.hist_clusters")
    histClustersCache.getOrElseUpdate(
      (s.sparkContext.applicationId, dir), {
      graft.CacheRegistry.built("dedup.hist_clusters")
      graft.operators.GraphOps.connectedComponents(
          verifiedPairs(s, dir).where(col("id2") < 1000000000L)
            .select("id1", "id2"))
        .localCheckpoint()
    })
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: normalize -> md5 -> one shuffle on the content hash;
    // keep-first = min id per group. group_size = 2 marks injected dups.
    "doc_dedup_exact" -> ((s, dir) =>
      corpusExact(s, dir)
        .select(col("doc_id"), md5(TextDedup.normalize(col("text"))).as("h"))
        .groupBy("h")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("group_size"))
        .select("keep_id", "group_size", "h")),

    // MinHash near-dup: shingle -> 8-component min-wise signature ->
    // 4 banded buckets -> in-bucket candidate pairs -> exact Jaccard
    // verify. No all-pairs stage anywhere. Result is the shared
    // verifiedPairs materialization (also feeds doc_dedup_clusters).
    "doc_dedup_minhash" -> ((s, dir) => verifiedPairs(s, dir)),

    // keep-best selection: within each exact-dup group keep the HIGHEST
    // QUALITY member (longest text, min id tiebreak) instead of the
    // arbitrary keep-first — the policy real pipelines want (dups often
    // differ by truncation). One bounded-heap top-1 per group via
    // TopKPerKey: never sorts a group, k=1 rows resident.
    "doc_dedup_keep_best" -> ((s, dir) => {
      val scored = corpusExact(s, dir)
        .select(col("doc_id"), md5(TextDedup.normalize(col("text"))).as("h"),
          length(col("text")).cast("long").as("quality"))
      graft.plans.TopKPerKey
        .topK(scored, "h", Seq(("quality", true), ("doc_id", false)), 1)
        .select(col("h"), col("doc_id").as("keep_id"), col("quality"))
    }),

    // cluster collapse: pairwise verdicts under-delete (A~B, B~C but
    // A!~C never groups the three) — connected components over the
    // verified pairs assigns every doc its transitive dup group, keyed
    // by the group's min id. Iterative min-label propagation
    // (operators/GraphOps); the recursive-CTE oracle computes the same
    // unique fixpoint.
    "doc_dedup_clusters" -> ((s, dir) => {
      // CC consumes the SHARED verified-pairs materialization — its cost
      // is the component collapse itself, not a re-run of the LSH pipeline
      val pairs = verifiedPairs(s, dir).select("id1", "id2")
      graft.operators.GraphOps.connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))
    }),

    // containment near-dup: asymmetric overlap (inter / min size) over
    // the SAME LSH candidate machinery — catches a SNIPPET embedded in a
    // longer document, which symmetric Jaccard dilutes by the size gap
    // (a 70% prefix scores j ≈ 0.7 but containment ≈ 1.0). Corpus
    // injects prefix snippets (doc_id % 7) to make the distinction
    // observable. Candidates still come from minhash bands — which
    // estimate JACCARD, so very small snippets (low j) under-recall;
    // that recall trade is the documented cost of keeping candidate
    // generation sub-quadratic (the decon inverted index is the
    // alternative when the snippet side is small enough to broadcast).
    "doc_dedup_containment" -> ((s, dir) => {
      val snippets = docs(s, dir).select("doc_id", "text")
        .filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          substring(col("text"), 1, 210).as("text"))
      // base shingles/signatures come from the shared materialization —
      // only the snippet side (1/7 of the corpus, 210 chars each) pays
      // explode + signature cost here
      minhashOverlap(s, dir, snippets)
        .withColumn("contain",
          col("inter").cast("double") /
            least(col("sz1"), col("sz2")).cast("double"))
        .where(col("contain") >= 0.9)
        .select(col("id1"), col("id2"), col("inter"),
          round(col("contain"), 4).as("contain4"),
          round(col("inter").cast("double") /
            (col("sz1") + col("sz2") - col("inter")).cast("double"), 4)
            .as("jaccard4"))
    }),

    // incremental cross-snapshot dedup: newest snapshot vs the persisted
    // historical minhash index — see [[incrementalDedup]]
    "doc_dedup_incremental" -> ((s, dir) => incrementalDedup(s, dir)),

    // incremental cluster collapse — the graph member of the incremental
    // family: weekly clustering does NOT re-run connected components
    // over the full pair history; it folds the PERSISTED label table
    // (one row per doc) with the new week's pairs. Correct because CC
    // labels are component-minimum ids, so contracting each historical
    // component onto its min-id node (the (id → label) star edges)
    // preserves both connectivity and the eventual labels — CC is a
    // semilattice fold and the quotient is lossless for it. The result
    // is therefore IDENTICAL to doc_dedup_clusters' full recompute
    // (same oracle), while the CC input shrinks from |pair history| to
    // |clustered docs| + |new pairs|.
    "doc_dedup_clusters_incremental" -> ((s, dir) => {
      val newPairs = verifiedPairs(s, dir)
        .where(col("id2") >= 1000000000L).select("id1", "id2")
      val edges = histClusters(s, dir)
        .select(col("id").as("id1"), col("component").as("id2"))
        .unionByName(newPairs)
      graft.operators.GraphOps.connectedComponents(edges)
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))
    }),

    // exact repeated-span dedup (the "deduplicating training data"
    // operator, cf. Lee et al. 2022) via
    // [[TextDedup.repeatedSpanIntervals]] — catches shared boilerplate /
    // quoted passages that whole-doc near-dup misses; the operator is
    // additionally property-verified against an independent reference
    // implementation on random corpora (Round7QueriesSpec). Corpus
    // injects composite docs (210-char prefix of every doc_id % 4 == 0
    // doc + a 3-token tail) so cross-doc spans exist by construction;
    // the tail is too short to form spans of its own.
    "doc_dedup_spans" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
      val corpus = d.unionByName(
        d.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 300000).as("doc_id"),
            concat(substring(col("text"), 1, 210), lit(" zq tail zq"))
              .as("text")))
      TextDedup.repeatedSpanIntervals(corpus, "doc_id", "text",
        spanLen = 15)
    }),

    // SimHash bucketing: 16-bit signature from shingle-hash bit votes;
    // buckets with >1 doc are dup candidates (no pair explosion).
    "doc_dedup_simhash" -> ((s, dir) => {
      simhashSigs(s, dir)
        .groupBy("simhash")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"))
        .where(col("n_docs") > 1)
        .select(col("simhash").cast("long").as("simhash"),
          col("n_docs"), col("min_doc"))
    }),

    // SimHash Hamming near-dup — the distance-threshold consumer of the
    // simhash signature, made sub-quadratic by the PIGEONHOLE bands
    // trick: split the 16-bit signature into 3 bands (6/5/5 bits); two
    // signatures within Hamming distance 2 differ in at most 2 bands,
    // so AT LEAST ONE band matches exactly — candidates come from three
    // band-equality joins (never all-pairs), then bit_count(xor) keeps
    // the true ≤2 pairs. Recall is EXACT at this threshold (pigeonhole
    // is a theorem, not a probability), which is the property that
    // distinguishes this from minhash banding. Integer-only arithmetic
    // end to end.
    "doc_dedup_simhash_hamming" -> ((s, dir) => {
      val sim = simhashSigs(s, dir)
      val banded = sim.select(col("doc_id"), col("simhash"),
        expr("simhash & 63").as("b0"),
        expr("(simhash >> 6) & 31").as("b1"),
        expr("(simhash >> 11) & 31").as("b2"))
      val probes = Seq(("b0", 0), ("b1", 1), ("b2", 2)).map { case (c, t) =>
        banded.select(col("doc_id"), col("simhash"),
          lit(t).as("t"), col(c).as("bk"))
      }.reduce(_ unionByName _)
      val a = probes.alias("a")
      val b = probes.alias("b")
      a.join(b, col("a.t") === col("b.t") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          col("a.simhash").as("s1"), col("b.simhash").as("s2"))
        .distinct()
        .select(col("id1"), col("id2"),
          expr("bit_count(s1 ^ s2)").cast("long").as("hdist"))
        .where(col("hdist") <= 2)
    }),

    // blocked n-gram Jaccard: candidate pairs meet only inside a
    // (lang, source, length-bucket) block — the classic blocking guard
    // against quadratic comparison.
    "doc_dedup_ngram" -> ((s, dir) => {
      val c = corpusNgram(s, dir)
        .withColumn("blk", expr("n_chars div 100"))
      val a = c.alias("a")
      val b = c.alias("b")
      val pairs = a.join(b,
          col("a.lang") === col("b.lang") &&
            col("a.source") === col("b.source") &&
            col("a.blk") === col("b.blk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .persist() // consumed twice inside jaccardVerify
      val sh = TextDedup.shingles(c, "doc_id", "text").persist()
      val out = TextDedup.jaccardVerify(pairs, sh)
        .where(col("jaccard") >= 0.5)
        .localCheckpoint() // eager — release the cache before returning
      pairs.unpersist()
      sh.unpersist()
      out
    }),

    // embedding near-dup: 8-hyperplane LSH signature buckets, exact
    // cosine re-rank of in-bucket pairs only.
    "emb_dedup_cosine" -> ((s, dir) => {
      // norm precomputed once per vector: each in-bucket pair costs one
      // dot-product fold, not three (bit-identical factoring)
      val c = corpusVec(s, dir)
        .withColumn("sig", VectorSim.lshSignature(col("e")))
        .withColumn("nrm", VectorSim.norm(col("e")))
      val a = c.alias("a")
      val b = c.alias("b")
      a.join(b, col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
          (VectorSim.dot(col("a.e"), col("b.e")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
        .where(col("cos") >= 0.99)
        .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos4"))
    }),

    // semantic dedup (SemDeDup shape): k-means-cluster the embedding
    // corpus, then prune near-duplicates WITHIN each cluster only — the
    // clustering bounds the pairwise stage, which is what makes
    // embedding dedup tractable at corpus scale (K grows with the
    // corpus, cluster size stays bounded, and the all-pairs cosine never
    // crosses a cluster boundary). Clustering reuses the literal-
    // centroid Lloyd machinery (seed by bottom-K md5, one re-estimate,
    // assign — zero corpus shuffles); the pairwise stage shuffles the
    // corpus ONCE by cluster id. Drop policy is deterministic: a vector
    // is pruned iff a LOWER-id cluster-mate sits within cos >= 0.99
    // (same unrounded-compare contract as emb_dedup_cosine — identical
    // sequential folds on both engines make the threshold exact).
    "doc_dedup_semantic" -> ((s, dir) => {
      val K = 4
      val c = corpusVec(s, dir)
      val c0 = KMeans.seedCentroids(c, K, "sem|")
      val a1 = KMeans.assignL2(c, c0)
      val c1 = KMeans.collectCentroids(a1, "cl")
        .map { case (k, v) => (k.asInstanceOf[Long], v) }
      val a2 = KMeans.assignL2(c, c1)
        .withColumn("nrm", VectorSim.norm(col("e")))
        .select("vec_id", "cl", "e", "nrm")
      val a = a2.alias("a")
      val b = a2.alias("b")
      val pruned = a.join(b, col("a.cl") === col("b.cl") &&
          col("b.vec_id") < col("a.vec_id"))
        .where(VectorSim.dot(col("a.e"), col("b.e")) /
          (col("a.nrm") * col("b.nrm")) >= 0.99)
        .select(col("a.vec_id").as("vec_id")).distinct()
      a2.join(pruned.withColumn("p", lit(1)), Seq("vec_id"), "left_outer")
        .groupBy(col("cl").as("cluster"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("p").isNull, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("p").isNotNull, 1L).otherwise(0L)).as("n_pruned"))
    }),
  )

  /** Shared oracle fragments (kept in lockstep with the Spark corpora). */
  private val normSql =
    "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  private def shinglesCte(corpus: String, dedup: Boolean = true): String = {
    val distinct = if (dedup) "DISTINCT " else ""
    s"""toks AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS t FROM $corpus
       |), sh AS (
       |  SELECT ${distinct}doc_id, shingle FROM (
       |    SELECT doc_id,
       |      unnest([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]) AS shingle
       |    FROM toks WHERE len(t) >= 3) q
       |)""".stripMargin
  }

  private val jaccardSql =
    """sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT p.id1, p.id2, count(*) AS n
      |  FROM pairs p
      |  JOIN sh sa ON sa.doc_id = p.id1
      |  JOIN sh sb ON sb.doc_id = p.id2 AND sb.shingle = sa.shingle
      |  GROUP BY p.id1, p.id2)
      |SELECT i.id1, i.id2,
      |  CAST(i.n AS DOUBLE) / CAST(s1.sz + s2.sz - i.n AS DOUBLE) AS jaccard
      |FROM inter i
      |JOIN sizes s1 ON s1.doc_id = i.id1
      |JOIN sizes s2 ON s2.doc_id = i.id2""".stripMargin

  /** The full minhash near-dup SQL — shared by `doc_dedup_minhash` and
    * (as a subquery) `doc_dedup_clusters`.
    */
  /** sig → band buckets → distinct candidate pairs, from an `sh` CTE —
    * the SQL mirror of minhashSignature/bandBuckets/candidatePairs,
    * shared by the jaccard and containment oracles.
    */
  private lazy val lshPairsSql =
    s"""sig AS (
       |  SELECT doc_id,
       |    ${(0 until 8).map(i => s"min(substr(h, ${4 * i + 1}, 4)) AS m$i").mkString(",\n    ")}
       |  FROM (SELECT doc_id, md5('mh|' || shingle) AS h FROM sh) hs
       |  GROUP BY doc_id
       |), buckets AS (
       |  ${(0 until 4).map(b =>
           s"SELECT doc_id, $b AS band, md5(m${2 * b} || m${2 * b + 1}) AS key FROM sig")
           .mkString("\n  UNION ALL ")}
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM buckets a
       |  JOIN buckets b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |)""".stripMargin

  /** Per-doc 16-bit simhash over the near-copy corpus (`sims` CTE) —
    * shared by the bucket-grouping and Hamming-threshold oracles.
    */
  private lazy val simhashDocsCte =
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000000, 'xdup ' || text FROM documents WHERE doc_id % 5 = 0
       |), ${shinglesCte("corpus", dedup = false)},
       |votes AS (
       |  SELECT doc_id,
       |    ${(0 until 16).map(j => s"sum(((v >> $j) & 1) * 2 - 1) AS b$j").mkString(",\n    ")}
       |  FROM (SELECT doc_id,
       |          CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS v
       |        FROM sh) q
       |  GROUP BY doc_id
       |), sims AS (
       |  SELECT doc_id,
       |    ${(0 until 16).map(j => s"(CASE WHEN b$j >= 0 THEN ${1 << j} ELSE 0 END)").mkString(" + ")} AS simhash
       |  FROM votes
       |)""".stripMargin

  private lazy val minhashOracle =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000000, 'xdup ' || text FROM documents WHERE doc_id % 5 = 0
       |), ${shinglesCte("corpus")},
       |$lshPairsSql, $jaccardSql
       |WHERE CAST(i.n AS DOUBLE) / CAST(s1.sz + s2.sz - i.n AS DOUBLE) >= 0.6""".stripMargin

  private lazy val clustersOracle =
    s"""WITH RECURSIVE dup AS (
       |  SELECT id1, id2 FROM ($minhashOracle) q
       |), edges AS (
       |  SELECT id1 AS src, id2 AS dst FROM dup
       |  UNION
       |  SELECT id2, id1 FROM dup
       |), nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id
       |)
       |SELECT CAST(id AS BIGINT) AS doc_id,
       |  CAST(min(r) AS BIGINT) AS cluster_id
       |FROM reach GROUP BY id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "doc_dedup_exact" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000000, text FROM documents WHERE doc_id % 3 = 0
         |)
         |SELECT min(doc_id) AS keep_id, count(*) AS group_size, h
         |FROM (SELECT doc_id, md5($normSql) AS h FROM corpus) q
         |GROUP BY h""".stripMargin,

    "doc_dedup_keep_best" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000000, text FROM documents WHERE doc_id % 3 = 0
         |), scored AS (
         |  SELECT doc_id, md5($normSql) AS h,
         |    CAST(length(text) AS BIGINT) AS quality
         |  FROM corpus
         |)
         |SELECT h, doc_id AS keep_id, quality FROM (
         |  SELECT h, doc_id, quality,
         |    row_number() OVER (PARTITION BY h
         |      ORDER BY quality DESC, doc_id) AS rn
         |  FROM scored) q
         |WHERE rn = 1""".stripMargin,

    "doc_dedup_minhash" -> minhashOracle,

    // incremental = full-corpus dedup restricted to pairs touching the
    // newest snapshot (new ids are all >= 1e9 and id1 < id2, so
    // id2 >= 1e9 ⇔ at least one member is new)
    "doc_dedup_incremental" ->
      s"""SELECT id1, id2, jaccard FROM ($minhashOracle) q
         |WHERE id2 >= 1000000000""".stripMargin,

    "doc_dedup_containment" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 200000, substr(text, 1, 210)
         |  FROM documents WHERE doc_id % 7 = 0
         |), ${shinglesCte("corpus")},
         |$lshPairsSql,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT p.id1, p.id2, count(*) AS n
         |  FROM pairs p
         |  JOIN sh sa ON sa.doc_id = p.id1
         |  JOIN sh sb ON sb.doc_id = p.id2 AND sb.shingle = sa.shingle
         |  GROUP BY p.id1, p.id2)
         |SELECT i.id1, i.id2, i.n AS inter,
         |  round(CAST(i.n AS DOUBLE) / CAST(least(s1.sz, s2.sz) AS DOUBLE), 4) AS contain4,
         |  round(CAST(i.n AS DOUBLE) / CAST(s1.sz + s2.sz - i.n AS DOUBLE), 4) AS jaccard4
         |FROM inter i
         |JOIN sizes s1 ON s1.doc_id = i.id1
         |JOIN sizes s2 ON s2.doc_id = i.id2
         |WHERE CAST(i.n AS DOUBLE) / CAST(least(s1.sz, s2.sz) AS DOUBLE) >= 0.9""".stripMargin,

    // cluster collapse of the verified near-dup pairs: connected
    // components via recursive min-label closure (the batch engine does
    // min-label propagation to fixpoint — same unique answer)
    "doc_dedup_clusters" -> clustersOracle,

    // the incremental fold over the persisted label table produces
    // labels IDENTICAL to the full recompute — same oracle by design
    "doc_dedup_clusters_incremental" -> clustersOracle,

    "doc_dedup_spans" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 300000, substr(text, 1, 210) || ' zq tail zq'
         |  FROM documents WHERE doc_id % 4 = 0
         |), toks AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS t FROM corpus
         |), spans AS (
         |  SELECT doc_id,
         |    unnest(range(0, len(t) - 15 + 1)) AS pos,
         |    unnest([md5(array_to_string(t[i+1:i+15], ' '))
         |            FOR i IN range(0, len(t) - 15 + 1)]) AS h
         |  FROM toks WHERE len(t) >= 15
         |), dup AS (
         |  SELECT h, min(doc_id) AS keep_doc FROM spans
         |  GROUP BY h HAVING min(doc_id) <> max(doc_id)
         |), rem AS (
         |  SELECT s.doc_id, CAST(s.pos AS BIGINT) AS s0,
         |    CAST(s.pos + 15 AS BIGINT) AS s1
         |  FROM spans s JOIN dup d ON d.h = s.h
         |  WHERE s.doc_id <> d.keep_doc
         |), ord AS (
         |  SELECT doc_id, s0, s1,
         |    max(s1) OVER (PARTITION BY doc_id ORDER BY s0, s1
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |  FROM rem
         |), isl AS (
         |  SELECT doc_id, s0, s1,
         |    sum(CASE WHEN pm IS NULL OR s0 > pm THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY s0, s1
         |            ROWS UNBOUNDED PRECEDING) AS island
         |  FROM ord
         |)
         |SELECT doc_id, min(s0) AS start_tok, max(s1) AS end_tok,
         |  count(*) AS n_spans
         |FROM isl GROUP BY doc_id, island""".stripMargin,

    "doc_dedup_simhash" ->
      s"""WITH $simhashDocsCte
         |SELECT CAST(simhash AS BIGINT) AS simhash, count(*) AS n_docs,
         |  min(doc_id) AS min_doc
         |FROM sims
         |GROUP BY simhash HAVING count(*) > 1""".stripMargin,

    "doc_dedup_simhash_hamming" ->
      s"""WITH $simhashDocsCte,
         |banded AS (
         |  SELECT doc_id, simhash,
         |    simhash & 63 AS b0,
         |    (simhash >> 6) & 31 AS b1,
         |    (simhash >> 11) & 31 AS b2
         |  FROM sims
         |), probes AS (
         |  SELECT doc_id, simhash, 0 AS t, b0 AS bk FROM banded
         |  UNION ALL SELECT doc_id, simhash, 1, b1 FROM banded
         |  UNION ALL SELECT doc_id, simhash, 2, b2 FROM banded
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
         |    a.simhash AS s1, b.simhash AS s2
         |  FROM probes a JOIN probes b
         |    ON a.t = b.t AND a.bk = b.bk AND a.doc_id < b.doc_id
         |)
         |SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hdist
         |FROM cand WHERE bit_count(xor(s1, s2)) <= 2""".stripMargin,

    "doc_dedup_ngram" ->
      s"""WITH base AS (
         |  SELECT doc_id, text, lang, source, n_chars FROM documents
         |  WHERE doc_id % 10 = 0
         |), corpus AS (
         |  SELECT doc_id, text, lang, source, n_chars FROM base
         |  UNION ALL
         |  SELECT doc_id + 1000000000, 'xdup ' || text, lang, source, n_chars FROM base
         |), blocked AS (
         |  SELECT doc_id, text, lang, source, n_chars // 100 AS blk FROM corpus
         |), pairs AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2
         |  FROM blocked a
         |  JOIN blocked b ON a.lang = b.lang AND a.source = b.source
         |    AND a.blk = b.blk AND a.doc_id < b.doc_id
         |), ${shinglesCte("corpus")},
         |$jaccardSql
         |WHERE CAST(i.n AS DOUBLE) / CAST(s1.sz + s2.sz - i.n AS DOUBLE) >= 0.5""".stripMargin,

    "emb_dedup_cosine" -> {
      val planes = (0 until 8).map(p =>
        s"[(CAST('0x' || substr(md5('hp${p}_' || CAST(d AS VARCHAR)), 1, 4) AS BIGINT) % 1001 - 500)/500.0 FOR d IN range(0, 64)] AS h$p")
        .mkString(",\n    ")
      def dotSql(a: String, b: String) =
        s"list_sum([$a[i] * $b[i] FOR i IN range(1, len($a) + 1)])"
      val sigSql = (0 until 8).map(p =>
        s"(CASE WHEN ${dotSql("e", s"h$p")} >= 0 THEN ${1 << p} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH corpus AS (
         |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000000,
         |    list_prepend(CAST(embedding[1] AS DOUBLE) + 0.05,
         |      [CAST(x AS DOUBLE) FOR x IN embedding[2:len(embedding)]])
         |  FROM embeddings WHERE vec_id % 7 = 0
         |), hp AS (
         |  SELECT
         |    $planes
         |), sigs AS (
         |  SELECT vec_id, e, $sigSql AS sig FROM corpus CROSS JOIN hp
         |)
         |SELECT id1, id2, round(cos, 4) AS cos4 FROM (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2,
         |    ${dotSql("a.e", "b.e")} /
         |      (sqrt(${dotSql("a.e", "a.e")}) * sqrt(${dotSql("b.e", "b.e")})) AS cos
         |  FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id) q
         |WHERE cos >= 0.99""".stripMargin
    },

    "doc_dedup_semantic" -> {
      def dotSql(a: String, b: String) =
        s"list_sum([$a[i] * $b[i] FOR i IN range(1, len($a) + 1)])"
      // one unrolled assignment pass against centroid table `cn`
      def assignSql(cn: String, out: String) =
        s"""$out AS (
           |  SELECT vec_id, e, i AS cl FROM (
           |    SELECT vec_id, e, i,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn
           |    FROM (
           |      SELECT b.vec_id, b.e, c.i,
           |        list_sum([(b.e[x] - c.c[x]) * (b.e[x] - c.c[x])
           |                  FOR x IN range(1, len(b.e) + 1)]) AS d
           |      FROM b, $cn c) q0) q1
           |  WHERE rn = 1)""".stripMargin
      s"""WITH b AS (
         |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000000,
         |    list_prepend(CAST(embedding[1] AS DOUBLE) + 0.05,
         |      [CAST(x AS DOUBLE) FOR x IN embedding[2:len(embedding)]])
         |  FROM embeddings WHERE vec_id % 7 = 0
         |), c0 AS (
         |  SELECT rn - 1 AS i, e AS c FROM (
         |    SELECT e, row_number() OVER (
         |      ORDER BY md5('sem|' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
         |    FROM b) q WHERE rn <= 4
         |), ${assignSql("c0", "a1")},
         |cm1 AS (
         |  SELECT cl, i - 1 AS pos,
         |    round(CAST(sum(CAST(v AS DECIMAL(18,9))) AS DOUBLE)
         |      / count(*), 6) AS m
         |  FROM (SELECT cl, unnest(e) AS v,
         |          unnest(range(1, len(e) + 1)) AS i FROM a1) q
         |  GROUP BY 1, 2
         |), c1 AS (SELECT cl AS i, list(m ORDER BY pos) AS c FROM cm1
         |          GROUP BY 1),
         |${assignSql("c1", "a2")},
         |pruned AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM a2 a JOIN a2 p ON p.cl = a.cl AND p.vec_id < a.vec_id
         |  WHERE ${dotSql("a.e", "p.e")} /
         |    (sqrt(${dotSql("a.e", "a.e")}) * sqrt(${dotSql("p.e", "p.e")}))
         |    >= 0.99
         |)
         |SELECT a2.cl AS cluster, count(*) AS n_total,
         |  CAST(sum(CASE WHEN pr.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN pr.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_pruned
         |FROM a2 LEFT JOIN pruned pr ON pr.vec_id = a2.vec_id
         |GROUP BY 1""".stripMargin
    },
  )
}
