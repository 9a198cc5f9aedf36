package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{TextDedup, VectorSim}
import graft.plans.TopKPerKey

/** Training-data curation operators over the `documents` corpus — the
  * selection / mixing / leakage-control side of an LLM data pipeline
  * (complementing the dedup family in [[DedupQueries]]):
  *
  *  - '''stratified sampling''': per-stratum keep rates applied via a
  *    deterministic content-independent hash — reproducible at any scale
  *    and across engines (no `rand()`: a resampled run, a retried task,
  *    and the DuckDB oracle all pick the same rows).
  *  - '''weighted source mixing''': fixed per-source quotas filled in
  *    hash order — the "data recipe" step that composes a training mix
  *    from heterogeneous sources; hash order makes the quota fill a
  *    deterministic uniform draw.
  *  - '''decontamination''': eval-set leakage detection by n-gram
  *    overlap through an inverted shingle index — the standard
  *    benchmark-contamination check, with a stop-shingle cap bounding
  *    the index fanout.
  *  - '''token histogram''': corpus-level length distribution — the
  *    basic curation diagnostic.
  *
  * Scale notes (100 TB): sampling and histogram are single-pass
  * (sampling is a stateless per-row filter — no shuffle at all; the
  * histogram is one partial-agg'd groupBy). Mixing is one shuffle on
  * `source` through [[TopKPerKey]]'s bounded heap (k rows resident per
  * source, never a full sort). Decontamination joins eval shingles to
  * train shingles keyed on the shingle — an inverted index, bounded by
  * the stop-shingle cap exactly like the LSH bucket cap: a shingle in
  * >N train docs is boilerplate, carries no leakage signal, and would
  * otherwise fan out quadratically.
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Deterministic per-mille hash in [0, 1000) — engine-portable
    * (md5 hex → first 8 chars → int), keyed by a salt so independent
    * sampling decisions use independent hashes.
    */
  private def hashMille(salt: String, id: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(s"$salt|"), id.cast("string"))), 1, 8),
      16, 10).cast("long") % 1000

  private def hashMilleSql(salt: String, id: String) =
    s"CAST('0x' || substr(md5('$salt|' || CAST($id AS VARCHAR)), 1, 8) AS BIGINT) % 1000"

  /** Per-language keep rates (per mille). */
  private val strataRates: Seq[(Seq[String], Int)] = Seq(
    Seq("en") -> 300, Seq("de", "fr") -> 150)
  private val defaultRate = 50

  /** Per-source quotas for the weighted mix. */
  private def quotaCol = when(col("source").isin("src0", "src1"), 40)
    .when(col("source").isin("src2", "src3"), 20)
    .otherwise(10)
  private val quotaSql =
    """CASE WHEN source IN ('src0','src1') THEN 40
      |     WHEN source IN ('src2','src3') THEN 20
      |     ELSE 10 END""".stripMargin
  private val maxQuota = 40

  /** Shingles occurring in more than this many train docs are dropped
    * from the decontamination index (boilerplate carries no signal).
    */
  private val stopShingleCap = 100

  /** Fixed eval-suite id list for cur_decon_semantic — constant BY
    * CONSTRUCTION (40 ids), so the eval broadcast stays O(1) at any
    * corpus scale; ids divisible by 50 are the injected-leak members.
    */
  private val deconSemEvalIds: Seq[Long] = (0L until 1000L by 25L).toList

  /** Per-doc DISTINCT shingles collapsed to 64-bit keys. Hashing happens
    * BEFORE the distinct so every downstream shuffle (distinct, DF
    * groupBy, index join, pair count) moves 8-byte longs instead of
    * ~25-byte 3-gram strings. Overlap COUNTS are hash-invariant (any
    * collision among ~1M shingles has probability ~5e-8 and would be
    * caught by the oracle hash gate), so the DuckDB oracles keep the
    * exact strings.
    */
  private def shingleKeys(src: DataFrame, idAlias: String): DataFrame =
    TextDedup.shingles(src, "doc_id", "text", dedup = false)
      .select(col("doc_id").as(idAlias), xxhash64(col("shingle")).as("sh"))
      .distinct()

  /** [[queries]]' `cur_decon_eval` body. `checkpoint = false` returns the
    * un-checkpointed plan (and skips the cache release) so CI can assert
    * the executed plan's join strategy — `localCheckpoint` replaces the
    * lineage with an RDD scan, which would hide the joins from the spec.
    */
  private[graft] def deconEval(s: SparkSession, dir: String,
                               checkpoint: Boolean = true): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val eval_ = d.where(col("doc_id") % 50 === 0)
    val evalSh = shingleKeys(eval_, "eval_id").persist()
    evalSh.count() // one cache fill; esz + the broadcast both read it
    val trainShRaw = TextDedup.shingles(d, "doc_id", "text", dedup = false)
      .select(col("doc_id").as("train_id"), xxhash64(col("shingle")).as("sh"))
    val matched = trainShRaw.join(broadcast(evalSh), "sh")
      .select("eval_id", "train_id", "sh").distinct()
    val esz = evalSh.groupBy("eval_id").agg(count(lit(1)).as("esz"))
    val outPlan = matched.groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(esz), "eval_id")
      .where(col("train_id") =!= col("eval_id"))
      .withColumn("overlap",
        col("n_shared").cast("double") / col("esz").cast("double"))
      .where(col("overlap") >= 0.8)
      .select(col("eval_id"), col("train_id"), col("n_shared"),
        round(col("overlap"), 4).as("overlap4"))
    if (checkpoint) {
      val out = outPlan.localCheckpoint()
      evalSh.unpersist()
      out
    } else outPlan
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // stratified sampling: keep iff hash(doc_id) < rate(lang). Stateless
    // per-row filter — no shuffle, no state, reproducible under retry.
    "cur_sample_stratified" -> ((s, dir) => {
      val rate = strataRates.foldRight(lit(defaultRate)) {
        case ((langs, r), acc) => when(col("lang").isin(langs: _*), r).otherwise(acc)
      }
      docs(s, dir)
        .where(hashMille("smp", col("doc_id")) < rate)
        .select("doc_id", "lang", "source")
    }),

    // weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    // each doc draws a deterministic uniform u from a salted hash and
    // competes on key = −ln(u)/w, so selection probability is
    // proportional to weight (here n_chars — longer docs favored) and
    // the top-k per stratum IS the weighted sample. One pass, no
    // per-stratum state beyond TopKPerKey's bounded heap, and the
    // sample is a pure function of ids — stable under reruns and
    // layout, mergeable across partitions (that is the A-ES property:
    // the reservoir is just a min-k over keys). Keys ranked at round-9
    // with an id tie-break for engine-exact order.
    "cur_sample_weighted" -> ((s, dir) => {
      val u = (conv(substring(md5(concat(lit("aes|"),
          col("doc_id").cast("string"))), 1, 12), 16, 10).cast("long")
          % 1000000L + 1L).cast("double") / 1000000.0d
      val keyed = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("double").as("w"))
        .withColumn("k9", round(-log(u) / col("w"), 9))
      TopKPerKey.topK(keyed, "lang", Seq(("k9", false), ("doc_id", false)), 20)
        .select(col("lang"), col("doc_id"), col("rank"), col("k9"))
    }),

    // deterministic train/valid/test split — the assignment every
    // training pipeline needs to be STABLE under reruns, late-arriving
    // data, and repartitioning: the split is a pure function of the
    // document id (salted hash per mille: <900 train, <950 valid, else
    // test), never of row order or partition layout. Stateless per-row
    // map + one partial-agg'd rollup — no shuffle of the corpus beyond
    // the 3-group aggregate; adding data moves nothing already assigned.
    "cur_split_hash" -> ((s, dir) => {
      val h = hashMille("split", col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), col("n_chars"),
          when(h < 900, "train").when(h < 950, "valid")
            .otherwise("test").as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars_total"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    }),

    // shard-manifest export — the last step of a curation pipeline:
    // docs are hash-assigned to 16 output shards (pure function of the
    // id: stable under retries and repartitioning, balanced by hash
    // uniformity) and the manifest records each shard's row count, char
    // budget, and id range — what a downstream trainer validates before
    // reading. One stateless map + one 16-group partial-agg'd rollup.
    "cur_shard_manifest" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), col("n_chars"),
          (hashMille("shard", col("doc_id")) % 16).as("shard"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars_total"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    }),

    // weighted mixing: fill each source's quota in hash order — one
    // bounded-heap top-k per source (TopKPerKey), then the per-source
    // quota cut. Ordering (hash, doc_id) is total, so ranks are exact.
    "cur_mix_weighted" -> ((s, dir) => {
      val withHash = docs(s, dir)
        .select(col("doc_id"), col("source"),
          md5(concat(lit("mix|"), col("doc_id").cast("string"))).as("h"))
      TopKPerKey.topK(withHash, "source",
          Seq(("h", false), ("doc_id", false)), maxQuota)
        .where(col("rank") <= quotaCol)
        .select("source", "doc_id", "rank")
    }),

    // decontamination: an eval doc is "contaminated" when a large
    // fraction of its 3-gram shingles appear in a single train doc.
    // Inverted-index join on the shingle, stop-shingle cap bounds the
    // fanout; report (eval, train) pairs with >= 80% overlap.
    "cur_decon_ngram" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
      // fixture has no real leakage, so inject it: every eval doc with
      // id % 30 == 0 carries the text of train doc id+1 (same derivation
      // in the oracle)
      val leak = d.select(col("doc_id").as("lid"), col("text").as("ltext"))
      val eval_ = d.where(col("doc_id") % 10 === 0)
        .join(leak, col("lid") === col("doc_id") + 1, "left")
        .select(col("doc_id"),
          when(col("doc_id") % 30 === 0 && col("ltext").isNotNull,
            col("ltext")).otherwise(col("text")).as("text"))
      val train = d.where(col("doc_id") % 10 =!= 0)
      val evalSh = shingleKeys(eval_, "eval_id").persist()
      // the train shingle stream (explode + per-doc distinct over ~90% of
      // the corpus) feeds BOTH the stop-set aggregation and the index
      // join — persist it so the derivation runs once, not per consumer
      // (exchange reuse is not guaranteed across a groupBy and a join
      // consumer under AQE). The two cache fills are independent jobs on
      // disjoint doc subsets — run them concurrently so the critical path
      // pays max(eval, train), not the sum.
      val trainSh = shingleKeys(train, "train_id").persist()
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      Await.result(
        Future.sequence(Seq(Future(evalSh.count()), Future(trainSh.count()))),
        Duration.Inf)
      // stop-shingle cap as a pre-aggregated STOP-set + broadcast
      // anti-join (the same shape as TextDedup.candidatePairs' bucket
      // cap, for the same reason: the stop set is tiny by construction —
      // only boilerplate shingles exceed the cap — so this costs one
      // partial-agg'd groupBy + a map-side probe, where the window
      // formulation sorted and materialized the full shingle stream)
      val stopShingles = trainSh.groupBy("sh")
        .agg(count(lit(1)).as("_df"))
        .where(col("_df") > stopShingleCap)
        .select("sh")
      val index = trainSh
        .join(broadcast(stopShingles), Seq("sh"), "left_anti")
      // eval side broadcast: the eval suite is small by construction, so
      // the index probe is a map-side hash join over the train stream —
      // the train shingles are never shuffled by shingle key (the shape
      // that survives a 100 TB train corpus)
      val shared = broadcast(evalSh).join(index, "sh")
        .groupBy("eval_id", "train_id")
        .agg(count(lit(1)).as("n_shared"))
      val evalSizes = evalSh.groupBy("eval_id").agg(count(lit(1)).as("esz"))
      val out = shared.join(evalSizes, "eval_id")
        .withColumn("overlap",
          col("n_shared").cast("double") / col("esz").cast("double"))
        .where(col("overlap") >= 0.8)
        .select(col("eval_id"), col("train_id"), col("n_shared"),
          round(col("overlap"), 4).as("overlap4"))
        .localCheckpoint()
      evalSh.unpersist()
      trainSh.unpersist()
      out
    }),

    // decontamination, PRODUCTION shape: a tiny eval benchmark suite
    // against the full corpus as train. The eval shingle set broadcasts;
    // train shingles are derived with duplicate semantics (a stateless
    // explode — NO shuffle) and map-side probed against the broadcast
    // BEFORE any aggregation, so the only shuffle in the plan is over
    // MATCHED triples — proportional to actual contamination, not corpus
    // size. This is the shape that survives a 100 TB train corpus: the
    // train stream is never shuffled, sorted, or grouped by shingle
    // (cur_decon_ngram's inverted index is the symmetric-sizes
    // alternative; this is the asymmetric one). No stop-shingle cap is
    // needed — the index IS the eval suite, bounded by construction.
    "cur_decon_eval" -> ((s, dir) => deconEval(s, dir)),

    // decontamination, EMBEDDING space: n-gram decon misses paraphrased
    // leakage; this variant flags an eval item whose embedding is
    // near-identical (cosine >= 0.999) to some training vector. The
    // eval suite is a FIXED id list (bounded by construction, like
    // sim_topk_brute_bounded's query set), so the broadcast stays O(1)
    // and the corpus side is a single map-side probe — no shuffle, no
    // all-pairs — at any train size. The fixture has no real paraphrase
    // leakage, so it is injected the same way cur_decon_ngram injects
    // textual leakage: eval ids divisible by 50 carry the embedding of
    // train vector id+1 (same derivation in the oracle). Production at
    // 100 TB keeps exactly this plan shape; only the threshold and the
    // eval suite change.
    "cur_decon_semantic" -> ((s, dir) => {
      val b = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorSim.toDoubleArray(col("embedding")).as("e"))
      // only id+1 of a %50 eval id can be consulted by the injection
      // CASE below, so the leak-partner scan is prefiltered to that
      // fixed 20-id list and broadcast — the injection join never
      // shuffles (or broadcasts) the corpus
      val leakPartnerIds = deconSemEvalIds.filter(_ % 50 == 0).map(_ + 1)
      val leak = b.where(col("vec_id").isin(leakPartnerIds: _*))
        .select(col("vec_id").as("lid"), col("e").as("le"))
      val eval_ = b.where(col("vec_id").isin(deconSemEvalIds: _*))
        .join(broadcast(leak), col("lid") === col("vec_id") + 1, "left")
        .select(col("vec_id").as("eval_id"),
          when(col("vec_id") % 50 === 0 && col("le").isNotNull, col("le"))
            .otherwise(col("e")).as("qe"))
        .withColumn("qnrm", VectorSim.norm(col("qe")))
      val train = b.where(not(col("vec_id").isin(deconSemEvalIds: _*)))
        .withColumn("nrm", VectorSim.norm(col("e")))
      train.crossJoin(broadcast(eval_))
        .select(col("eval_id"), col("vec_id").as("train_id"),
          (VectorSim.dot(col("qe"), col("e")) /
            (col("qnrm") * col("nrm"))).as("cos"))
        .where(col("cos") >= 0.999)
        .select(col("eval_id"), col("train_id"),
          round(col("cos"), 6).as("cos6"))
    }),

    // sequence packing: assign docs to fixed-capacity context windows
    // ("packs") by cumulative token offset, per source — the batching
    // step between curation and tokenization in a training pipeline.
    // Contiguous packing (a doc's pack = its start offset div capacity)
    // is deterministic and needs only a running sum; partitioning by
    // source keeps the window parallel (one global cumsum would serialize
    // — the classic scale trap for packing).
    "cur_pack_sequences" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      docs(s, dir)
        .select(col("source"), col("doc_id"),
          size(split(TextDedup.normalize(col("text")), " "))
            .cast("long").as("n_tok"))
        .withColumn("start_tok", sum("n_tok").over(w) - col("n_tok"))
        .select(col("source"), col("doc_id"), col("n_tok"),
          expr("cast(start_tok div 2048 as bigint)").as("pack_id"))
    }),

    // the composed pipeline: quality gate → exact dedup (min-id
    // representative per content hash) → deterministic hash sample →
    // per-(lang, source) recipe summary. One plan: a stateless filter,
    // one shuffle for the dedup groupBy, the representative join
    // (broadcast at harness scale — BHJ in the executed plan; at
    // 100 TB it co-partitions on the same content-hash key the groupBy
    // already clustered, so the reps side arrives pre-partitioned), a
    // stateless sample, and a partial-agg'd final rollup.
    "cur_pipeline_e2e" -> ((s, dir) => {
      val quality = docs(s, dir)
        .withColumn("n_tok",
          size(split(TextDedup.normalize(col("text")), " ")).cast("long"))
        .where(col("n_tok") >= 10 && length(col("text")) >= 50)
        .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
          md5(TextDedup.normalize(col("text"))).as("ch"))
      val reps = quality.groupBy("ch").agg(min("doc_id").as("doc_id"))
      quality.join(reps, Seq("ch", "doc_id"))
        .where(hashMille("e2e", col("doc_id")) < 500)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    }),

    // corpus token-length histogram: one partial-agg'd groupBy.
    "cur_token_hist" -> ((s, dir) =>
      docs(s, dir)
        .select(size(split(TextDedup.normalize(col("text")), " ")).as("n_tok"))
        .groupBy(expr("cast(n_tok div 16 as bigint)").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_tok").cast("long")).as("min_tok"),
          max(col("n_tok").cast("long")).as("max_tok"))),

    // sliding-window chunking with overlap (context-window prep): each
    // doc explodes into 64-token chunks on a 48-token stride (16-token
    // overlap), identified by (doc_id, chunk_idx) and fingerprinted by
    // the chunk-text md5. Entirely per-row generative — sequence +
    // slice + explode inside one codegen stage, ZERO shuffles at any
    // scale (the explode multiplies rows ~n_tok/48× before downstream
    // ops, which is the real 100 TB consideration: chunk THEN filter,
    // never materialize unfiltered chunks wider than needed).
    "cur_chunk_overlap" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          split(TextDedup.normalize(col("text")), " ").as("toks"))
        .where(size(col("toks")) >= 1)
        .select(col("doc_id"),
          explode(expr("sequence(0, size(toks) - 1, 48)")).as("start"),
          col("toks"))
        .select(col("doc_id"),
          (col("start") / 48).cast("long").as("chunk_idx"),
          expr("slice(toks, start + 1, 64)").as("chunk"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).cast("long").as("chunk_tokens"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))),

    // temperature-scaled mixture sampling (the multilingual rebalancing
    // used in LLM training mixes): language i's sampling weight is
    // (n_i/N)^(1/T) with T=2, normalized — rare languages get upweighted
    // relative to proportional sampling, then each doc keeps iff its
    // salted hash clears the per-language rate for a ~200-doc target.
    // The weight table is |languages| rows (one partial-agg'd groupBy +
    // two scalar folds, broadcast back), the keep decision is a
    // stateless per-row filter — reproducible under retry, no shuffle
    // of the corpus at any scale. The weight normalizer sums through
    // exact DECIMAL so the rates are bit-stable in both engines.
    "cur_mix_temperature" -> ((s, dir) => {
      val d = docs(s, dir)
      val counts = d.groupBy("lang").agg(count(lit(1)).as("n"))
      val tot = d.agg(count(lit(1)).as("nn"))
      val w = counts.crossJoin(broadcast(tot))
        .withColumn("w", sqrt(col("n").cast("double") / col("nn")))
      val sumw = w.agg(
        sum(col("w").cast("decimal(28,18)")).cast("double").as("sumw"))
      val rates = w.crossJoin(broadcast(sumw))
        .withColumn("rate",
          least(lit(1.0), col("w") / col("sumw") * lit(200.0) / col("n")))
        .select("lang", "rate")
      d.join(broadcast(rates), "lang")
        .where(hashMille("tmp", col("doc_id")) < col("rate") * 1000)
        .select(col("lang"), col("doc_id"), round(col("rate"), 6).as("rate6"))
    }),

    // DSIR-style importance weighting (data selection via importance
    // resampling): score each doc by how much more likely its tokens are
    // under a TARGET domain's hashed-unigram distribution than under the
    // background corpus — the standard cheap proxy for "select web data
    // that looks like the target domain". Token features hash into 512
    // buckets (md5-derived, engine-portable like hashMille), so both
    // models are fixed 512-row tables regardless of vocabulary: one
    // partial-agg'd groupBy each, broadcast back over the token stream
    // (never shuffled), then one groupBy(doc). Laplace-smoothed
    // log-ratios accumulate through exact DECIMAL(28,18) so the per-doc
    // sum is aggregation-order independent; ln() on identical doubles is
    // engine-consistent (same contract as text_unigram_logprob).
    "cur_dsir_importance" -> ((s, dir) => {
      val B = 512
      val toks = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(split(TextDedup.normalize(col("text")), " ")).as("term"))
        .withColumn("bucket",
          conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long") % B)
      // both models + their normalizers from ONE token-stream pass: the
      // background count and the target count are conditional aggregates
      // of the same 512-bucket groupBy (count(when) ≡ the filtered
      // count, 0 where the filter matched nothing ≡ the old left_outer
      // coalesce), and the totals are exact sums OF the 512-row model
      // table — the previous form re-ran the explode+md5 scan three
      // times (background, target, totals) for aggregates one pass
      // already determines
      val bt = toks.groupBy("bucket").agg(count(lit(1)).as("bcnt"),
        count(when(col("lang") === "en", lit(1))).as("tcnt"))
      val tots = bt.agg(sum("bcnt").as("btot"), sum("tcnt").as("ttot"))
      val lr = bt.crossJoin(broadcast(tots))
        .select(col("bucket"),
          (log((col("tcnt") + 1) / (col("ttot") + B)) -
            log((col("bcnt") + 1) / (col("btot") + B))).as("lr"))
      toks.join(broadcast(lr), "bucket")
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_toks"),
          round(sum(col("lr").cast("decimal(28,18)")).cast("double") /
            count(lit(1)), 6).as("dsir6"))
    }),

    // per-domain quota (keep the best N docs per source/domain — the
    // standard guard against one crawl domain dominating a training
    // mix): top-3 by token count per source via the native bounded-heap
    // TopKPerKey — O(k) memory per domain, no window sort of the whole
    // corpus. One shuffle on source, heap-bounded reduce.
    "cur_domain_cap" -> ((s, dir) => {
      val scored = docs(s, dir).select(col("doc_id"), col("source"),
        size(split(TextDedup.normalize(col("text")), " "))
          .cast("long").as("quality"))
      graft.plans.TopKPerKey
        .topK(scored, "source", Seq(("quality", true), ("doc_id", false)), 3)
        .select(col("source"), col("doc_id"), col("quality"), col("rank"))
    }),
  )

  private val normSql =
    "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  private def shingleSql(src: String, idAlias: String): String =
    s"""(SELECT DISTINCT doc_id AS $idAlias, shingle FROM (
       |  SELECT doc_id,
       |    unnest([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]) AS shingle
       |  FROM (SELECT doc_id, string_split($normSql, ' ') AS t FROM $src) q0
       |  WHERE len(t) >= 3) q1)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "cur_decon_semantic" -> {
      def dotSql(a: String, b: String) =
        s"list_sum([$a[i] * $b[i] FOR i IN range(1, len($a) + 1)])"
      val cosSql =
        s"${dotSql("qe", "e")} / (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("e", "e")}))"
      val ids = deconSemEvalIds.mkString(", ")
      s"""WITH b AS (
         |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e
         |  FROM embeddings
         |), ev AS (
         |  SELECT b.vec_id AS eval_id,
         |    CASE WHEN b.vec_id % 50 = 0 AND l.e IS NOT NULL
         |         THEN l.e ELSE b.e END AS qe
         |  FROM b LEFT JOIN b l ON l.vec_id = b.vec_id + 1
         |  WHERE b.vec_id IN ($ids)
         |), pairs AS (
         |  SELECT eval_id, t.vec_id AS train_id, $cosSql AS cos
         |  FROM ev, (SELECT vec_id, e FROM b
         |            WHERE vec_id NOT IN ($ids)) t
         |)
         |SELECT eval_id, train_id, round(cos, 6) AS cos6
         |FROM pairs WHERE cos >= 0.999""".stripMargin
    },

    "cur_sample_weighted" ->
      """WITH keyed AS (
        |  SELECT doc_id, lang,
        |    round(-ln((CAST('0x' || substr(md5('aes|' || CAST(doc_id AS VARCHAR)), 1, 12)
        |                AS BIGINT) % 1000000 + 1) / 1000000.0)
        |          / CAST(n_chars AS DOUBLE), 9) AS k9
        |  FROM documents
        |)
        |SELECT lang, doc_id, CAST(rn AS BIGINT) AS rank, k9 FROM (
        |  SELECT lang, doc_id, k9,
        |    row_number() OVER (PARTITION BY lang ORDER BY k9, doc_id) AS rn
        |  FROM keyed) q
        |WHERE rn <= 20""".stripMargin,

    "cur_sample_stratified" -> {
      val rateSql = strataRates.map { case (langs, r) =>
        s"WHEN lang IN (${langs.map(l => s"'$l'").mkString(",")}) THEN $r"
      }.mkString("CASE ", " ", s" ELSE $defaultRate END")
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${hashMilleSql("smp", "doc_id")} < $rateSql""".stripMargin
    },

    "cur_split_hash" ->
      s"""SELECT split, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM (
         |  SELECT doc_id, n_chars,
         |    CASE WHEN ${hashMilleSql("split", "doc_id")} < 900 THEN 'train'
         |         WHEN ${hashMilleSql("split", "doc_id")} < 950 THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM documents) q
         |GROUP BY 1""".stripMargin,

    "cur_shard_manifest" ->
      s"""SELECT ${hashMilleSql("shard", "doc_id")} % 16 AS shard,
         |  count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM documents
         |GROUP BY 1""".stripMargin,

    "cur_mix_weighted" ->
      s"""SELECT source, doc_id, rank FROM (
         |  SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY md5('mix|' || CAST(doc_id AS VARCHAR)), doc_id) AS rank
         |  FROM documents) t
         |WHERE rank <= ($quotaSql)""".stripMargin,

    "cur_decon_ngram" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         |eval_docs AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.doc_id % 30 = 0 AND l.text IS NOT NULL
         |         THEN l.text ELSE d.text END AS text
         |  FROM d LEFT JOIN d l ON l.doc_id = d.doc_id + 1
         |  WHERE d.doc_id % 10 = 0
         |), train_docs AS (
         |  SELECT doc_id, text FROM d WHERE doc_id % 10 <> 0
         |), esh AS ${shingleSql("eval_docs", "eval_id")},
         |tsh AS ${shingleSql("train_docs", "train_id")},
         |index_sh AS (
         |  SELECT train_id, shingle FROM (
         |    SELECT train_id, shingle,
         |      count(*) OVER (PARTITION BY shingle) AS df
         |    FROM tsh) q WHERE df <= $stopShingleCap
         |), shared AS (
         |  SELECT e.eval_id, i.train_id, count(*) AS n_shared
         |  FROM esh e JOIN index_sh i ON i.shingle = e.shingle
         |  GROUP BY 1, 2
         |), esz AS (SELECT eval_id, count(*) AS esz FROM esh GROUP BY 1)
         |SELECT s.eval_id, s.train_id, s.n_shared,
         |  round(CAST(s.n_shared AS DOUBLE) / CAST(z.esz AS DOUBLE), 4) AS overlap4
         |FROM shared s JOIN esz z ON z.eval_id = s.eval_id
         |WHERE CAST(s.n_shared AS DOUBLE) / CAST(z.esz AS DOUBLE) >= 0.8""".stripMargin,

    "cur_decon_eval" ->
      s"""WITH eval_docs AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0
         |), esh AS ${shingleSql("eval_docs", "eval_id")},
         |tsh AS ${shingleSql("documents", "train_id")},
         |shared AS (
         |  SELECT e.eval_id, t.train_id, count(*) AS n_shared
         |  FROM esh e JOIN tsh t ON t.shingle = e.shingle
         |  GROUP BY 1, 2
         |), esz AS (SELECT eval_id, count(*) AS esz FROM esh GROUP BY 1)
         |SELECT s.eval_id, s.train_id, s.n_shared,
         |  round(CAST(s.n_shared AS DOUBLE) / CAST(z.esz AS DOUBLE), 4) AS overlap4
         |FROM shared s JOIN esz z ON z.eval_id = s.eval_id
         |WHERE s.train_id <> s.eval_id
         |  AND CAST(s.n_shared AS DOUBLE) / CAST(z.esz AS DOUBLE) >= 0.8""".stripMargin,

    "cur_pack_sequences" ->
      s"""SELECT source, doc_id, n_tok,
         |  CAST((cum - n_tok) // 2048 AS BIGINT) AS pack_id
         |FROM (
         |  SELECT source, doc_id, n_tok,
         |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM (SELECT source, doc_id,
         |          CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tok
         |        FROM documents) q0) q1""".stripMargin,

    "cur_pipeline_e2e" ->
      s"""WITH quality AS (
         |  SELECT doc_id, lang, source,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tok,
         |    md5($normSql) AS ch
         |  FROM documents
         |  WHERE len(string_split($normSql, ' ')) >= 10 AND length(text) >= 50
         |), reps AS (
         |  SELECT ch, min(doc_id) AS doc_id FROM quality GROUP BY 1
         |)
         |SELECT lang, source, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM quality q JOIN reps r ON q.ch = r.ch AND q.doc_id = r.doc_id
         |WHERE ${hashMilleSql("e2e", "q.doc_id")} < 500
         |GROUP BY 1, 2""".stripMargin,

    "cur_token_hist" ->
      s"""SELECT CAST(n_tok // 16 AS BIGINT) AS bucket, count(*) AS n_docs,
         |  CAST(min(n_tok) AS BIGINT) AS min_tok,
         |  CAST(max(n_tok) AS BIGINT) AS max_tok
         |FROM (SELECT len(string_split($normSql, ' ')) AS n_tok
         |      FROM documents) q
         |GROUP BY 1""".stripMargin,

    "cur_chunk_overlap" ->
      s"""SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
         |  CAST(len(t[start + 1 : least(start + 64, len(t))]) AS BIGINT)
         |    AS chunk_tokens,
         |  md5(array_to_string(t[start + 1 : least(start + 64, len(t))], ' '))
         |    AS chunk_hash
         |FROM (
         |  SELECT doc_id, t, unnest(range(0, len(t), 48)) AS start
         |  FROM (SELECT doc_id, string_split($normSql, ' ') AS t
         |        FROM documents) q0
         |  WHERE len(t) >= 1) q1""".stripMargin,

    "cur_mix_temperature" ->
      s"""WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
         |tot AS (SELECT count(*) AS nn FROM documents),
         |w AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE) / nn) AS w
         |      FROM counts, tot),
         |sw AS (SELECT CAST(sum(CAST(w AS DECIMAL(28,18))) AS DOUBLE) AS sumw
         |       FROM w),
         |rates AS (SELECT lang, n,
         |            least(1.0, w / sumw * 200.0 / n) AS rate FROM w, sw)
         |SELECT d.lang, d.doc_id, round(r.rate, 6) AS rate6
         |FROM documents d JOIN rates r ON r.lang = d.lang
         |WHERE ${hashMilleSql("tmp", "d.doc_id")} < r.rate * 1000""".stripMargin,

    "cur_dsir_importance" ->
      s"""WITH tb AS (
         |  SELECT doc_id, lang,
         |    CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % 512 AS bucket
         |  FROM (SELECT doc_id, lang,
         |          unnest(string_split($normSql, ' ')) AS term
         |        FROM documents) q
         |), bg AS (SELECT bucket, count(*) AS bcnt FROM tb GROUP BY 1),
         |tgt AS (SELECT bucket, count(*) AS tcnt FROM tb
         |        WHERE lang = 'en' GROUP BY 1),
         |tots AS (SELECT count(*) AS btot,
         |           count(*) FILTER (WHERE lang = 'en') AS ttot FROM tb),
         |lr AS (
         |  SELECT bg.bucket,
         |    ln((coalesce(tcnt, 0) + 1) / (ttot + 512)) -
         |    ln((bcnt + 1) / (btot + 512)) AS lr
         |  FROM bg LEFT JOIN tgt ON tgt.bucket = bg.bucket, tots
         |)
         |SELECT doc_id, lang, count(*) AS n_toks,
         |  round(CAST(sum(CAST(lr AS DECIMAL(28,18))) AS DOUBLE)
         |    / count(*), 6) AS dsir6
         |FROM tb JOIN lr ON lr.bucket = tb.bucket
         |GROUP BY 1, 2""".stripMargin,

    "cur_domain_cap" ->
      s"""SELECT source, doc_id, quality, rank FROM (
         |  SELECT source, doc_id, quality,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY quality DESC, doc_id) AS rank
         |  FROM (SELECT source, doc_id,
         |          CAST(len(string_split($normSql, ' ')) AS BIGINT) AS quality
         |        FROM documents) q0) q1
         |WHERE rank <= 3""".stripMargin,
  )
}
