package graft
import java.util.concurrent.atomic.AtomicBoolean

/** Benchmark main (driver contract). Emits ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Built to DEGRADE, never to zero out (r5 lesson: one slow query
  * timed out the whole run and the end-only file write lost all 155
  * timings):
  *   - the per-query timings file AND a compact-summary sidecar
  *     (`bench_summary.json`, same content as the stdout line) are
  *     rewritten after EVERY query, so a kill at any point leaves valid
  *     JSON with everything timed so far (tagged "partial": true until
  *     the run completes);
  *   - a JVM shutdown hook emits the compact stdout line from whatever
  *     completed — SIGTERM from a harness timeout still produces a
  *     parseable bench artifact;
  *   - the second timed run is CONDITIONAL on the first run fitting a
  *     per-query budget: fast queries get the min-of-2 steady-state
  *     estimator, a pathological query costs one run, not three. The
  *     estimator per query is visible in the JSON tag
  *     ("estimator": "min2_median3_under_<budget>s").
  *   - MEDIAN-OF-3 when the two exec samples disagree by >25 % on a
  *     ≥0.3 s query (r13 verdict item 5: the graph family's ±3 s
  *     same-code swing was the largest error term in round-over-round
  *     comparison): a third sample runs (billed to the rescue
  *     allowance) and the MEDIAN reports — min-of-2 under that much
  *     spread just mints whichever run got lucky. All three raw
  *     samples stay visible in "runs".
  *   - a first run OVER the budget still earns ONE rescue rerun when it
  *     is plausibly transient noise (≤ 4× budget) and the global rescue
  *     allowance isn't spent — a machine-contention spike during run 1
  *     must not become the reported number when a rerun would correct
  *     it. The allowance bounds worst-case added wall-clock.
  *
  * ISOLATION MODE (r12 verdict's gating item — the shared-JVM suite's
  * session noise had grown past any real per-round movement: identical
  * code ranged 202.6–217.3 s on totals, a single query 0.45 ↔ 3.4 s
  * between runs). Two mechanisms, on by default:
  *
  *   - every timed sample runs in a FRESH `spark.newSession()` — its
  *     own temp views, session conf, and catalog registrations, so a
  *     query can never read (or pay for resolving) the 200 temp views
  *     the preceding hundred queries leaked into a shared session. The
  *     SparkContext is shared, which deliberately KEEPS the app-scoped
  *     cache artifacts (CacheRegistry — indexes are built once per
  *     corpus by design) and the block-manager/codegen warm state that
  *     a long-lived production session would also have;
  *   - `System.gc()` immediately before each sample: collects the
  *     previous queries' garbage OUTSIDE the timed region (instead of
  *     mid-query, where a full GC pause lands on whichever query is
  *     unlucky) and lets the ContextCleaner reap dead shuffles and
  *     broadcasts between queries rather than during one.
  *
  * FIXTURE / QUERY SPLIT: a query function `fn(spark, dir)` runs its
  * eager fixture work (the lake queries' CTAS + DML; index builds) and
  * returns the DataFrame; `.count()` on the result is the query. The
  * two are timed separately: "queries" (and "value") carry ONLY the
  * execution seconds; per-query fixture seconds sit in "fixtures"
  * (with their sum in "fixture_total"), so a fixture-dominated number
  * like lake_partitions_meta's 90%-CTAS 7 s no longer masquerades as
  * query cost, and a genuine query regression is visible against a
  * noisy fixture. "runs" keeps every raw sample as [build, exec]
  * pairs so cold-start noise (e1 >> e2) stays distinguishable from a
  * real regression (e1 ≈ e2, both slow) without a re-run.
  *
  * Warmup is a single pass over the base tables (parquet footers, scan
  * codegen, JVM warm-in); the first timed run of each query doubles as
  * its own warmup sample and the min-of-2 keeps the steady-state
  * number. Failures are NOT swallowed: a failed query is reported in
  * "errors" and forces rc != 0 so a regression can't bench as "fast".
  */
/** CONTENTION SENTINEL (r15). Median-of-3 catches per-query sample
  * spread but is structurally blind to SUSTAINED co-tenant load that
  * inflates all of a query's samples alike (r14's official run: 22
  * unrelated sub-second queries inflated ~uniformly +1 s vs both the
  * prior round and a same-code rerun). The sentinel times a fixed
  * in-memory micro-task (deterministic xorshift fill + sort — CPU +
  * memory-bandwidth bound, no I/O, no Spark) immediately before every
  * timed sample, OUTSIDE the timed region. Each sample's calibration,
  * divided by the run's QUIETEST observation (a running min — the
  * machine's unloaded floor), is its contention ratio; a query whose
  * EVERY sample ran above [[FlagRatio]] is reported in "contended":
  * the number still reports (there is nothing sounder to print), but
  * the artifact says exactly which timings were taken under load.
  */
object BenchCalib {
  /** All-samples-above flags the query (one loaded sample among quiet
    * ones is already handled by min/median estimators).
    */
  val FlagRatio = 1.5
  // 256k longs (~2 MB): ~10 ms quiet — big enough that a co-tenant
  // load inflating queries by ~1 s moves it well past the flag line,
  // small enough that ~600 samples cost seconds, not minutes
  private val arr = new Array[Long](1 << 18)
  /** One calibration measurement in ms (same work every call: the
    * refill makes the sort input identical run to run).
    */
  def measureOnce(): Double = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < arr.length) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      arr(i) = x
      i += 1
    }
    val t0 = System.nanoTime()
    java.util.Arrays.sort(arr)
    (System.nanoTime() - t0) / 1e6
  }
  /** Were ALL of a query's samples taken above the flag line? */
  def flagged(calibs: Seq[Double], baseline: Double): Boolean =
    calibs.nonEmpty && baseline > 0 &&
      calibs.forall(_ / baseline > FlagRatio)

  /** Tail-requeue merge (r16): fold one extra (build, exec, calib)
    * sample — taken in the quiet end-of-suite tail — into a query's
    * record. The numbers take the MIN (the contention-rescue
    * estimator: a quiet sample among inflated ones IS the rescue);
    * the calibration APPENDS, so under the ALL-samples-above flag
    * rule a quiet requeue unflags the query and a still-loaded one
    * leaves the honest contended record standing. Returns the merged
    * ((exec, build) estimate, runs, calibs) — runs and calibs stay
    * aligned 1:1.
    */
  def requeueMerge(est: (Double, Double), runs: List[(Double, Double)],
                   calibs: List[Double],
                   sample: (Double, Double, Double))
      : ((Double, Double), List[(Double, Double)], List[Double]) = {
    val (b, e, c) = sample
    ((math.min(est._1, e), math.min(est._2, b)),
      runs :+ ((b, e)), calibs :+ c)
  }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 45 s: wide enough that every real query's cold run (shared fixture
    // materializations land on whichever query touches them first) still
    // earns a warm second run — the reported min is then steady-state —
    // while a 165 s-class pathology (the r5 killer) is capped at ONE run
    val rerunBudget =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RERUN_BUDGET", "45.0").toDouble
    val isolate =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ISOLATE", "true").toBoolean
    val spark = GraftSession.local(cpus, "graft-bench")
    // lake drift guard: a regenerated testdata dir with a flipped physical
    // type must fail here, named, not as a wrong-number bench (r8 lesson)
    Tables.assertLakeSchemas(spark, sfDir)

    def jq(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def sec(v: Double): String = f"$v%.3f"

    val outFile =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_timings.json")
    // fixed sidecar carrying the same compact line as stdout: sbt's
    // [success] epilogue trails the stdout JSON, so a driver that parses
    // only a trailing line has recorded parsed=null in every round — the
    // sidecar is the machine-findable copy, rewritten per query like the
    // timings file so any kill leaves it current
    val summaryFile =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SUMMARY", "bench_summary.json")
    val estimator = s"min2_median3_under_${rerunBudget}s" +
      (if (isolate) "_isolated" else "")
    // results/errors are appended by the main loop and snapshotted by the
    // shutdown hook on SIGTERM — all access goes through `lock` so a
    // signal landing mid-append can't tear the hook's toList
    val lock = new Object
    // name -> (reported exec secs, reported fixture-build secs)
    val results =
      scala.collection.mutable.ArrayBuffer.empty[(String, (Double, Double))]
    // every raw sample per query as (build, exec) pairs — min-of-2 is
    // the reported number, the file keeps the evidence
    val rawRuns = scala.collection.mutable.ArrayBuffer
      .empty[(String, List[(Double, Double)])]
    // queries whose timed runs read an app-scoped cache artifact an
    // EARLIER query built (query -> artifact -> builder): their numbers
    // are PROBE cost; the build cost sits in the builder's run 1. Keeps
    // per-query timings honest without changing what is measured.
    val cacheServed = scala.collection.mutable.ArrayBuffer
      .empty[(String, Map[String, String])]
    var errors = List.empty[String]
    val done = new AtomicBoolean(false)
    // contention-sentinel state (seeded just before the query loop;
    // declared here because the JSON writers read it)
    var calibBaseline = Double.MaxValue
    val calibByQuery = scala.collection.mutable.ArrayBuffer
      .empty[(String, List[Double])]

    def snapshot(): (List[(String, (Double, Double))], List[String]) =
      lock.synchronized((results.toList, errors))
    def queriesJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => jq(k) + ":" + sec(v) }.mkString("{", ",", "}")
    def write(path: String, s: String): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(path),
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => () }
    def contendedJson(): (String, String) = {
      val (cb, entries) = lock.synchronized(
        (calibBaseline, calibByQuery.toList))
      val flagged = entries.collect {
        case (k, cs) if BenchCalib.flagged(cs, cb) => jq(k)
      }.mkString("[", ",", "]")
      val perQuery = entries.map { case (k, cs) =>
        jq(k) + ":" + cs.map(c => f"${c / cb}%.2f")
          .mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      (flagged, perQuery)
    }
    def fullJson(partial: Boolean): String = {
      val (rs, errs) = snapshot()
      val errJson = errs.reverse.map(jq).mkString("[", ",", "]")
      val runsJson = lock.synchronized(rawRuns.toList)
        .map { case (k, ts) =>
          jq(k) + ":" + ts.map { case (b, e) =>
            "[" + sec(b) + "," + sec(e) + "]" }.mkString("[", ",", "]") }
        .mkString("{", ",", "}")
      val cachedJson = lock.synchronized(cacheServed.toList)
        .map { case (k, m) =>
          jq(k) + ":" + m.toSeq.sorted.map { case (a, b) =>
            jq(a) + ":" + jq(b) }.mkString("{", ",", "}") }
        .mkString("{", ",", "}")
      val fixturesJson = queriesJson(rs.map { case (k, (_, b)) => k -> b })
      val (flaggedJson, calibJson) = contendedJson()
      s"""{"metric":"total","value":${sec(rs.map(_._2._1).sum)},"unit":"sec","partial":$partial,"estimator":${jq(estimator)},"isolated":$isolate,"n_queries":${rs.size},"fixture_total":${sec(rs.map(_._2._2).sum)},"calib_baseline_ms":${sec(lock.synchronized(calibBaseline))},"contended":$flaggedJson,"calib_ratios":$calibJson,"queries":${queriesJson(rs.map { case (k, (e, _)) => k -> e })},"fixtures":$fixturesJson,"runs":$runsJson,"cached":$cachedJson,"errors":$errJson,"sf":"$sfDir"}"""
    }
    // total + errors + the 10 slowest + a pointer to the full per-query
    // file (the harness keeps only the last ~2000 chars of stdout — a
    // full 262-query line would front-truncate into unparseable JSON)
    def compactJson(): String = {
      val (rs, errs) = snapshot()
      val errJson = errs.reverse.map(jq).mkString("[", ",", "]")
      val slowest = queriesJson(
        rs.map { case (k, (e, _)) => k -> e }.sortBy(-_._2).take(10))
      val flaggedJson = contendedJson()._1
      s"""{"metric":"total","value":${sec(rs.map(_._2._1).sum)},"unit":"sec","partial":${!done.get()},"estimator":${jq(estimator)},"isolated":$isolate,"n_queries":${rs.size},"fixture_total":${sec(rs.map(_._2._2).sum)},"contended":$flaggedJson,"queries":$slowest,"queries_file":${jq(outFile)},"errors":$errJson,"sf":"$sfDir"}"""
    }
    def writeFile(partial: Boolean): Unit = {
      write(outFile, fullJson(partial))
      write(summaryFile, compactJson())
    }
    val printed = new AtomicBoolean(false)
    // ONE compact stdout line, last so it sits in the harness's tail
    def emitCompact(): Unit =
      if (printed.compareAndSet(false, true)) println(compactJson())
    // harness timeouts deliver SIGTERM: flush the files and the stdout
    // line from whatever completed instead of dying silently
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!done.get()) { writeFile(partial = true); emitCompact() }
    }))

    // shared warmup: footers + scan codegen + JVM warm-in on each base
    // table once (errors here are irrelevant — missing fixture tables
    // surface per-query below)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { tbl =>
      try Tables(spark, sfDir, tbl).count()
      catch { case _: Throwable => () }
    }

    // optional comma-separated name filter for targeted profiling runs
    // (local iteration only — the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // total extra first-run seconds the rescue path may consume across
    // the whole suite (the rerun itself is expected to be fast — it's
    // the noisy t1 that counts against the allowance)
    val rescueAllowance =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RESCUE_ALLOWANCE", "240.0").toDouble
    var rescueSpent = 0.0
    // contention sentinel: prime the JIT, then seed the baseline with
    // the best of three quiet-start observations; the baseline keeps
    // falling to the quietest measurement the run ever sees
    BenchCalib.measureOnce()
    lock.synchronized {
      calibBaseline = (1 to 3).map(_ => BenchCalib.measureOnce()).min }
    // one sample of `fn` = (fixture-build secs, exec secs, calib ms,
    // error): the contention stamp lands outside the timed region,
    // and the running-min baseline updates under the lock (no stale/
    // unseeded floor in a partial artifact). Isolation collects
    // previous queries' garbage OUTSIDE the timed region and gives
    // the query a pristine session (shared SparkContext keeps
    // app-scoped caches). Shared by the main loop and the r16
    // contended-tail requeue below.
    def sampleOf(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)
        : (Double, Double, Double, Throwable) = {
      var err: Throwable = null
      val c = BenchCalib.measureOnce()
      lock.synchronized {
        calibBaseline = math.min(calibBaseline, c) }
      if (isolate) System.gc()
      val qs = if (isolate) spark.newSession() else spark
      val t0 = System.nanoTime()
      val df =
        try Some(fn(qs, sfDir))
        catch { case e: Throwable => err = e; None }
      val t1 = System.nanoTime()
      df.foreach { d =>
        try d.count()
        catch { case e: Throwable => err = e }
      }
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, c, err)
    }
    SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      System.err.println(s"[bench] timing $name")
      CacheRegistry.setCurrent(name)
      var sampleErr: Throwable = null
      // one sample = (fixture-build secs, exec secs): fn() runs the
      // eager fixture DML and plan construction; count() executes.
      // A failure in either half leaves sampleErr set for this sample.
      def once(): (Double, Double, Double) = {
        val (b, e, c, err) = sampleOf(fn)
        sampleErr = err
        (b, e, c)
      }
      // min-of-2 steady-state estimator, but only when the first run
      // (which doubles as this query's warmup) fits the budget — one
      // slow query costs ONE run, and can no longer starve the suite.
      // Over-budget first runs get a bounded rescue rerun (see scaladoc).
      // The budget gates on build+exec (total wall-clock is what the
      // allowance protects); build and exec each report their own min
      // (both are independently noisy).
      // A FAILED first sample gets exactly one retry before reporting:
      // a 262-query shared-JVM session occasionally hits transient
      // environment blips (observed live: ClosureCleaner's
      // getResourceAsStream returning null under fd pressure) — a
      // genuinely broken query fails BOTH samples and still reports.
      var s1 = once()
      val firstErr = sampleErr
      if (firstErr != null) s1 = once()
      val failed = sampleErr != null
      if (failed) {
        val e = firstErr
        val msg = s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n')}"
        lock.synchronized { errors ::= msg }
      } else if (firstErr != null)
        System.err.println(s"[bench] $name: first sample failed " +
          s"transiently, retry succeeded (${firstErr.getClass.getName})")
      val w1 = s1._1 + s1._2
      val rescue = !failed && firstErr == null && w1 > rerunBudget &&
        w1 <= rerunBudget * 4 && rescueSpent + w1 <= rescueAllowance
      if (rescue) rescueSpent += w1
      val secondRun = !failed && firstErr == null &&
        (w1 <= rerunBudget || rescue)
      val samples0 =
        if (!secondRun) List(s1)
        else {
          // a FAILED steady-state sample is discarded (its "timing" is
          // a fast abort, which min() would happily report) — s1
          // already proved the query works
          val s2 = once()
          if (sampleErr != null) List(s1) else List(s1, s2)
        }
      // MEDIAN-OF-3 for noisy queries: when the two exec samples
      // disagree by >25 % (and the query is big enough for relative
      // noise to mean anything), a third sample breaks the tie and the
      // MEDIAN reports — min-of-2 under that much spread just mints
      // whichever run got lucky, and the top of the table was absorbing
      // ±3 s of same-code JIT/GC swing (r13's graph family). The extra
      // run bills the rescue allowance, so a noisy-but-huge query can't
      // starve the suite.
      val samples =
        if (samples0.size < 2) samples0
        else {
          val (a, b) = (samples0(0)._2, samples0(1)._2)
          val spread = math.abs(a - b) / math.max(math.min(a, b), 1e-9)
          val w = samples0.map(s => s._1 + s._2).max
          if (spread > 0.25 && math.max(a, b) >= 0.3 &&
              rescueSpent + w <= rescueAllowance) {
            rescueSpent += w
            System.err.println(f"[bench] $name: exec spread " +
              f"${spread * 100}%.0f%% — taking a third sample (median)")
            val s3 = once()
            if (sampleErr != null) samples0 else samples0 :+ s3
          } else samples0
        }
      // every sample under sustained load (> FlagRatio x the quiet
      // floor): spend ONE more sample from the rescue allowance — if
      // the load was a passing spike, the extra sample rescues the
      // number; if it persists, the query reports flagged
      val contRescue = !failed && samples.size <= 2 &&
        BenchCalib.flagged(samples.map(_._3),
          lock.synchronized(calibBaseline)) && {
          val w = samples.map(x => x._1 + x._2).max
          rescueSpent + w <= rescueAllowance && { rescueSpent += w; true }
        }
      val samplesC =
        if (contRescue) {
          System.err.println(s"[bench] $name: all samples contended " +
            "(calibration), taking one more")
          val s3 = once()
          if (sampleErr != null) samples else samples :+ s3
        } else samples
      // estimator: the SPREAD-rescue path keeps the median (three
      // honest samples, the middle is the trustworthy one); the
      // CONTENTION-rescue path reports the MIN — a quiet rescue
      // sample among contended ones IS the rescue, and a median of
      // {inflated, inflated, quiet} would ship the inflated number
      // just as the quiet calibration unflags it (second-pass review)
      val tc =
        if (!contRescue && samplesC.size == 3)
          (samplesC.map(_._2).sorted.apply(1), samplesC.map(_._1).min)
        else (samplesC.map(_._2).min, samplesC.map(_._1).min)
      val served = CacheRegistry.servedFrom(name)
      lock.synchronized {
        results += (name -> tc)
        rawRuns += (name -> samplesC.map(x => (x._1, x._2)))
        // calibrations of the KEPT samples only — aligned 1:1 with
        // "runs" (a discarded failed sample's stamp must not flag)
        calibByQuery += (name -> samplesC.map(_._3).toList)
        if (served.nonEmpty) cacheServed += (name -> served)
      }
      writeFile(partial = true)
    }
    // CONTENDED-QUERY TAIL REQUEUE (r16): a query whose every sample
    // ran above the flag line may simply have overlapped a co-tenant
    // burst; the end of the suite is the quietest the machine gets
    // (fixtures built, nothing queued behind). Each still-flagged
    // query gets ONE more sample here, merged by the min estimator
    // ([[BenchCalib.requeueMerge]]): a quiet requeue both rescues the
    // number and unflags the query (the flag rule is ALL-samples-
    // above), while a still-loaded one leaves the honest contended
    // record standing. Bills the same rescue allowance.
    locally {
      val cbNow = lock.synchronized(calibBaseline)
      // failed queries are excluded: their "contended" stamps sit on
      // fast-abort samples, and re-running a broken fixture buys
      // nothing — the error is the record
      val failedNames = lock.synchronized(errors)
        .map(_.takeWhile(_ != ':')).toSet
      val stillFlagged = lock.synchronized(calibByQuery.toList)
        .collect { case (k, cs) if BenchCalib.flagged(cs, cbNow) &&
          !failedNames.contains(k) => k }
      stillFlagged.foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          val est = lock.synchronized(results.find(_._1 == name)
            .map(r => r._2._1 + r._2._2).getOrElse(0.0))
          if (rescueSpent + est <= rescueAllowance) {
            System.err.println(
              s"[bench] $name: still contended — quiet-tail requeue")
            CacheRegistry.setCurrent(name)
            val (b, e, c, err) = sampleOf(fn)
            // bill the ACTUAL cost, not the estimate: a requeue that
            // ran long under persistent load must drain the allowance
            // at its real rate, or many such requeues overrun the
            // harness timeout the allowance protects
            rescueSpent += b + e
            if (err != null)
              // visible trace: the allowance was spent, the merge was
              // skipped, the contended record stands — without this
              // line the attempt would vanish from every artifact
              System.err.println(s"[bench] $name: tail requeue FAILED " +
                s"(${err.getClass.getName}) — contended record stands")
            else lock.synchronized {
              val i = results.indexWhere(_._1 == name)
              val j = rawRuns.indexWhere(_._1 == name)
              val k2 = calibByQuery.indexWhere(_._1 == name)
              if (i >= 0 && j >= 0 && k2 >= 0) {
                val (est2, runs2, calibs2) = BenchCalib.requeueMerge(
                  results(i)._2, rawRuns(j)._2, calibByQuery(k2)._2,
                  (b, e, c))
                results(i) = name -> est2
                rawRuns(j) = name -> runs2
                calibByQuery(k2) = name -> calibs2
              }
              // the cache-honesty annotation the main loop keeps: a
              // requeue served from an artifact a LATER query built
              // must say so, or the rescued number silently reflects
              // a cache state no main-loop sample had
              val served = CacheRegistry.servedFrom(name)
              if (served.nonEmpty) {
                val ci = cacheServed.indexWhere(_._1 == name)
                if (ci >= 0)
                  cacheServed(ci) = name -> (cacheServed(ci)._2 ++ served)
                else cacheServed += (name -> served)
              }
            }
          }
        }
      }
      if (stillFlagged.nonEmpty) writeFile(partial = true)
    }
    CacheRegistry.setCurrent("")
    done.set(true)
    writeFile(partial = false)
    emitCompact()
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
