package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention sentinel ([[BenchCalib]]): median-of-N
  * estimators catch per-query sample spread but are structurally blind
  * to sustained co-tenant load that inflates ALL samples alike (r14's
  * official bench run). The sentinel's flag rule and its live behavior
  * under deliberate CPU oversubscription are pinned here; the "quiet
  * run stays quiet" half is the per-round bench artifact itself
  * (contended must be empty on an idle machine).
  */
class BenchCalibSpec extends AnyFunSuite {

  test("flag rule: ALL samples above the line flags; one quiet sample " +
       "unflags (min/median estimators already absorb single spikes); " +
       "degenerate inputs never flag") {
    assert(BenchCalib.flagged(Seq(16.0, 17.0, 20.0), 10.0))
    assert(!BenchCalib.flagged(Seq(16.0, 10.0, 20.0), 10.0))
    assert(!BenchCalib.flagged(Seq(14.9, 15.0), 10.0)) // at/below 1.5x
    assert(!BenchCalib.flagged(Seq.empty, 10.0))
    assert(!BenchCalib.flagged(Seq(16.0), 0.0)) // no baseline yet
  }

  test("a deliberately loaded machine flags its samples: measurements " +
       "taken under full CPU oversubscription sit above FlagRatio x " +
       "the quiet floor") {
    // quiet floor: best of several (JIT-primed) measurements
    BenchCalib.measureOnce()
    BenchCalib.measureOnce()
    val quiet = (1 to 5).map(_ => BenchCalib.measureOnce()).min
    // oversubscribe every core with spin work
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val n = Runtime.getRuntime.availableProcessors() * 2
    val threads = (1 to n).map { _ =>
      val t = new Thread(() => {
        var x = 1L
        while (!stop.get()) { x = x * 6364136223846793005L + 1442695040888963407L }
        if (x == 42L) println(x) // keep the loop un-eliminable
      })
      t.setDaemon(true)
      t.start()
      t
    }
    try {
      Thread.sleep(100) // let the load establish
      val loaded = (1 to 3).map(_ => BenchCalib.measureOnce())
      assert(BenchCalib.flagged(loaded, quiet),
        s"loaded samples $loaded should all exceed " +
          s"${BenchCalib.FlagRatio} x quiet floor $quiet")
    } finally {
      stop.set(true)
      threads.foreach(_.join(1000))
    }
  }

  test("tail-requeue merge (r16): a quiet end-of-suite sample both " +
       "rescues the number (min estimator) and UNFLAGS the query " +
       "(appended calibration breaks the all-samples-above rule); a " +
       "still-loaded requeue leaves the contended record standing; " +
       "runs and calibs stay aligned 1:1") {
    val baseline = 10.0
    // a query whose two samples both ran under ~1.8x load
    val est0 = (2.0, 0.5) // (exec, build) — inflated
    val runs0 = List((0.5, 2.0), (0.6, 2.1))
    val calibs0 = List(18.0, 19.0)
    assert(BenchCalib.flagged(calibs0, baseline))
    // quiet requeue: calib 10.5 (under the 1.5x line), faster exec
    val (est1, runs1, calibs1) =
      BenchCalib.requeueMerge(est0, runs0, calibs0, (0.4, 1.2, 10.5))
    assert(est1 == (1.2, 0.4), s"$est1") // min exec, min build
    assert(!BenchCalib.flagged(calibs1, baseline), "quiet sample unflags")
    assert(runs1.size == calibs1.size && runs1.last == ((0.4, 1.2)))
    // still-loaded requeue: calib stays above the line -> still flagged,
    // and the min estimator never worsens the number
    val (est2, _, calibs2) =
      BenchCalib.requeueMerge(est0, runs0, calibs0, (0.7, 2.4, 17.0))
    assert(est2 == (2.0, 0.5), s"$est2")
    assert(BenchCalib.flagged(calibs2, baseline),
      "persistent load keeps the honest contended record")
  }
}
