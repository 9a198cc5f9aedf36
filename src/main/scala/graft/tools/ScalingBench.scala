package graft.tools

import graft.SparkEntry

/** Scaling-slope harness: time a set of declared queries across several
  * lake dirs of increasing size (the driver sf0.1 fixture plus ScaleUp
  * replicas), and report each query's fitted power-law exponent
  * t ∝ size^slope — the measured answer to "would this plan survive a
  * 100× scale-up", instead of an argument from plan shape.
  *
  * Protocol: one untimed warmup pass over the whole query list at the
  * first (smallest) dir — JIT, codegen, and shared derived-fixture
  * materializations land there instead of inside the first dir's timed
  * runs, which otherwise reads as a spurious negative slope — then per
  * (query, dir) two timed runs in one warm session, min taken (same
  * steady-state estimator as Bench). Slope is the least-squares fit of
  * log t against log relative-size across all dirs.
  * slope ≈ 1 is linear scaling (shuffle-free or well-partitioned);
  * ≈ 1.1–1.3 reflects n·log n sort/shuffle terms and fixed-overhead
  * amortization; ≥ 1.5 flags a super-linear path that must be fixed or
  * explained before it meets 100 TB.
  *
  * Usage:
  *   runMain graft.tools.ScalingBench out.json q1,q2,... dir1:size1 dir2:size2 ...
  * where size is the dir's relative scale (e.g. 1, 3, 10).
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val dirs: Seq[(String, Double)] = args.drop(2).toSeq.map { a =>
      val i = a.lastIndexOf(':')
      (a.substring(0, i), a.substring(i + 1).toDouble)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus, "graft-scalingbench")

    def time(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    // untimed warmup at the smallest dir (see scaladoc)
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, dirs.head._1).count()
      catch { case _: Throwable => () }
    }

    def fmt(v: Double): String = f"$v%.3f"
    val results = names.map { name =>
      val ts = dirs.map { case (dir, size) =>
        val t = try time(name, dir) catch {
          case e: Throwable =>
            System.err.println(s"[scaling] $name @ $dir FAILED: ${e.getMessage}")
            -1.0
        }
        System.err.println(f"[scaling] $name%-35s size=$size%5.1f  t=$t%.3f s")
        (size, t)
      }
      val ok = ts.filter(_._2 > 0)
      // least-squares slope of log t on log size; needs >=2 points
      val slope = if (ok.size >= 2) {
        val xs = ok.map(p => math.log(p._1)); val ys = ok.map(p => math.log(p._2))
        val mx = xs.sum / xs.size; val my = ys.sum / ys.size
        val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
        val den = xs.map(x => (x - mx) * (x - mx)).sum
        num / den
      } else Double.NaN
      (name, ts, slope)
    }

    val json = results.map { case (name, ts, slope) =>
      val tsJson = ts.map { case (s, t) => s""""${fmt(s)}":${fmt(t)}""" }
        .mkString("{", ",", "}")
      val slopeJson = if (slope.isNaN) "null" else fmt(slope)
      s""""$name":{"slope":$slopeJson,"times":$tsJson}"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(json)
    spark.stop()
  }
}
