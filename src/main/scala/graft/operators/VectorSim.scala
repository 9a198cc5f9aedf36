package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity operators over an embedding column
  * (`array<float>`): deterministic sequential-fold dot/cosine (so results
  * are bit-identical across engines and runs — no partial-aggregation
  * reorder), random-hyperplane LSH signatures for bucketed ANN, and
  * brute-force cosine as the verifiable baseline.
  *
  * Scale notes (100 TB): brute-force top-k is O(|Q|·|C|) — only ever used
  * with a bounded query set broadcast against the candidate corpus (one
  * scan of the big side, no shuffle of it). The scale path is the LSH
  * signature: one narrow map computes an 8-bit bucket per vector, the
  * bucket join meets candidates only within a bucket, and the exact
  * cosine re-rank touches candidate pairs only. All expression-level —
  * `zip_with`/`aggregate` fold inside codegen, no UDFs.
  */
object VectorSim {

  /** `array<float>` → `array<double>` (exact widening). */
  def toDoubleArray(v: Column): Column =
    transform(v, x => x.cast("double"))

  /** Sequential left-fold dot product — deterministic element order, so
    * engine-portable bit-for-bit (unlike a shuffled SUM of products).
    *
    * Uses the native codegen expression ([[graft.functions.DotProduct]])
    * when the session was built with `graft.plans.GraftExtensions`, else
    * the builtin higher-order fold — identical results either way, but
    * the native loop stays inside whole-stage codegen (~no per-element
    * lambda dispatch).
    */
  def dot(a: Column, b: Column): Column = {
    val native = try {
      org.apache.spark.sql.SparkSession.active
        .catalog.functionExists("graft_dot")
    } catch { case _: Exception => false }
    if (native) call_function("graft_dot", a, b)
    else aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Sequential left-fold squared L2 distance — same portability
    * contract as [[dot]] (deterministic element order, engine-portable
    * bit-for-bit).
    */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Hyperplane `p` as a pseudo-random ±[0,1] vector, derived from md5 —
    * no RNG state, any engine reproduces it: component d =
    * (int(md5('hp<p>_<d>')[0:4], 16) % 1001 - 500) / 500.
    *
    * Computed once driver-side and embedded as an array literal: deriving
    * it per row would cost planes×dim md5 calls per vector (the dominant
    * cost of the whole signature at scale). The Scala md5 here and the
    * SQL `md5()` agree byte-for-byte, so oracles can re-derive it.
    */
  def hyperplaneValues(p: Int, dim: Int): Seq[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { d =>
      val hex = digest.digest(s"hp${p}_$d".getBytes("UTF-8"))
        .take(2).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % 1001 - 500) / 500.0
    }
  }

  /** 8-bit LSH signature: bit p = (v · hyperplane_p >= 0). Buckets
    * vectors so near-neighbors (small angle) tend to share signatures.
    * Right for NEAR-DUP detection (cos ≈ 1 ⇒ all planes agree w.h.p.);
    * too selective for general top-k recall — use [[lshTableBuckets]]
    * there.
    */
  def lshSignature(v: Column, planes: Int = 8, dim: Int = 64): Column =
    (0 until planes)
      .map(p => when(
        dot(v, typedLit(hyperplaneValues(p, dim))) >= 0, 1 << p)
        .otherwise(0))
      .reduce(_ + _)

  /** OR-amplified LSH: `tables` independent hash tables of
    * `planesPerTable` hyperplanes each (table t uses plane indices
    * t·planesPerTable+j). A pair is a candidate if it collides in ANY
    * table — the AND-OR construction that trades candidate volume for
    * recall; a single w-bit table's collision probability p^w becomes
    * 1-(1-p^w)^L. Returns array<struct<table,sig>> to explode into
    * bucket rows.
    */
  def lshTableBuckets(v: Column, tables: Int = 4, planesPerTable: Int = 4,
                      dim: Int = 64): Column = {
    val entries = (0 until tables).map { t =>
      val sig = (0 until planesPerTable).map { j =>
        when(dot(v, typedLit(
          hyperplaneValues(t * planesPerTable + j, dim))) >= 0, 1 << j)
          .otherwise(0)
      }.reduce(_ + _)
      struct(lit(t).as("table"), sig.as("sig"))
    }
    array(entries: _*)
  }
}
