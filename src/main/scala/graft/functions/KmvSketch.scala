package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * [[Aggregator]] — the custom-UDAF tier of the extension ladder, and a
  * genuinely mergeable sketch: the buffer is the k smallest distinct
  * hash values seen; two buffers merge by union + trim, so partial
  * aggregation and AQE re-planning compose exactly like built-in aggs.
  *
  * Estimate: with hashes uniform on [0, 2^48), if the k-th smallest
  * distinct hash is h_k, distinct ≈ (k-1) · 2^48 / h_k; below k distinct
  * values the buffer IS the distinct set and the count is exact. All
  * integer state + one fixed-shape double expression at finish, so any
  * engine that can rank hashes reproduces the estimate bit-for-bit
  * (the DuckDB oracle does it with a row_number window).
  *
  * Scale notes (100 TB): constant memory per group (k longs), one pass,
  * map-side partial aggregation — the shape HLL/theta sketches need;
  * KMV is chosen here because its estimate is exactly reproducible in
  * portable SQL, which makes the sketch *testable* against an oracle.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Double]
  with Serializable {

  require(k >= 2, "k >= 2")

  private val hashSpace = 281474976710656.0 // 2^48

  override def zero: Seq[Long] = Vector.empty

  private def insert(buf: Seq[Long], v: Long): Seq[Long] =
    if (buf.contains(v)) buf
    else {
      val w = (buf :+ v).sorted
      if (w.size > k) w.take(k) else w
    }

  override def reduce(buf: Seq[Long], v: Long): Seq[Long] = insert(buf, v)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val m = (a ++ b).distinct.sorted
    if (m.size > k) m.take(k) else m
  }

  override def finish(buf: Seq[Long]): Double =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * hashSpace / buf.last.toDouble

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
