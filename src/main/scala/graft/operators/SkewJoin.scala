package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join: the manual remedy for a hot key that AQE's skew
  * splitting can't fully absorb (e.g. one key holding >1 executor's
  * worth of rows on the probe side).
  *
  * The skewed (large) side gets a uniform salt in [0, buckets); the
  * build (smaller) side is replicated once per salt value; the join key
  * becomes (key, salt), so a hot key's rows spread over `buckets`
  * reducers instead of one. Join RESULT is exactly the plain equi-join —
  * salting only changes the shuffle distribution — which is what the
  * accompanying spec asserts.
  *
  * Scale notes (100 TB): cost = replicating the build side ×buckets
  * through the shuffle — size buckets to the worst key's excess, not
  * globally (a production variant salts ONLY the known-hot keys and
  * unions the rest through a plain join; this operator keeps the uniform
  * form the tests can reason about). Salt is `monotonically_increasing_id
  * % buckets`: row-arbitrary, key-independent — any per-row value works
  * because correctness never depends on salt placement.
  */
object SkewJoin {

  def saltedJoin(skewed: DataFrame, build: DataFrame,
                 skewedKey: String, buildKey: String,
                 buckets: Int = 8): DataFrame = {
    require(buckets >= 1)
    val salted = skewed.withColumn(
      "_salt", (monotonically_increasing_id() % buckets).cast("int"))
    val replicated = build.withColumn(
      "_salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated,
        salted(skewedKey) === replicated(buildKey) &&
          salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
