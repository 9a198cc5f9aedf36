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
  * globally. [[saltedJoin]] keeps the uniform form the tests can reason
  * about; [[hotKeySaltedJoin]] is the production variant that salts ONLY
  * the known-hot keys and unions the rest through a plain join, so the
  * build-side replication cost is paid for the handful of keys that
  * need it. Salt is `monotonically_increasing_id % buckets`:
  * row-arbitrary, key-independent — any per-row value works because
  * correctness never depends on salt placement.
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

  /** Two-pass salted join: keys whose probe-side frequency exceeds
    * `hotThreshold` are salted over `buckets` reducers; everything else
    * goes through a plain equi-join, and the two results are unioned.
    * Result is exactly the plain equi-join (both branches partition the
    * probe side by key membership, and a hot-branch probe row can only
    * match hot-branch build rows).
    *
    * Pass 1 is the key histogram — a partial-agg'd groupBy over just the
    * key column, tiny relative to the data; a production deployment can
    * swap in a sample-based estimate without touching the split logic,
    * since any key set works (missing a hot key only costs performance,
    * never rows). The hot-key set is broadcast (a handful of keys by
    * definition), so the split itself adds no shuffle; only the hot
    * build rows are replicated ×buckets, not the whole build side.
    */
  def hotKeySaltedJoin(skewed: DataFrame, build: DataFrame,
                       skewedKey: String, buildKey: String,
                       hotThreshold: Long, buckets: Int = 8): DataFrame = {
    require(buckets >= 1 && hotThreshold >= 1)
    val hotKeys = skewed.groupBy(col(skewedKey).as("_hk"))
      .agg(count(lit(1)).as("_cnt"))
      .where(col("_cnt") > hotThreshold)
      .select("_hk")
    val hotSkewed = skewed.join(broadcast(hotKeys),
      skewed(skewedKey) === col("_hk"), "left_semi")
    val coldSkewed = skewed.join(broadcast(hotKeys),
      skewed(skewedKey) === col("_hk"), "left_anti")
    val hotBuild = build.join(broadcast(hotKeys),
      build(buildKey) === col("_hk"), "left_semi")
    saltedJoin(hotSkewed, hotBuild, skewedKey, buildKey, buckets)
      // cold probe rows can't match hot build keys, so the full build
      // side is safe here and saves a second anti-join over it
      .unionByName(coldSkewed.join(build,
        coldSkewed(skewedKey) === build(buildKey)))
  }
}
