package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Literal-centroid assignment — the scale-correct core of k-means /
  * nearest-prototype operators: centroids are METADATA (K×dim doubles,
  * a few KB even at K=65k), so they live on the driver and are embedded
  * into the plan as array literals. Assignment is then a pure per-row
  * expression (a codegen'd fold per centroid + an `array_min` over K
  * structs): no join, no broadcast table, and — critically — NO SHUFFLE
  * of the corpus. At 100 TB each Lloyd iteration costs exactly one
  * corpus scan plus one K×dim-cell aggregate (map-side combined), the
  * same license as PageRank's `deg.count()` driver round-trip.
  *
  * Portability contract: per-dimension means are summed as exact
  * DECIMAL(18,9) (aggregation-order independent) and rounded to 6
  * digits BEFORE being collected, so both engines iterate from
  * identical centroid values; distances are sequential left-folds
  * ([[VectorSim.l2sq]]/[[VectorSim.dot]]) — bit-identical across
  * engines and runs.
  */
object KMeans {

  /** Deterministic seed sample: the K rows with lexicographically
    * smallest `md5(salt || id)`, index = rank. One TakeOrderedAndProject
    * over the corpus — O(K) state per task, no shuffle.
    */
  def seedCentroids(df: DataFrame, k: Int, salt: String,
                    idCol: String = "vec_id",
                    vecCol: String = "e"): Seq[(Long, Seq[Double])] = {
    val rows = df
      .select(col(vecCol).as("c"),
        md5(concat(lit(salt), col(idCol).cast("string"))).as("h"),
        col(idCol).as("id"))
      .orderBy("h", "id").limit(k)
      .select("c").collect()
    rows.zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Double](0)) }
  }

  /** Per-key rounded-6 per-dimension means, collected to the driver
    * (|keys|×dim cells — metadata-scale). The ONLY distributed step of a
    * Lloyd re-estimation: posexplode → one partial-agg'd groupBy; the
    * shuffle moves |keys|×dim cells, never the corpus.
    */
  def collectCentroids(df: DataFrame, keyCol: String,
                       vecCol: String = "e"): Seq[(Any, Seq[Double])] =
    df.select(col(keyCol).as("k"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("k", "pos")
      .agg(round(sum(col("v").cast(DecimalType(18, 9))).cast("double") /
        count(lit(1)), 6).as("m"))
      .groupBy("k")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("c"))
      .orderBy("k")
      .collect()
      .map(r => (r.get(0), r.getSeq[Double](1)))

  /** Adds `cl` (winning centroid id) and `d` (its squared L2 distance):
    * argmin over K literal centroids via `array_min` on (d, id) structs —
    * distance ascending, id-ascending tie-break. Pure per-row codegen
    * work; the plan gains no join and no exchange.
    */
  def assignL2(df: DataFrame, cents: Seq[(Long, Seq[Double])],
               vecCol: String = "e"): DataFrame = {
    val entries = cents.map { case (i, c) =>
      struct(VectorSim.l2sq(col(vecCol), typedLit(c)).as("d"),
        lit(i).as("i"))
    }
    df.withColumn("_best", array_min(array(entries: _*)))
      .withColumn("cl", col("_best.i"))
      .withColumn("d", col("_best.d"))
      .drop("_best")
  }

  /** Adds `assigned` (winning key) and `cos6` (its round-6 cosine):
    * argmax over K literal centroids, key-ascending tie-break — encoded
    * as `array_min` over (-cos6, key) structs so one comparator serves
    * both directions. Centroid norms are folded driver-side with the
    * same sequential left-fold as [[VectorSim.norm]] (identical IEEE
    * order ⇒ identical bits), saving a per-row constant recomputation.
    */
  def assignCosineMax(df: DataFrame, cents: Seq[(Any, Seq[Double])],
                      vecCol: String = "e"): DataFrame = {
    val entries = cents.map { case (k, c) =>
      val cn = math.sqrt(c.foldLeft(0.0)((acc, x) => acc + x * x))
      val cos6 = round(VectorSim.dot(col(vecCol), typedLit(c)) /
        (VectorSim.norm(col(vecCol)) * lit(cn)), 6)
      struct((-cos6).as("negcos"), lit(k).as("k"))
    }
    df.withColumn("_best", array_min(array(entries: _*)))
      .withColumn("assigned", col("_best.k"))
      .withColumn("cos6", -col("_best.negcos"))
      .drop("_best")
  }
}
