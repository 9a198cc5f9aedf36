package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-5 queries that the oracle's hash-compare can't
  * articulate: CDC feed/apply consistency, triangle orientation, k-means
  * contraction, and that the DSIR weights actually discriminate the
  * target domain.
  */
class Round5QueriesSpec extends SparkSpec {
  import spark.implicits._

  test("cdc feed op counts equal the three delta operators' row counts, " +
       "and applying the feed to prev reconstructs newest exactly") {
    val q = graft.queries.DeltaQueries.queries
    val feed = q("delta_cdc_feed")(spark, sfDir).cache()
    val byOp = feed.groupBy("op").count().as[(String, Long)].collect().toMap
    assert(byOp("U") == q("delta_updated_nullsafe")(spark, sfDir).count())
    assert(byOp("I") == q("delta_added")(spark, sfDir).count())
    assert(byOp("D") == q("delta_removed")(spark, sfDir).count())
    // feed ∘ apply ≡ newest: drop D, upsert U∪I over prev
    val prev = graft.queries.DeltaQueries.previous(spark, sfDir)
    val newest = graft.queries.DeltaQueries.newest(spark, sfDir)
    val touched = feed.select("o_orderkey")
    val applied = prev
      .join(touched, Seq("o_orderkey"), "left_anti")
      .unionByName(feed.where(col("op") =!= "D").drop("op"))
    assert(applied.exceptAll(newest).isEmpty && newest.exceptAll(applied).isEmpty)
    feed.unpersist()
  }

  test("triangles are strictly ordered a < b < c and each vertex pair " +
       "is an above-mean trade edge") {
    val out = graft.queries.RelationalQueries.queries("graph_triangles")(
        spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (a, b, c) => a < b && b < c })
    // no duplicate triangles (the orientation makes each unique)
    assert(out.distinct.length == out.length)
  }

  test("k-means: cluster count is at most K, members partition the " +
       "corpus, and the round-2 inertia does not exceed round-1's") {
    val K = 4
    val corpus = Tables(spark, sfDir, "embeddings").count()
    val out = graft.queries.SimilarityQueries.queries("emb_kmeans_lloyd")(
        spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(out.length <= K && out.map(_._2).sum == corpus)
    // Lloyd contraction: re-assigning against the re-estimated centroids
    // cannot increase total inertia beyond the assignment it was fitted
    // to (up to the 1e-6 centroid quantization, bounded loosely here)
    // — computed against the first-pass assignment's inertia
    val firstPass = {
      import graft.operators.VectorSim
      val b = Tables(spark, sfDir, "embeddings")
        .select(col("vec_id"), VectorSim.toDoubleArray(col("embedding")).as("e"))
      val c0 = b.select(col("vec_id"), col("e"),
          md5(concat(lit("km|"), col("vec_id").cast("string"))).as("h"))
        .orderBy("h", "vec_id").limit(K)
        .withColumn("i", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("h", "vec_id"))
          .cast("long") - 1)
        .select(col("i"), col("e").as("c"))
      b.crossJoin(broadcast(c0))
        .select(col("vec_id"),
          struct(VectorSim.l2sq(col("e"), col("c")).as("d"),
            col("i").as("i")).as("di"))
        .groupBy("vec_id").agg(min(col("di")).as("best"))
        .agg(sum(col("best.d"))).as[Double].head()
    }
    assert(out.map(_._3).sum <= firstPass + 1e-3)
  }

  test("dsir weights rank target-domain (en) docs above the background " +
       "on average") {
    val out = graft.queries.CurationQueries.queries("cur_dsir_importance")(
        spark, sfDir)
      .select(col("lang"), col("dsir6")).as[(String, Double)].collect()
    val en = out.filter(_._1 == "en").map(_._2)
    val rest = out.filter(_._1 != "en").map(_._2)
    assert(en.nonEmpty && rest.nonEmpty)
    assert(en.sum / en.length > rest.sum / rest.length)
  }

  test("quality logit: keep agrees with the sign of the emitted " +
       "quantized logit (no boundary straddle after quantization)") {
    val out = graft.queries.TextQueries.queries("text_quality_logit")(
        spark, sfDir)
      .select(col("logit_u6"), col("keep")).as[(Long, Boolean)].collect()
    assert(out.nonEmpty)
    // floor-quantized: z > 0 implies floor(z*1e6) >= 0; z <= 0 implies < = 0
    assert(out.forall { case (l, k) => if (k) l >= 0 else l <= 0 })
  }
}
