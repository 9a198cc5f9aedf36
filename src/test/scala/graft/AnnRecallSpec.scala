package graft

import graft.queries.SimilarityQueries

/** Recall of the approximate top-k paths against the brute-force
  * baseline — the quality contract of ANN: hash-parity with the oracle
  * proves the buckets are computed as specified, THIS proves the
  * buckets are worth computing. Deterministic fixtures make recall a
  * fixed number; floors guard against silently degrading the LSH/IVF
  * parameters.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(name: String): Set[(Long, Long)] =
    SimilarityQueries.queries(name)(spark, sfDir)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet

  test("residual IVF-PQ recalls at least what raw-vector IVF-PQ does " +
       "against the bounded brute-force baseline") {
    // same coarse cells, same ADC budget — the residual codebook only
    // has to cover the cell radius, so its quantization error (and
    // hence its ADC prune) can't be systematically worse than the
    // raw-vector codebook's. The fixture is iid noise (PQ's worst
    // case), so assert no-regression plus a modest absolute floor
    // rather than a tight number.
    val brute = pairs("sim_topk_brute_bounded")
    val raw = pairs("sim_topk_ivfpq")
    val res = pairs("sim_topk_ivfpq_residual")
    val rawR = (raw intersect brute).size.toDouble / brute.size
    val resR = (res intersect brute).size.toDouble / brute.size
    info(f"recall@5 vs bounded brute: ivfpq=$rawR%.3f residual=$resR%.3f")
    assert(resR >= rawR - 0.05, s"residual PQ degraded recall: $resR < $rawR")
    assert(resR >= 0.15, s"residual IVF-PQ recall floor broken: $resR")
  }

  test("MIPS via norm-augmentation meets a recall floor vs brute " +
       "inner-product top-5") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val mips = pairs("sim_topk_mips")
    // brute MIPS baseline computed here, not declared: bounded queries
    // against the corpus ranked by raw dot product
    val b = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        graft.operators.VectorSim.toDoubleArray(col("embedding")).as("e"))
    val q = b.filter(col("vec_id") % 20 === 0 && col("vec_id") < 500)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val w = Window.partitionBy("qid")
      .orderBy(col("dot6").desc, col("cand_id"))
    val brute = b.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand_id"),
        round(graft.operators.VectorSim.dot(col("qe"), col("e")), 6)
          .as("dot6"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select("qid", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (mips intersect brute).size.toDouble / brute.size
    info(f"MIPS recall@5 vs brute dot: $recall%.3f")
    assert(recall >= 0.3, s"MIPS recall degraded: $recall")
  }

  test("OR-amplified LSH and IVF meet recall floors vs brute force") {
    val brute = pairs("sim_topk_brute")
    val ann = pairs("sim_topk_ann")
    val ivf = pairs("sim_topk_ivf")
    val annRecall = (ann intersect brute).size.toDouble / brute.size
    val ivfRecall = (ivf intersect brute).size.toDouble / brute.size
    info(f"recall@5: ann=$annRecall%.3f ivf=$ivfRecall%.3f")
    assert(annRecall >= 0.40, s"LSH recall degraded: $annRecall")
    assert(ivfRecall >= 0.25, s"IVF recall degraded: $ivfRecall")
  }
}
