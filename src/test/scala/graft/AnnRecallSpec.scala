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
