package graft

import java.sql.Timestamp

import graft.operators.{AsofJoin, Multimodal, TextDedup, VectorSim}
import org.apache.spark.sql.functions._

/** Unit coverage of the composed operators: as-of join edge cases,
  * multimodal decode, and dedup helpers.
  */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left row; " +
       "ties resolve to the right row (inclusive <=)") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 200L) // no prior right row -> dropped
    ).toDF("user_id", "lt", "left_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L),
      (1L, ts("2024-01-01 12:00:00"), 11L), // equal ts: counts (inclusive)
      (2L, ts("2024-01-01 09:30:00"), 20L)
    ).toDF("user_id", "rt", "right_id")
    val out = AsofJoin.asofJoin(left, right, "user_id", "lt", "rt",
        "right_id", Seq("right_id"))
      .select("left_id", "asof_right_id").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 10L), (101L, 11L)))
  }

  test("asofJoinForward picks the earliest right row at-or-after each " +
       "left row; equal-time ties resolve to the MIN right id; left rows " +
       "with no following right row are dropped") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L), // equal-ts right counts
      (1L, ts("2024-01-01 13:00:00"), 102L), // nothing after -> dropped
      (2L, ts("2024-01-01 09:00:00"), 200L)
    ).toDF("user_id", "lt", "left_id")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 10L),
      (1L, ts("2024-01-01 12:00:00"), 11L),
      (1L, ts("2024-01-01 12:00:00"), 12L), // tie: min id (11) wins
      (2L, ts("2024-01-01 09:30:00"), 20L)
    ).toDF("user_id", "rt", "right_id")
    val out = AsofJoin.asofJoinForward(left, right, "user_id", "lt", "rt",
        "right_id", Seq("right_id"))
      .select("left_id", "asof_right_id").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 10L), (101L, 11L), (200L, 20L)))
  }

  test("asofJoin equal-time right rows: the max right id wins (determinism)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 100L))
      .toDF("user_id", "lt", "left_id")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L),
      (1L, ts("2024-01-01 10:00:00"), 12L),
      (1L, ts("2024-01-01 10:00:00"), 11L)
    ).toDF("user_id", "rt", "right_id")
    val out = AsofJoin.asofJoin(left, right, "user_id", "lt", "rt",
        "right_id", Seq("right_id"))
      .select("asof_right_id").as[Long].collect().toSeq
    assert(out == Seq(12L))
  }

  test("asofJoin carries a matched right row even when its payload is " +
       "NULL: no fallback to an older right row, no dropped left row") {
    val left = Seq(
      (1L, ts("2024-01-01 12:00:00"), 100L),
      (2L, ts("2024-01-01 12:00:00"), 200L) // only right row has NULL note
    ).toDF("user_id", "lt", "left_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L, Option("old")),
      (1L, ts("2024-01-01 11:00:00"), 11L, Option.empty[String]),
      (2L, ts("2024-01-01 11:00:00"), 20L, Option.empty[String])
    ).toDF("user_id", "rt", "right_id", "note")
    val out = AsofJoin.asofJoin(left, right, "user_id", "lt", "rt",
        "right_id", Seq("right_id", "note"))
      .select("left_id", "asof_right_id", "asof_note")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(out == Set((100L, 11L, None), (200L, 20L, None)))
  }

  test("multimodal decode extracts header fields and full length; " +
       "batch size smaller than the partition exercises batching") {
    val media = Seq(
      (1L, "image", Array[Byte](10, 20, 4, 9), 1000L),
      (2L, "image", Array[Byte](-1, 0, 3, 9), 7L) // -1 -> unsigned 255
    ).toDF("doc_id", "kind", "payload", "full_len")
    val metas = Multimodal.decode(media, batchSize = 1)
      .collect().sortBy(_.doc_id)
    assert(metas(0) == Multimodal.MediaMeta(1L, 1000L, 10L, 20L, "rgb"))
    assert(metas(1) == Multimodal.MediaMeta(2L, 7L, 255L, 0L, "gray"))
  }

  test("multimodal decode/sampleFrames survive short payloads: sentinel " +
       "meta and zero frames instead of a task-killing exception") {
    val media = Seq(
      (1L, "image", Array[Byte](10, 20, 4, 9), 1000L),
      (2L, "image", Array.empty[Byte], 5000L),      // empty upload
      (3L, "image", Array[Byte](7), 5000L)          // truncated header
    ).toDF("doc_id", "kind", "payload", "full_len")
    val metas = Multimodal.decode(media).collect().sortBy(_.doc_id)
    assert(metas(0).mode == "rgb")
    assert(metas(1) == Multimodal.MediaMeta(2L, 5000L, 0L, 0L, "invalid"))
    assert(metas(2) == Multimodal.MediaMeta(3L, 5000L, 0L, 0L, "invalid"))
    val frames = Multimodal.sampleFrames(media)
    // empty payload -> no frames; 1-byte payload still has its header
    // byte, so frame sampling proceeds (5 frames, every 7th -> 1)
    assert(frames.filter(col("doc_id") === 2L).count() == 0)
    assert(frames.filter(col("doc_id") === 3L).count() == 1)
    assert(frames.filter(col("doc_id") === 1L).count() == 1)
  }

  test("candidatePairs bucket-size cap drops a degenerate band bucket " +
       "(candidate count stays bounded, informative buckets survive)") {
    val degenerate = (1 to 100).map(i => (i.toLong, 0, "boilerplate"))
    val normal = Seq((500L, 1, "k2"), (501L, 1, "k2"))
    val buckets = (degenerate ++ normal).toDF("doc_id", "band", "key")
    // uncapped baseline: the degenerate bucket alone contributes
    // 100*99/2 pairs — the quadratic blowup the cap exists to prevent
    assert(TextDedup.candidatePairs(buckets,
      maxBucketSize = Int.MaxValue).count() == 4951L)
    val capped = TextDedup.candidatePairs(buckets, maxBucketSize = 10)
    assert(capped.as[(Long, Long)].collect().toSet == Set((500L, 501L)))
  }

  test("candidatePairs cap plans as a broadcast anti-join, never a window") {
    // the r3 regression shape: a count(*) OVER (PARTITION BY band, key)
    // cap sorted and materialized the full bucket stream twice (2.9x
    // slower). The cap must stay a pre-aggregated oversized-key set +
    // broadcast left-anti probe — pin the plan so it cannot come back.
    val buckets = (1 to 50).map(i => (i.toLong, i % 3, s"k${i % 5}"))
      .toDF("doc_id", "band", "key")
    val plan = TextDedup.candidatePairs(buckets, maxBucketSize = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window cap crept back:\n$plan")
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("Broadcast"), plan)
  }

  test("shingles: fewer tokens than n yields no shingles, not a blowup") {
    val df = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
    val sh = TextDedup.shingles(df, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(sh == Set((2L, "a b c"), (2L, "b c d")))
  }

  test("saltedJoin returns exactly the plain equi-join result and joins " +
       "on (key, salt)") {
    // heavy skew: 1000 rows on one key
    val skewed = ((1 to 1000).map(i => (42L, s"r$i")) ++
      Seq((7L, "x"), (9L, "y"))).toDF("k", "payload")
    val build = Seq((42L, "hot"), (7L, "warm"), (8L, "unmatched"))
      .toDF("bk", "name")
    val salted = graft.operators.SkewJoin.saltedJoin(skewed, build, "k", "bk")
    val plain = skewed.join(build, skewed("k") === build("bk"))
    assert(salted.count() == 1001)
    assert(salted.select("k", "payload", "bk", "name").except(
      plain.select("k", "payload", "bk", "name")).isEmpty)
    assert(plain.select("k", "payload", "bk", "name").except(
      salted.select("k", "payload", "bk", "name")).isEmpty)
    val planStr = salted.queryExecution.executedPlan.toString
    assert(planStr.contains("_salt"), "join must key on the salt too")
  }

  test("hotKeySaltedJoin equals the plain equi-join: only hot keys are " +
       "salted, cold keys take the plain path, degenerate cases hold") {
    val skewed = ((1 to 1000).map(i => (42L, s"r$i")) ++
      Seq((7L, "x"), (9L, "y"))).toDF("k", "payload")
    val build = Seq((42L, "hot"), (7L, "warm"), (8L, "unmatched"))
      .toDF("bk", "name")
    val plain = skewed.join(build, skewed("k") === build("bk"))
      .select("k", "payload", "bk", "name")
    // threshold 10: only key 42 is hot
    val hot = graft.operators.SkewJoin.hotKeySaltedJoin(
        skewed, build, "k", "bk", hotThreshold = 10)
      .select("k", "payload", "bk", "name")
    assert(hot.count() == 1001)
    assert(hot.except(plain).isEmpty && plain.except(hot).isEmpty)
    // threshold above every frequency: no hot keys — pure plain path
    val none = graft.operators.SkewJoin.hotKeySaltedJoin(
        skewed, build, "k", "bk", hotThreshold = 100000)
      .select("k", "payload", "bk", "name")
    assert(none.except(plain).isEmpty && plain.except(none).isEmpty)
  }

  test("connectedComponents: chain collapses to one component, separate " +
       "components stay separate, labels are per-component minima") {
    // chain 1-2-3-4, triangle 10-11-12 (with a redundant edge), pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("id1", "id2")
    val cc = graft.operators.GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L).forall(cc(_) == 20L))
    assert(cc.size == 9)
  }

  test("connectedComponents converges on a 100-node chain within the " +
       "default round budget (pointer jumping: log-diameter, not diameter)") {
    val chain = (1L until 100L).map(i => (i, i + 1)).toDF("id1", "id2")
    val cc = graft.operators.GraphOps.connectedComponents(chain)
      .as[(Long, Long)].collect()
    assert(cc.length == 100 && cc.forall(_._2 == 1L))
  }

  test("pagerank: rank mass is conserved each round (sums to 1), the " +
       "star center dominates, and symmetric leaves tie exactly") {
    // star: center 1 linked to leaves 2..9
    val star = (2L to 9L).map(i => (1L, i)).toDF("id1", "id2")
    val pr = graft.operators.GraphOps.pagerank(star, iterations = 5)
      .as[(Long, Double)].collect().toMap
    // undirected graph, no dangling mass: teleport + damped mass = 1
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    // the center receives every leaf's full contribution
    assert(pr(1L) > pr(2L) * 4)
    // leaves are exchangeable — identical arithmetic, EXACTLY equal
    assert((3L to 9L).forall(i => pr(i) == pr(2L)))
  }

  test("driver-side hyperplane values match the SQL md5 derivation " +
       "(the oracle recomputes them via SQL)") {
    val sqlVals = spark.sql(
      """SELECT transform(sequence(0, 63), d ->
        |  cast((cast(conv(substring(md5(concat('hp3_', cast(d as string))), 1, 4), 16, 10) as bigint)
        |   % 1001 - 500) / 500.0 as double))""".stripMargin)
      .as[Seq[Double]].head()
    assert(sqlVals == VectorSim.hyperplaneValues(3, 64))
  }

  test("native graft_dot expression is registered and bit-identical to " +
       "the higher-order fold") {
    assert(spark.catalog.functionExists("graft_dot"),
      "GraftExtensions must register graft_dot in the test session")
    val df = Seq((Array(1.5, -2.25, 3.125), Array(0.5, 4.0, -1.0)))
      .toDF("a", "b")
    val native = df.selectExpr("graft_dot(a, b)").as[Double].head()
    val fold = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).as[Double].head()
    assert(native == fold)
    assert(native == 1.5 * 0.5 + -2.25 * 4.0 + 3.125 * -1.0)
    // null array -> null out (BinaryExpression null-intolerance)
    val n = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))")
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("cosine fold is exact on known vectors") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0)), (Array(2.0, 0.0), Array(1.0, 0.0)))
      .toDF("a", "b")
    val out = df.select(VectorSim.cosine(col("a"), col("b"))).as[Double]
      .collect().toSeq
    assert(out == Seq(0.0, 1.0))
  }
}
