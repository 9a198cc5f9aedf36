package graft

import org.apache.spark.sql.DataFrame

import graft.operators.SnapshotDelta
import graft.operators.SnapshotDelta.{Legacy, NullSafe}

/** Unit coverage of the delta core (SURVEY §5.2): the change-predicate
  * NULL matrix, a fixture with known added/removed/updated rows, and
  * partition-pair selection edge cases.
  */
class SnapshotDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (String, String, String)*): DataFrame =
    rows.toDF("pid", "a", "b")

  // fixture: pid1 unchanged, pid2 value-change, pid3 value->NULL,
  // pid4 NULL->value, pid5 NULL==NULL, pid6 added, pid7 removed
  private val prev = snap(
    ("p1", "x", "1"), ("p2", "x", "1"), ("p3", "x", "1"),
    ("p4", null, "1"), ("p5", null, "1"), ("p7", "x", "1"))
  private val newer = snap(
    ("p1", "x", "1"), ("p2", "y", "1"), ("p3", null, "1"),
    ("p4", "x", "1"), ("p5", null, "1"), ("p6", "x", "1"))

  private def updatedPids(mode: SnapshotDelta.ChangeMode): Set[String] =
    SnapshotDelta.updated(newer, prev, "pid", Seq("a", "b"), mode)
      .select("pid").as[String].collect().toSet

  test("legacy mode detects value changes but NOT null transitions " +
       "(3-valued !=, reference parity agency-delta.go:168-200)") {
    assert(updatedPids(Legacy) == Set("p2"))
  }

  test("null-safe mode detects value changes AND null transitions") {
    assert(updatedPids(NullSafe) == Set("p2", "p3", "p4"))
  }

  test("null-safe detects a NULL moving between columns (regression: " +
    "struct hashing skips null fields, so the fast-path hash must " +
    "include null markers)") {
    val p = snap(("p8", "x", null))
    val n = snap(("p8", null, "x"))
    assert(SnapshotDelta.updated(n, p, "pid", Seq("a", "b"), NullSafe)
      .count() == 1)
  }

  test("null == null is never a change in either mode") {
    assert(!updatedPids(Legacy).contains("p5"))
    assert(!updatedPids(NullSafe).contains("p5"))
  }

  test("updatedNarrow matches updated bit-for-bit on the NULL matrix " +
       "in both modes (the narrow-shuffle plan is a pure rewrite)") {
    Seq(Legacy, NullSafe).foreach { mode =>
      val plain = SnapshotDelta.updated(newer, prev, "pid",
        Seq("a", "b"), mode).collect().toSet
      val narrow = SnapshotDelta.updatedNarrow(newer, prev, "pid",
        Seq("a", "b"), mode).collect().toSet
      assert(narrow == plain, s"mode $mode diverged")
    }
  }

  test("updatedNarrow preserves pair multiplicity under duplicate keys " +
       "(the changed-key steering set is distinct, but the rejoined " +
       "pairs re-run the exact pair-level filter)") {
    // d1: two prev rows x one newer row; one pair changed, one identical
    val p = snap(("d1", "x", "1"), ("d1", "y", "1"), ("d2", "x", "1"))
    val n = snap(("d1", "x", "1"), ("d2", "x", "1"))
    Seq(Legacy, NullSafe).foreach { mode =>
      val plain = SnapshotDelta.updated(n, p, "pid", Seq("a", "b"), mode)
        .collect().toSeq.map(_.toSeq).sortBy(_.toString)
      val narrow = SnapshotDelta.updatedNarrow(n, p, "pid", Seq("a", "b"), mode)
        .collect().toSeq.map(_.toSeq).sortBy(_.toString)
      assert(narrow == plain, s"mode $mode multiplicity diverged")
    }
  }

  test("updatedNarrow plan pin: no shuffle exchange ever carries the " +
       "wide columns — only (key, hash) projections cross the wire; the " +
       "wide sides reach the final join semi-joined and AQE-broadcast") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // a genuinely wide shape: 20 compared columns
    val cols = (1 to 20).map(i => s"c$i")
    def wide(seed: Int): DataFrame = {
      import org.apache.spark.sql.functions._
      val base = spark.range(0, 500).select(
        concat(org.apache.spark.sql.functions.lit("k"), $"id").as("pid") +:
          cols.map(c => concat(lit(c), $"id" % lit(seed)).as(c)): _*)
      base
    }
    val df = SnapshotDelta.updatedNarrow(wide(7), wide(11), "pid", cols)
    df.collect() // materialize so AQE finalizes the plan
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        // descend into the persisted steering set's cached plan so its
        // exchanges are width-checked too (they carry only (ck,hash))
        case im: org.apache.spark.sql.execution.columnar
            .InMemoryTableScanExec => Seq(im.relation.cachedPlan)
        case other                    => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    val widths = allNodes(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s.child.output.length }
    // the steering set is an eagerly-materialized persisted set now
    // (its own narrow job carries the (key, hash) shuffles), so the
    // final plan may be entirely exchange-free — the pin is that NO
    // exchange, anywhere incl. inside the cached steering plan, ever
    // carries the wide columns
    assert(widths.forall(_ <= 3),
      s"a wide row crossed a shuffle: exchange widths $widths " +
        "(narrow plan must only ever shuffle key+hash)")
    // and the steering set genuinely arrived pre-materialized: the
    // plan reads the persisted set (recomputable lineage — survives
    // executor loss, unlike a localCheckpoint) instead of re-deriving
    // the narrow join inline
    assert(df.queryExecution.executedPlan.toString
        .contains("InMemoryTableScan"),
      "expected the persisted changed-key set in the final plan")
  }

  test("updatedNarrow runtime guard: a most-keys-change snapshot pair " +
       "past the broadcast budget routes to the plain wide join (one " +
       "join node, no steering set), bit-parity preserved") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.functions._
    // EVERY key changes — the pathological rate the broadcast contract
    // excludes; the steering set is table-sized here
    val p = spark.range(0, 300).select(
      concat(lit("k"), $"id").as("pid"), lit("old").as("a"), lit("1").as("b"))
    val n = spark.range(0, 300).select(
      concat(lit("k"), $"id").as("pid"), lit("new").as("a"), lit("1").as("b"))
    val guarded = SnapshotDelta.updatedNarrow(n, p, "pid", Seq("a", "b"),
      Legacy, maxChangedKeys = 10L)
    val plain = SnapshotDelta.updated(n, p, "pid", Seq("a", "b"), Legacy)
    assert(guarded.collect().toSet == plain.collect().toSet)
    def allNodes(pl: SparkPlan): Seq[SparkPlan] = {
      val kids = pl match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      pl +: kids.flatMap(allNodes)
    }
    val joins = allNodes(guarded.queryExecution.executedPlan)
      .count(_.isInstanceOf[BaseJoinExec])
    assert(joins == 1,
      s"guard must route to updated's single wide join, saw $joins joins")
    // and under the budget the narrow plan still engages (3 joins:
    // steering + two semis feeding the final pair join = 4 total)
    val narrow = SnapshotDelta.updatedNarrow(n, p, "pid", Seq("a", "b"),
      Legacy, maxChangedKeys = 1000000L)
    assert(narrow.collect().toSet == plain.collect().toSet)
    val narrowJoins = allNodes(narrow.queryExecution.executedPlan)
      .count(_.isInstanceOf[BaseJoinExec])
    assert(narrowJoins >= 3, s"narrow path expected, saw $narrowJoins joins")
  }

  test("added = keys new in newest (anti-join intent, Readme.md:13)") {
    val pids = SnapshotDelta.added(newer, prev, "pid")
      .select("pid").as[String].collect().toSet
    assert(pids == Set("p6"))
  }

  test("removed = keys absent from newest") {
    val pids = SnapshotDelta.removed(newer, prev, "pid")
      .select("pid").as[String].collect().toSet
    assert(pids == Set("p7"))
  }

  test("addedLiteral (bug-compat mode of the reference 'new' query) " +
       "returns 0 rows with the newest schema") {
    val lit = SnapshotDelta.addedLiteral(newer)
    assert(lit.count() == 0)
    assert(lit.columns.toSeq == newer.columns.toSeq)
  }

  test("scd2 emits the right version rows per key class: unchanged keeps " +
       "its original validity, changed closes old + opens new, added " +
       "opens, removed closes; null transitions open versions") {
    val hist = SnapshotDelta.scd2(newer, prev, "pid", Seq("a", "b"),
        "2024-01-08", "2024-01-15")
      .select("pid", "a", "valid_from", "valid_to", "status")
      .as[(String, String, String, String, String)]
      .collect().toSet
    assert(hist == Set(
      // p1 unchanged, p5 NULL==NULL unchanged: current since prev date
      ("p1", "x", "2024-01-08", null, "current"),
      ("p5", null, "2024-01-08", null, "current"),
      // p2 value change, p3 value->NULL, p4 NULL->value: closed + current
      ("p2", "x", "2024-01-08", "2024-01-15", "closed"),
      ("p2", "y", "2024-01-15", null, "current"),
      ("p3", "x", "2024-01-08", "2024-01-15", "closed"),
      ("p3", null, "2024-01-15", null, "current"),
      ("p4", null, "2024-01-08", "2024-01-15", "closed"),
      ("p4", "x", "2024-01-15", null, "current"),
      // p6 added: opens; p7 removed: closes
      ("p6", "x", "2024-01-15", null, "current"),
      ("p7", "x", "2024-01-08", "2024-01-15", "closed")))
  }

  test("partitionPair picks the two newest values, newest first") {
    assert(SnapshotDelta.partitionPair(
      Seq("2024-01-01", "2024-01-15", "2024-01-08")) ==
      ("2024-01-15", "2024-01-08"))
  }

  test("partitionPair error parity with agency-delta.go:123 for 0/1 values") {
    for (vals <- Seq(Seq.empty[String], Seq("2024-01-01"))) {
      val e = intercept[IllegalStateException](
        SnapshotDelta.partitionPair(vals))
      assert(e.getMessage == "Not enough partitions to run delta")
    }
  }

  test("partitionPair dedups values (a re-listed partition is not a pair)") {
    val e = intercept[IllegalStateException](
      SnapshotDelta.partitionPair(Seq("2024-01-01", "2024-01-01")))
    assert(e.getMessage == "Not enough partitions to run delta")
  }

  test("delta_history folds every consecutive pair with the right " +
    "added/removed counts") {
    import org.apache.spark.sql.functions.col
    val rows = graft.queries.DeltaQueries
      .queries("delta_history")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val dates = graft.sources.AgencyLake.historyDates
    assert(rows.keySet == dates.tail.toSet)
    // independent arithmetic: membership of snapshot k is
    // o_orderkey % prime(k) <> 0, so added at pair (k-1 -> k) counts keys
    // divisible by prime(k-1) but not prime(k), removed the reverse
    val keys = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey")).as[Long].collect()
    val primes = Seq(11, 13, 17, 19)
    dates.tail.indices.foreach { i =>
      val (pp, np) = (primes(i), primes(i + 1))
      val expAdded = keys.count(k => k % pp == 0 && k % np != 0).toLong
      val expRemoved = keys.count(k => k % pp != 0 && k % np == 0).toLong
      val (upd, added, removed) = rows(dates(i + 1))
      assert(added == expAdded, s"added at ${dates(i + 1)}")
      assert(removed == expRemoved, s"removed at ${dates(i + 1)}")
      assert(upd > 0, s"updated at ${dates(i + 1)} should be non-empty")
    }
  }
}
