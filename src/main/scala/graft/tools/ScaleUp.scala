package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-evidence data generator: replicate a driver fixture dir K× with
  * key remapping into a new lake, so the sf0.1→sf1 slope of any declared
  * query can be MEASURED instead of argued from plan shape. Each replica i
  * offsets every entity key by i·ceil(maxKey+1) — foreign keys offset by
  * the SAME constant per table pair, so referential integrity (orders→
  * customer, lineitem→part/supplier/orders, events.user_id population,
  * documents/embeddings ids) is preserved and join selectivities stay
  * constant while cardinality grows linearly. Shared dims region/nation
  * stay fixed (as TPC-H scaling does). Timestamp columns keep their values
  * — time-range density grows K×, which is the realistic "same window,
  * more traffic" growth profile for the events table.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <outDir> [k=10]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.local(cpus, "graft-scaleup")
    run(spark, src, out, k)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, out: String, k: Int): Unit = {
    def t(n: String): DataFrame = graft.Tables(spark, src, n)
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    val custN = maxOf(t("customer"), "c_custkey")
    val suppN = maxOf(t("supplier"), "s_suppkey")
    val partN = maxOf(t("part"), "p_partkey")
    val orderN = maxOf(t("orders"), "o_orderkey")
    val eventN = maxOf(t("events"), "event_id")
    val userN = maxOf(t("events"), "user_id")
    val docN = maxOf(t("documents"), "doc_id")
    val vecN = maxOf(t("embeddings"), "vec_id")

    /** K replicas of `df`, each long key column offset by replica·stride.
      * One crossJoin against a K-row replica index — a narrow broadcast
      * that scales to any K without driver-side unions.
      */
    def replicate(df: DataFrame, offsets: Map[String, Long]): DataFrame = {
      val reps = spark.range(0, k).select(col("id").as("_rep"))
      val r = df.crossJoin(broadcast(reps))
      offsets.foldLeft(r) { case (acc, (c, stride)) =>
        acc.withColumn(c, col(c) + col("_rep") * stride)
      }.drop("_rep")
    }

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name written")
    }

    // shared dims: copied once, unscaled
    write(t("region"), "region")
    write(t("nation"), "nation")
    // entity NAMES regenerate from the offset key: a replica customer
    // is a DISTINCT business, not ten co-named copies of one. Without
    // this, name-blocked operators (record linkage, fuzzy join) see
    // every blocking key's population grow K× — their candidate sets
    // explode K² from a fixture artifact real growth doesn't have
    // (TPC-H names diversify with keys; measured: func_edit_distance
    // 0.9 s → 82 s at 10× under co-named replicas). Replica 0 is
    // byte-identical either way (the source names ARE key-derived).
    write(replicate(t("customer"), Map("c_custkey" -> custN))
      .withColumn("c_name",
        format_string("Customer#%09d", col("c_custkey"))), "customer")
    write(replicate(t("supplier"), Map("s_suppkey" -> suppN))
      .withColumn("s_name",
        format_string("Supplier#%09d", col("s_suppkey"))), "supplier")
    write(replicate(t("part"), Map("p_partkey" -> partN)), "part")
    write(replicate(t("orders"),
      Map("o_orderkey" -> orderN, "o_custkey" -> custN)), "orders")
    write(replicate(t("lineitem"),
      Map("l_orderkey" -> orderN, "l_partkey" -> partN, "l_suppkey" -> suppN)),
      "lineitem")
    // events must land as a single FILE named events.parquet (the driver
    // lake's layout): the streaming reader's pathGlobFilter matches leaf
    // file names, so a directory-shaped events.parquet would stream zero
    // files silently
    val evTmp = s"$out/_events_stage"
    replicate(t("events"), Map("event_id" -> eventN, "user_id" -> userN))
      .coalesce(1).write.mode("overwrite").parquet(evTmp)
    locally {
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      val stage = Paths.get(evTmp)
      val part = Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error("no events part file"))
      Files.createDirectories(Paths.get(out))
      Files.move(part, Paths.get(out, "events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Files.list(stage).iterator().asScala.foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(stage)
      println("[scaleup] events written")
    }
    // documents: replica text is PERTURBED — K-fold byte-identical text
    // would put every doc in a K-wide dup clique and turn the dedup
    // family quadratic in K, which is drift, not scale. A single suffix
    // token defeats only EXACT dedup: the 3-gram shingle streams stay
    // ~identical, so MinHash/LSH still buckets all K replicas together
    // (measured: doc_dedup_containment went 8 s → 130 s from 10× to 30×
    // under suffix-only perturbation). Tagging every 3rd token with the
    // replica id puts a replica-distinct token in EVERY 3-gram window —
    // zero cross-replica shingle collisions, near-dup density preserved
    // at the source lake's level. Replica 0 stays byte-identical.
    val reps = spark.range(0, k).select(col("id").as("_rep"))
    write(t("documents").crossJoin(broadcast(reps))
      .withColumn("doc_id", col("doc_id") + col("_rep") * docN)
      .withColumn("text", when(col("_rep") === 0, col("text"))
        .otherwise(array_join(expr(
          "transform(split(text, ' '), (t, i) -> " +
            "if(i % 3 = 2, concat(t, '_r', _rep), t))"), " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("_rep"), "documents")
    write(replicate(t("embeddings"), Map("vec_id" -> vecN)), "embeddings")
  }
}
