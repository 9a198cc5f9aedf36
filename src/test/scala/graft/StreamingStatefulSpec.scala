package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom streaming state (SURVEY §2.4 streaming/stateful): a
  * `mapGroupsWithState` running per-user counter over a MemoryStream,
  * proving state persists across micro-batches — the primitive under
  * sessionization / dedup-in-stream / rate tracking. Update-mode memory
  * sink; two micro-batches; the second batch's output must reflect
  * state accumulated in the first.
  */
class StreamingStatefulSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState accumulates per-user state across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (user_id, value)

    val counted = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + events.size
          state.update(total)
          (user, total)
      }
      .toDF("user_id", "n_total")

    val qn = "stateful_counts"
    val q = counted.writeStream
      .outputMode("update").format("memory").queryName(qn).start()
    try {
      input.addData((1L, 10L), (1L, 11L), (2L, 20L))
      q.processAllAvailable()
      val batch1 = spark.table(qn).as[(Long, Long)].collect().toSet
      assert(batch1 == Set((1L, 2L), (2L, 1L)))

      input.addData((1L, 12L), (3L, 30L))
      q.processAllAvailable()
      val all = spark.table(qn).as[(Long, Long)].collect().toSet
      // user 1's second-batch row continues from the first batch's state
      assert(all.contains((1L, 3L)), s"state must persist: $all")
      assert(all.contains((3L, 1L)))
    } finally q.stop()
  }
}
