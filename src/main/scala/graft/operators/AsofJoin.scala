package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with the same
  * key and time <= the left row's time — an operator Spark lacks
  * natively, composed from built-ins via the union + carry-forward
  * pattern:
  *
  *  1. union both sides with a side marker,
  *  2. one window sorted by (time, side, right-id) per key,
  *  3. `last(right-payload, ignoreNulls)` carries the latest right row
  *     forward onto every subsequent left row,
  *  4. keep left rows.
  *
  * This is ONE shuffle on the key (the window), versus the naive
  * range-join + top-1 which explodes every left row against all earlier
  * right rows before discarding all but one. At 100 TB the union-window
  * form is the only viable shape: cost is sort + single pass,
  * independent of time-range density. Ties (equal time) resolve
  * right-before-left, then by right id ascending, so the carried row is
  * the max-id right row at that time — deterministic.
  */
object AsofJoin {

  /** Forward as-of: for each left row, the EARLIEST right row with the
    * same key and `rightTime >= leftTime` (the "next event" lookup —
    * e.g. first retry after an error, next restock after an order).
    * Same union + one-window shape, with the scan direction reversed:
    * the window orders time DESCENDING so `last(..)` carries the
    * nearest-following right row backwards onto each left row. Ties at
    * equal time resolve to the MIN right id (mirror image of the
    * backward join's max-id rule) — deterministic.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      rightId: String, carried: Seq[String]): DataFrame =
    impl(left, right, key, leftTime, rightTime, rightId, carried,
      forward = true)

  /** `left` gains `carried` columns from the latest `right` row (same
    * `key`, `rightTime <= leftTime`). Left rows with no prior right row
    * are dropped (inner as-of semantics).
    *
    * The carried payload travels as ONE struct column that is null
    * exactly on left rows: `last(_p, ignoreNulls)` therefore skips left
    * rows but carries a matched right row even when its payload columns
    * are themselves NULL — a NULL in a carried column neither falls back
    * to an older right row nor drops the left row (it arrives as NULL,
    * as a join would deliver it). The struct's presence doubles as the
    * inner-join existence check.
    *
    * @param carried right-side columns to carry onto left rows; renamed
    *                with prefix `asof_`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightId: String, carried: Seq[String]): DataFrame =
    impl(left, right, key, leftTime, rightTime, rightId, carried,
      forward = false)

  private def impl(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   rightId: String, carried: Seq[String],
                   forward: Boolean): DataFrame = {
    val lCols = left.columns.toSeq
    val sideL = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_rid", lit(null).cast("long"))
      .select(
        (Seq(col(key).as("_k"), col("_t"), col("_side"), col("_rid")) ++
          lCols.map(col) ++
          carried.map(c => lit(null).cast(right.schema(c).dataType).as(s"_c_$c"))): _*)
    val sideR = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_rid", col(rightId).cast("long"))
      .select(
        (Seq(col(key).as("_k"), col("_t"), col("_side"), col("_rid")) ++
          lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          carried.map(c => col(c).as(s"_c_$c"))): _*)
    // forward scans time descending, so "last seen right row" is the
    // nearest-FOLLOWING one; _rid flips too so the equal-time winner is
    // min-id (forward) vs max-id (backward)
    val w = (if (forward)
        Window.partitionBy("_k")
          .orderBy(col("_t").desc, col("_side"), col("_rid").desc)
      else
        Window.partitionBy("_k")
          .orderBy(col("_t"), col("_side"), col("_rid")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val payload = when(col("_side") === 0,
      struct((col("_rid") +: carried.map(c => col(s"_c_$c"))): _*))
    sideL.unionByName(sideR)
      .withColumn("_p", payload)
      .select((lCols.map(col) :+ col("_side") :+
        last(col("_p"), ignoreNulls = true).over(w).as("_cp")): _*)
      .where(col("_side") === 1)
      // inner as-of: no prior right row ⇔ no carried struct
      .where(col("_cp").isNotNull)
      .select(lCols.map(col) ++
        carried.map(c => col(s"_cp._c_$c").as(s"asof_$c")): _*)
  }
}
