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

  /** `left` gains `carried` columns from the latest `right` row (same
    * `key`, `rightTime <= leftTime`). Left rows with no prior right row
    * are dropped (inner as-of semantics).
    *
    * @param carried right-side columns to carry onto left rows; renamed
    *                with prefix `asof_`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightId: String, carried: Seq[String]): DataFrame = {
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
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedCols = carried.map(c =>
      last(col(s"_c_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))
    sideL.unionByName(sideR)
      .select((lCols.map(col) :+ col("_side")) ++ carriedCols: _*)
      .where(col("_side") === 1)
      .drop("_side")
      // inner as-of: drop left rows with no prior right row (all carried
      // columns are null together — one check suffices)
      .where(col(s"asof_${carried.head}").isNotNull)
  }
}
