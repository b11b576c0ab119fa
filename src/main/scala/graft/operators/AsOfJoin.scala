package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, the most recent right value
  * with right.ts <= left.ts within the same key.
  *
  * Implemented as union + single ordered window pass per key — NOT a
  * range join: both inputs shuffle once on the key, one sort per
  * partition, last-value carried forward. At 100 TB this is the shape
  * that survives: no range-condition nested-loop blowup, no broadcast
  * of a fact table, skew bounded by the per-key sort. (A right row at
  * exactly left.ts is visible to that left row: right sorts before left
  * on ties.)
  */
object AsOfJoin {

  /** left: (key, ts, ...leftCols), right: (key, ts, rightVal).
    * Returns left rows + `asof_<rightVal>` column (null when no right row
    * at or before ts). Right must be unique per (key, ts) — pre-aggregate
    * upstream if not.
    *
    * `toleranceMs` bounds staleness: a match older than `ts -
    * toleranceMs` is rejected (null), the pandas merge_asof / kdb wj
    * contract. The bound rides the SAME window pass — the matched
    * right row's timestamp is carried beside its value — so tolerance
    * costs no extra shuffle or join.
    */
  def backward(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, rightValCol: String,
      toleranceMs: Long = Long.MaxValue): DataFrame = {
    val leftTagged = left
      .withColumn("_is_left", lit(1))
      .withColumn("_rv", lit(null).cast(right.schema(rightValCol).dataType))
      .withColumn("_rts", lit(null).cast("long"))
    val rightTagged = right
      .select(col(keyCol), col(tsCol), col(rightValCol))
      .withColumn("_is_left", lit(0))
      .withColumnRenamed(rightValCol, "_rv")
      .withColumn("_rts", col(tsCol).cast("long"))

    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_arv", last(col("_rv"), ignoreNulls = true).over(w))
      .withColumn("_arts", last(col("_rts"), ignoreNulls = true).over(w))
    val value =
      if (toleranceMs == Long.MaxValue) col("_arv")
      else when(col(tsCol).cast("long") - col("_arts") <= toleranceMs,
        col("_arv"))
    carried
      .withColumn(s"asof_$rightValCol", value)
      .where(col("_is_left") === 1)
      .drop("_is_left", "_rv", "_rts", "_arv", "_arts")
  }
}
