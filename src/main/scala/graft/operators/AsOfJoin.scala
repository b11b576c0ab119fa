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
    * contract. The bound rides the SAME window pass — each right row's
    * (ts, value) travels as ONE struct through a single
    * last(ignoreNulls) window, so the staleness check always pairs a
    * value with the timestamp of the row it came from (two independent
    * last() windows would desynchronize when the right value column
    * holds nulls) and tolerance costs no extra shuffle or join. A
    * null-VALUED right row still counts as the most recent match
    * (merge_asof semantics: the match is the row; its value may be
    * null).
    */
  def backward(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, rightValCol: String,
      toleranceMs: Long = Long.MaxValue): DataFrame = {
    val rStruct = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        right.schema(rightValCol).dataType)))
    val leftTagged = left
      .withColumn("_is_left", lit(1))
      .withColumn("_r", lit(null).cast(rStruct))
    val rightTagged = right
      .select(col(keyCol), col(tsCol),
        struct(col(tsCol).cast("long").as("ts"),
          col(rightValCol).as("v")).as("_r"))
      .withColumn("_is_left", lit(0))

    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_ar", last(col("_r"), ignoreNulls = true).over(w))
    val value =
      if (toleranceMs == Long.MaxValue) col("_ar").getField("v")
      else when(col(tsCol).cast("long") - col("_ar").getField("ts") <= toleranceMs,
        col("_ar").getField("v"))
    carried
      .withColumn(s"asof_$rightValCol", value)
      .where(col("_is_left") === 1)
      .drop("_is_left", "_r", "_ar")
  }
}
