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
    */
  def backward(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, rightValCol: String): DataFrame = {
    val leftTagged = left
      .withColumn("_is_left", lit(1))
      .withColumn("_rv", lit(null).cast(right.schema(rightValCol).dataType))
    val rightTagged = right
      .select(col(keyCol), col(tsCol), col(rightValCol))
      .withColumn("_is_left", lit(0))
      .withColumnRenamed(rightValCol, "_rv")

    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$rightValCol", last(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_is_left") === 1)
      .drop("_is_left", "_rv")
  }
}
