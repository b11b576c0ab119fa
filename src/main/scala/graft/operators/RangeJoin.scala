package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch interval join: match point rows to the intervals that contain
  * them (`start <= ts < end`) without the nested-loop plan Spark picks
  * for a bare inequality join.
  *
  * Shape: intervals explode to the fixed-width time buckets they
  * overlap, points map to their single containing bucket, and the match
  * is an EQUI-join on (key, bucket) plus a residual range filter. A
  * point lives in exactly one bucket, so each (point, interval) pair
  * meets exactly once — no post-join dedup.
  *
  * Scale: the naive `l.join(r, ts >= start && ts < end)` has no equi
  * predicate, so Catalyst can only broadcast-nested-loop it —
  * O(points x intervals) compared rows. Here the join is hash/sort-merge
  * on (key, bucket): movement is one shuffle of each side keyed by
  * bucket, and the interval side's amplification is interval-length /
  * bucketMs rows — pick bucketMs near the typical interval length so the
  * explode stays O(1) per interval. Skewed buckets (many intervals over
  * one hot hour) split under AQE skew handling like any equi-join.
  */
object RangeJoin {

  /** `points`: rows with `keyCol` and `tsCol` (epoch ms). `intervals`:
    * rows with `keyCol`, `startCol`, `endCol` (epoch ms, end exclusive)
    * — every other column rides along. Returns matched pairs.
    */
  def byBucket(points: DataFrame, intervals: DataFrame, keyCol: String,
      tsCol: String, startCol: String, endCol: String,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    // internal join key under a reserved name: `bucket` is a common
    // column in this library's series tables (Downsample/GapFill emit
    // it) and must pass through untouched
    val bk = "__rj_bucket"
    require(!points.columns.contains(bk) && !intervals.columns.contains(bk),
      s"inputs must not carry the reserved column $bk")
    val b = lit(bucketMs)
    // [start, end) overlaps buckets floor(start/b) .. floor((end-1)/b).
    // Empty intervals (end <= start) match nothing and are dropped up
    // front — they would otherwise feed `sequence` a descending range,
    // which throws at runtime.
    val bucketed = intervals
      .where(col(endCol) > col(startCol))
      .withColumn(bk,
      explode(sequence(
        (col(startCol) - pmod(col(startCol), b)),
        (col(endCol) - 1) - pmod(col(endCol) - 1, b),
        b)))
    points.withColumn(bk, col(tsCol) - pmod(col(tsCol), b))
      .join(bucketed, Seq(keyCol, bk))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop(bk)
  }
}
