package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregate pushdown to precomputed partition statistics — the Spark
  * rendering of the reference's signature optimization
  * (`ScanHint`, tachyon_core/src/storage/file.rs:168-175,244-327 and
  * planner.rs:34-60): a whole-range sum/count/min/max/avg answers from
  * per-file header stats for files fully inside [start,end], and only
  * decompresses rows for partially-covered files.
  *
  * Here the "file header" is a summary row per (name, bucket): the
  * bucketed stats table is tiny (one row per stream-hour), so the
  * covered part of a query aggregates thousands of rows instead of
  * millions, and only the ≤2 boundary buckets touch raw data. At 100 TB
  * the stats table is ~6 orders of magnitude smaller than the data and
  * both reads prune on partition columns.
  */
object StatsAggregate {

  /** Build the per-(name,bucket) stats table; persist alongside the data
    * (GraftDb keeps it under <root>/stats) or maintain it incrementally
    * with streaming (Ingest.windowedStats shares the schema shape).
    */
  def buildStats(data: DataFrame, bucketMs: Long): DataFrame =
    data
      .withColumn("bucket", col("timestamp") - pmod(col("timestamp"), lit(bucketMs)))
      .groupBy("name", "bucket")
      .agg(
        count(lit(1)).as("n"),
        sum("value").as("value_sum"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        min("timestamp").as("min_ts"),
        max("timestamp").as("max_ts"))

  /** Whole-range aggregates for one series over [startMs, endMs], served
    * from `stats` for fully-covered buckets + raw rows for the boundary
    * buckets. Returns one row: (n, value_sum, min_value, max_value, avg_value)
    * — the tachyon aggregate set (avg = sum/count decomposition,
    * planner.rs:52-60).
    */
  def aggregate(
      data: DataFrame, stats: DataFrame, name: String,
      startMs: Long, endMs: Long, bucketMs: Long): DataFrame = {
    // Bucket is fully covered iff [bucket, bucket+bucketMs) ⊆ [start, end+1).
    val coveredLo = startMs + (if (startMs % bucketMs == 0) 0 else bucketMs - startMs % bucketMs)
    val coveredHiExcl = (endMs + 1) - ((endMs + 1) % bucketMs)

    val covered = stats
      .where(col("name") === name &&
        col("bucket") >= coveredLo && col("bucket") + bucketMs <= coveredHiExcl)
      .select(col("n"), col("value_sum"), col("min_value"), col("max_value"))

    // Boundary rows: inside the query range but not in a covered bucket.
    val boundary = data
      .where(col("name") === name &&
        col("timestamp") >= startMs && col("timestamp") <= endMs &&
        (col("timestamp") < coveredLo || col("timestamp") >= coveredHiExcl))
      .select(lit(1L).as("n"), col("value").as("value_sum"),
        col("value").as("min_value"), col("value").as("max_value"))

    covered.unionAll(boundary)
      .agg(
        sum("n").as("n"),
        sum("value_sum").as("value_sum"),
        min("min_value").as("min_value"),
        max("max_value").as("max_value"))
      .select(
        coalesce(col("n"), lit(0L)).as("n"),
        col("value_sum"),
        col("min_value"),
        col("max_value"),
        (col("value_sum") / col("n")).as("avg_value"))
  }

  /** PER-WINDOW aggregates from the stats sidecar — the ScanHint idea
    * applied to downsampling (and to the engine's `*_over_time` range
    * functions, RangeFns.scala): tumbling `windowMs` windows aligned to
    * `startMs` over [startMs, endMs], each answered from stats rows for
    * every bucket that sits WHOLLY inside both the query range and one
    * window, and from raw rows for everything else. All three
    * memberships are row-local predicates (no join):
    *
    *  - a stats bucket is usable iff it is fully inside [start, end+1)
    *    AND does not straddle a window boundary (when windowMs is a
    *    multiple of bucketMs and startMs is bucket-aligned, that is
    *    every interior bucket — the common dashboard case reads NO raw
    *    data except the two range edges);
    *  - a raw row participates iff its bucket is NOT usable.
    *
    * Returns (window_start, n, value_sum, min_value, max_value,
    * avg_value), one row per window with ≥1 sample. Windows and buckets
    * may be mutually unaligned in every way; correctness never depends
    * on alignment, only the raw-row volume does.
    */
  def downsample(
      data: DataFrame, stats: DataFrame, name: String,
      startMs: Long, endMs: Long, bucketMs: Long, windowMs: Long): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    val coveredLo = startMs + (if (startMs % bucketMs == 0) 0 else bucketMs - startMs % bucketMs)
    val coveredHiExcl = (endMs + 1) - ((endMs + 1) % bucketMs)

    // window start of an instant t (t >= startMs): exact Long arithmetic
    def wstartOf(t: Column): Column = t - pmod(t - startMs, lit(windowMs))

    // bucket straddles a window boundary iff its first and last instants
    // fall in different windows
    val bkt = col("bucket")
    val usable = bkt >= coveredLo && bkt + bucketMs <= coveredHiExcl &&
      wstartOf(bkt) === wstartOf(bkt + bucketMs - 1)

    val fromStats = stats
      .where(col("name") === name && usable)
      .select(wstartOf(bkt).as("window_start"),
        col("n"), col("value_sum"), col("min_value"), col("max_value"))

    val rawBucket = col("timestamp") - pmod(col("timestamp"), lit(bucketMs))
    val rawUsable = rawBucket >= coveredLo && rawBucket + bucketMs <= coveredHiExcl &&
      wstartOf(rawBucket) === wstartOf(rawBucket + bucketMs - 1)
    val fromRaw = data
      .where(col("name") === name &&
        col("timestamp") >= startMs && col("timestamp") <= endMs && !rawUsable)
      .select(wstartOf(col("timestamp")).as("window_start"),
        lit(1L).as("n"), col("value").as("value_sum"),
        col("value").as("min_value"), col("value").as("max_value"))

    fromStats.unionAll(fromRaw)
      .groupBy("window_start")
      .agg(
        sum("n").as("n"),
        sum("value_sum").as("value_sum"),
        min("min_value").as("min_value"),
        max("max_value").as("max_value"))
      .select(col("window_start"), col("n"), col("value_sum"),
        col("min_value"), col("max_value"),
        (col("value_sum") / col("n")).as("avg_value"))
  }
}
