package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming ingestion for the series store — the streaming
  * analogue of the reference's synchronous write path
  * (storage/writer/persistent_writer.rs:76-116): an in-progress
  * micro-batch plays the role of the open `.ty` file; the micro-batch
  * commit is the seal; `withWatermark` replaces the implicit
  * "whatever arrives goes into the open file" policy with explicit
  * bounded lateness.
  */
object Ingest {

  /** Normalize a raw event stream to the long series format.
    * Input schema: (name STRING, timestamp LONG(ms), value DOUBLE).
    */
  def toSeries(raw: DataFrame, bucketMs: Long = 3600 * 1000L): DataFrame =
    raw.select(col("name"), col("timestamp"), col("value"))
      .withColumn("bucket", col("timestamp") - pmod(col("timestamp"), lit(bucketMs)))

  /** Append the stream to the partitioned Parquet store. Exactly-once via
    * the file-sink commit log; partitioned identically to GraftDb so
    * batch queries prune on (name, bucket).
    */
  def appendToStore(series: DataFrame, dataDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    // cluster each micro-batch by the partition key first: one file per
    // touched (name, bucket) dir per batch, not one per task per dir —
    // without it sustained ingest fragments into tasks x dirs tiny
    // files per commit (compact() exists, but not creating the mess
    // beats cleaning it). Plain repartition, not a REBALANCE hint:
    // streaming plans don't run AQE, which is what gives rebalance its
    // skew-split; a hot bucket here is bounded by the micro-batch.
    series.repartition(col("name"), col("bucket")).writeStream
      .format("parquet")
      .option("path", dataDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("name", "bucket")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("10 seconds"))

  /** Stream-stream interval join: each left event pairs with right
    * events of the same key within [0, windowMs] after it. Watermarks on
    * both sides bound the join state (Spark drops buffered rows once
    * event time passes lateness + interval).
    * Inputs: (key LONG, timestamp LONG(ms), value DOUBLE) streaming DFs.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      windowMs: Long, latenessMs: Long): DataFrame = {
    val l = left
      .withColumn("l_time", timestamp_millis(col("timestamp")))
      .withWatermark("l_time", s"$latenessMs milliseconds")
      .select(col("key"), col("l_time"), col("value").as("l_value"))
    val r = right
      .withColumn("r_time", timestamp_millis(col("timestamp")))
      .withWatermark("r_time", s"$latenessMs milliseconds")
      .select(col("key").as("r_key"), col("r_time"), col("value").as("r_value"))
    l.join(r,
      col("key") === col("r_key") &&
        col("r_time") >= col("l_time") &&
        col("r_time") <= col("l_time") + expr(s"INTERVAL $windowMs MILLISECONDS"))
      .select(col("key"), unix_millis(col("l_time")).as("l_ts"),
        unix_millis(col("r_time")).as("r_ts"), col("l_value"), col("r_value"))
  }

  /** Per-(name, bucket) statistics in the EXACT schema of
    * StatsAggregate.buildStats, computed continuously: tumbling windows
    * of bucketMs are epoch-aligned, so `window.start` equals the batch
    * bucket column (timestamp - timestamp % bucketMs). Emitted in Update
    * mode each micro-batch carries the CURRENT totals of every window it
    * touched, so a replace-by-key upsert (GraftDb.statsStream) keeps the
    * stats table identical to a full rebuild after every commit.
    */
  def bucketStats(raw: DataFrame, bucketMs: Long, latenessMs: Long): DataFrame =
    raw
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", s"$latenessMs milliseconds")
      .groupBy(col("name"),
        window(col("event_time"), s"$bucketMs milliseconds"))
      .agg(
        count(lit(1)).as("n"),
        sum("value").as("value_sum"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        min("timestamp").as("min_ts"),
        max("timestamp").as("max_ts"))
      .select(col("name"),
        unix_millis(col("window.start")).as("bucket"),
        col("n"), col("value_sum"), col("min_value"), col("max_value"),
        col("min_ts"), col("max_ts"))

  /** Event-time windowed aggregates with bounded lateness: per-series
    * sum/count/min/max over tumbling windows — the streaming rendition of
    * the reference's per-file header statistics (storage/file.rs:15-36),
    * maintained continuously instead of at seal time.
    */
  def windowedStats(raw: DataFrame, windowMs: Long, latenessMs: Long): DataFrame = {
    raw
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", s"$latenessMs milliseconds")
      .groupBy(col("name"),
        window(col("event_time"), s"$windowMs milliseconds"))
      .agg(
        count(lit(1)).as("n"),
        sum("value").as("value_sum"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .select(col("name"),
        unix_millis(col("window.start")).as("window_start"),
        col("n"), col("value_sum"), col("min_value"), col("max_value"))
  }
}
