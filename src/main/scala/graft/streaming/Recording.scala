package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.tsdb.GraftDb

/** Continuous recording rules — the streaming twin of
  * [[graft.tsdb.GraftDb.record]]: the batch form backfills a derived
  * stream over history; this keeps it FRESH as samples arrive. The
  * store's own delta files are the source ([[GraftDb.tailStream]]), a
  * watermarked tumbling-window aggregate seals each window once event
  * time passes the lateness bound, and sealed windows append to the
  * SAME store under the target stream's partitions through the file
  * sink — exactly-once via the sink's commit log, like
  * [[Ingest.appendToStore]] (a foreachBatch insert would be
  * at-least-once on retry).
  *
  * Window semantics match the batch engine's tumbling form: the
  * emitted timestamp is the WINDOW START (RangeFns' wstart
  * convention), windows are [start, start + windowMs) aligned to the
  * epoch. State is bounded by (open windows × series) — watermarking
  * is what makes the rule run forever.
  */
object Recording {

  /** Build the continuous rule as a DataStreamWriter (caller starts and
    * owns the query). `kind` ∈ sum | avg | min | max | count — the
    * per-window statistic (the sliding range-fn family needs
    * overlapping windows; tumbling is the streaming-native shape).
    */
  def rule(db: GraftDb, sourceName: String,
      targetSelector: String, windowMs: Long, latenessMs: Long,
      checkpointDir: String, kind: String = "sum",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): DataStreamWriter[Row] = {
    val aggCol = kind match {
      case "sum" => sum(col("value"))
      case "avg" => avg(col("value"))
      case "min" => min(col("value"))
      case "max" => max(col("value"))
      case "count" => count(lit(1)).cast("double")
      case other => throw new IllegalArgumentException(
        s"kind must be sum|avg|min|max|count, got $other")
    }
    // the target must exist BEFORE the first commit so concurrent
    // readers resolve it; created F64 like the batch record (the
    // write-side selector validation — literal name, equality
    // matchers — applies)
    val (tName, tLabels) =
      db.createStreamIfAbsent(targetSelector, graft.tsdb.VType.F64)
    db.tailStream()
      .where(col("name") === sourceName)
      .withColumn("etime", timestamp_millis(col("timestamp")))
      .withWatermark("etime", s"$latenessMs milliseconds")
      .groupBy(window(col("etime"), s"$windowMs milliseconds"))
      .agg(aggCol.as("value"))
      .select(lit(tName).as("name"),
        typedLit(tLabels).as("labels"),
        unix_millis(col("window.start")).as("timestamp"),
        col("value").cast("double").as("value"),
        lit(null).cast("long").as("lvalue"))
      .withColumn("bucket",
        col("timestamp") - pmod(col("timestamp"), lit(db.bucketWidthMs)))
      .repartition(col("name"), col("bucket"))
      .writeStream
      .format("parquet")
      .option("path", db.dataPath)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("name", "bucket")
      .outputMode(OutputMode.Append)
      .trigger(trigger)
  }
}
