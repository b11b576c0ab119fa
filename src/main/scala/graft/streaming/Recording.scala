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
  * time passes the lateness bound, and sealed windows append through
  * [[GraftDb.importFrame]] inside foreachBatch.
  *
  * NOT the file sink, deliberately: FileStreamSink plants
  * `_spark_metadata` in the data dir, after which every BATCH read of
  * the store resolves through the sink's commit log and silently stops
  * seeing Inserter/importCsv/importFrame files (and compact/expire
  * would delete files the log still lists). foreachBatch keeps the
  * store a plain parquet layout. The cost, documented: delivery is
  * AT-LEAST-ONCE — a crash between the append and the checkpoint
  * commit re-appends that batch's windows on restart (the store is
  * append-only, so they land as duplicate samples; Prometheus' TSDB
  * dedupes same-timestamp writes, this store does not).
  *
  * Window semantics: tumbling [T-w, T) EPOCH-ALIGNED, stamped at the
  * window END — one boundary-sample seam away from the batch form's
  * sliding (T-w, T] anchored at startMs. Backfill + continuous on one
  * target line up only when the backfill's startMs is window-aligned;
  * the seam sample (exactly on a boundary) counts in the earlier
  * window here and the later one there. State is bounded by
  * (open windows × series) — watermarking is what makes the rule run
  * forever.
  */
object Recording {

  /** Build the continuous rule as a DataStreamWriter (caller starts and
    * owns the query). `kind` ∈ sum | avg | min | max | count — the
    * per-window statistic (the sliding range-fn family needs
    * overlapping windows; tumbling is the streaming-native shape).
    * `sourceOptions` reaches the file source: by default it pins
    * `maxFileAge` far out so a rule started WITHOUT a checkpoint never
    * silently skips store files older than the source's 7-day default
    * (partial windows that look valid are worse than a slow first
    * batch); long-lived rules can lower it to bound source state.
    */
  def rule(db: GraftDb, sourceName: String,
      targetSelector: String, windowMs: Long, latenessMs: Long,
      checkpointDir: String, kind: String = "sum",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      sourceOptions: Map[String, String] =
        Map("maxFileAge" -> "36500d")): DataStreamWriter[Row] = {
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
    db.createStreamIfAbsent(targetSelector, graft.tsdb.VType.F64)
    db.tailStream(sourceOptions)
      .where(col("name") === sourceName)
      .withColumn("etime", timestamp_millis(col("timestamp")))
      .withWatermark("etime", s"$latenessMs milliseconds")
      .groupBy(window(col("etime"), s"$windowMs milliseconds"))
      .agg(aggCol.as("value"))
      .select(unix_millis(col("window.end")).as("timestamp"),
        col("value").cast("double").as("value"))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        db.importFrame(targetSelector, batch)
      }
  }
}
