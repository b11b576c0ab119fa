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
  * store a plain parquet layout.
  *
  * Delivery is EFFECTIVELY-ONCE: foreachBatch replays a batch whose
  * checkpoint commit did not land, and the store is append-only, so a
  * naive append would duplicate that batch's windows. [[applyBatch]]
  * closes the gap at SAMPLE granularity instead of a batchId journal:
  * Append-mode watermarked windows seal exactly once, so a window-end
  * timestamp occurs in at most one batch ever — anti-joining the batch
  * against the target's existing samples in the batch's own time span
  * (a bucket-pruned, batch-sized read) makes the append idempotent
  * even when a crash landed only PART of the previous attempt's files.
  * A batchId high-water journal cannot say that: it is atomic with
  * neither the data write nor the checkpoint, so some crash window
  * always dangles. Corollary, documented: samples some OTHER writer
  * already put at a sealed window's exact timestamp win — the
  * continuous twin of the batch form's occupied-window refusal.
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
    val aggCol = windowAgg(kind)
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
        applyBatch(db, targetSelector, batch)
      }
  }

  /** The per-window statistic column. */
  private def windowAgg(kind: String) = kind match {
    case "sum" => sum(col("value"))
    case "avg" => avg(col("value"))
    case "min" => min(col("value"))
    case "max" => max(col("value"))
    case "count" => count(lit(1)).cast("double")
    case other => throw new IllegalArgumentException(
      s"kind must be sum|avg|min|max|count, got $other")
  }

  /** Idempotent append of one sealed-window batch (the foreachBatch
    * body, named so the replay contract is spec-testable without
    * orchestrating a mid-commit crash): rows whose timestamp the
    * target already holds — a previous attempt's full or PARTIAL
    * append — are dropped before writing. The existing-read is bounded
    * to the batch's own [min, max] timestamp span, so it prunes to the
    * touched buckets and stays batch-sized however large the store
    * grows; an empty batch does no store I/O at all.
    */
  def applyBatch(db: GraftDb, targetSelector: String,
      batch: org.apache.spark.sql.DataFrame): Unit = {
    val span = batch.agg(min(col("timestamp")), max(col("timestamp"))).head()
    if (span.isNullAt(0)) return // empty batch (trigger with no sealed windows)
    // LABEL-EXACT existing-read (scanStream), not the pooled matcher
    // query: the read enforces importFrame's exactly-1 resolution (an
    // ambiguous target fails loudly BEFORE the anti-join could consume
    // a sibling's samples) and sees precisely the rows the write owns
    val existing = db.scanStream(targetSelector,
      span.getLong(0), span.getLong(1)).select(col("timestamp"))
    db.importFrame(targetSelector,
      batch.join(existing, Seq("timestamp"), "left_anti"))
  }

  /** GROUPED continuous rule — the streaming twin of
    * [[graft.tsdb.GraftDb.recordGrouped]], as [[rule]] is of `record`:
    * windows aggregate per (window, label tuple) and every group's
    * sealed windows append as its own `targetName{labels…}` series
    * (labels survive recording, Prometheus' rule shape). State bounds
    * by open windows × groups; new groups register on first
    * appearance (inside the idempotent batch apply). Same
    * effectively-once contract as [[rule]], with (group, window-end)
    * as the key.
    */
  def groupedRule(db: GraftDb, sourceName: String, targetName: String,
      byLabels: Seq[String], windowMs: Long, latenessMs: Long,
      checkpointDir: String, kind: String = "sum",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      sourceOptions: Map[String, String] =
        Map("maxFileAge" -> "36500d")): DataStreamWriter[Row] = {
    require(byLabels.nonEmpty, "groupedRule takes at least one by-label")
    db.tailStream(sourceOptions)
      .where(col("name") === sourceName)
      .withColumn("etime", timestamp_millis(col("timestamp")))
      .withWatermark("etime", s"$latenessMs milliseconds")
      .groupBy(window(col("etime"), s"$windowMs milliseconds") +:
        byLabels.map(l => element_at(col("labels"), l).as(l)): _*)
      .agg(windowAgg(kind).as("value"))
      .select(byLabels.map(col) ++ Seq(
        unix_millis(col("window.end")).as("timestamp"),
        col("value").cast("double").as("value")): _*)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        applyGroupedBatch(db, targetName, byLabels, batch)
      }
  }

  /** [[applyBatch]]'s grouped twin: idempotent on the (group label
    * set, window-end) key. Spark cannot join on MAP equality, so both
    * sides key on the canonical `k=v,k=v` label string
    * ([[graft.tsdb.LabelCodec.canonCol]] — the `without` group-key
    * codec, collision-free by escaping). The existing-read is the
    * target NAME's rows in the batch's own time span (bucket-pruned,
    * batch-sized).
    */
  def applyGroupedBatch(db: GraftDb, targetName: String,
      byLabels: Seq[String],
      batch: org.apache.spark.sql.DataFrame): Unit = {
    val span = batch.agg(min(col("timestamp")), max(col("timestamp"))).head()
    if (span.isNullAt(0)) return
    val batchLabels = map_filter(
      map(byLabels.flatMap(l => Seq(lit(l), col(l))): _*),
      (_, v) => v.isNotNull)
    val existing = db.scanNamed(targetName, span.getLong(0), span.getLong(1))
      .select(col("timestamp"),
        graft.tsdb.LabelCodec.canonCol(col("labels")).as("_ck"))
    // persisted: appendGroupedFrame reads the frame twice (the
    // group-registration distinct and the write) — without the cache
    // every trigger would run the anti-join INCLUDING the store
    // existing-read twice on the streaming hot path
    val fresh = batch
      .withColumn("_ck", graft.tsdb.LabelCodec.canonCol(batchLabels))
      .join(existing, Seq("timestamp", "_ck"), "left_anti")
      .drop("_ck")
      .persist()
    try db.appendGroupedFrame(targetName, byLabels, fresh)
    finally fresh.unpersist()
  }
}
