package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.dedup.NearDupIndex

/** Streaming near-dup ingest backed by the PERSISTED index — the
  * complement of [[StreamNearDedup]]: there, dedup state lives in the
  * state store (bounded, watermark-evictable, per-query); here it lives
  * in the [[NearDupIndex]] parquet tables, so it is unbounded,
  * restart-safe without a streaming checkpoint of its own, shared with
  * every batch probe ([[NearDupIndex.probePairs]]), and growable by
  * offline [[NearDupIndex.append]]s between runs.
  *
  * Per micro-batch ([[NearDupIndex.ingestBatch]]): keep-one within the
  * batch, drop what the index holds, deliver survivors to the sink,
  * then append them to the index. Delivery-before-append makes the
  * sink at-least-once under batch replay: a replayed batch whose
  * append already happened self-matches the index and delivers nothing
  * twice; a crash between delivery and append re-delivers, never
  * loses. Micro-batches run serially within a query — the index is
  * single-writer by construction; do not run two ingest queries
  * against one index path.
  */
object StreamIndexDedup {

  /** A [[DataStreamWriter]] whose every micro-batch is deduped against
    * (and appended to) the index at `indexPath`, with survivors handed
    * to `sink`. The caller starts it (and may set trigger/checkpoint
    * options first). `docs` must carry a long-valued `idCol`, unique
    * across the stream's lifetime.
    */
  def writer(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, threshold: Double = 0.6)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      if (!batch.isEmpty) {
        NearDupIndex.ingestBatch(batch.toDF(), idCol, textCol, indexPath,
          threshold, beforeAppend = kept => sink(kept, batchId))
        ()
      }
    }

  /** [[writer]] delivering survivors as parquet appends to `outPath` —
    * the continuous form of "curated corpus lands here". At-least-once:
    * a replayed not-yet-appended batch appends its survivors again;
    * readers wanting exactly-once dedup the output by `idCol`.
    */
  def toParquet(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String,
      threshold: Double = 0.6): DataStreamWriter[Row] =
    writer(docs, idCol, textCol, indexPath, threshold) { (kept, _) =>
      kept.write.mode("append").parquet(outPath)
    }

  /** [[writer]]'s semantic twin over a [[graft.ann.EmbedIndex]]: each
    * micro-batch of (idCol, vecCol) rows is cosine-deduped within the
    * batch and against the stored embedding corpus, survivors delivered
    * then appended. Same replay contract; build the index (at least its
    * quantizer) before streaming — cells come from the STORED model.
    */
  def embedWriter(docs: DataFrame, idCol: String, vecCol: String,
      indexPath: String, threshold: Double = 0.995)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      if (!batch.isEmpty) {
        graft.ann.EmbedIndex.ingestBatch(batch.toDF(), idCol, vecCol,
          indexPath, threshold, beforeAppend = kept => sink(kept, batchId))
        ()
      }
    }

  /** [[embedWriter]] delivering survivors as parquet appends. */
  def embedToParquet(docs: DataFrame, idCol: String, vecCol: String,
      indexPath: String, outPath: String,
      threshold: Double = 0.995): DataStreamWriter[Row] =
    embedWriter(docs, idCol, vecCol, indexPath, threshold) { (kept, _) =>
      kept.write.mode("append").parquet(outPath)
    }
}
