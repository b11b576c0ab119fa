package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-time analogue of
  * `Dedup.exactGroups`: keep the FIRST arrival of each distinct
  * content hash, drop every later duplicate before it ever lands in
  * the corpus store.
  *
  * Both variants key state on the 128-bit md5 of the text (16 bytes a
  * row in the state store, never the text itself), so state size is
  * rows-seen-bounded, not bytes-seen-bounded.
  */
object StreamDedup {

  /** All-time first-seen-wins dedup. State grows with the number of
    * DISTINCT documents ever seen — the right tool for bounded corpus
    * backfills replayed through the streaming path. For endless ingest
    * use [[exactWithinWatermark]].
    */
  def exactFirstSeen(raw: DataFrame, textCol: String): DataFrame =
    raw.withColumn("text_hash", md5(col(textCol)))
      .dropDuplicates("text_hash")

  /** Watermark-bounded dedup: a duplicate is suppressed while its first
    * occurrence is within `lateness` of the event-time watermark; older
    * state is evicted, so an exact copy arriving much later is admitted
    * again (and left for the batch dedup sweep). Bounded state = the
    * production posture for endless ingest.
    *
    * `tsCol` must be a TimestampType event-time column.
    */
  def exactWithinWatermark(raw: DataFrame, textCol: String, tsCol: String,
      lateness: String): DataFrame =
    raw.withColumn("text_hash", md5(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("text_hash")
}
