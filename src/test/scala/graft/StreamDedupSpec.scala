package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup
import graft.tsdb.TsdbFixtures.spark

/** Streaming exact dedup semantics: first arrival wins, duplicates are
  * suppressed across micro-batches (state persists between batches).
  */
class StreamDedupSpec extends AnyFunSuite {
  import spark.implicits._

  test("first-seen-wins across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamDedup.exactFirstSeen(
      mem.toDF().toDF("doc_id", "text"), "text")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      mem.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      // duplicate in a LATER batch is dropped by persisted state
      mem.addData((4L, "beta"), (5L, "gamma"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("sdedup").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kept == Set((1L, "alpha"), (2L, "beta"), (5L, "gamma")))
  }

  test("watermark-bounded dedup suppresses in-window duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val out = StreamDedup.exactWithinWatermark(
      mem.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sdedup_wm")
      .outputMode("append").start()
    // well above epoch 0: the initial watermark is 0 and rows at or
    // behind it are dropped as late
    def ts(min: Int) = new Timestamp(1600000000000L + min * 60000L)
    try {
      // no intra-batch duplicates: which row of a same-batch pair
      // survives is partition-order dependent, not arrival-ordered
      mem.addData((1L, "alpha", ts(0)), (3L, "beta", ts(2)))
      q.processAllAvailable()
      mem.addData((4L, "alpha", ts(3))) // still within the watermark
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("sdedup_wm").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }
}
