package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamNearDedup
import graft.tsdb.TsdbFixtures.spark

/** Streaming near-dup suppression: an arriving document whose MinHash
  * signature collides with an earlier-kept one is reported against it,
  * across micro-batches (band state persists); unrelated documents
  * produce no matches. Signatures here use the same constants as the
  * batch operator, so agreement with `Dedup.minhashPairs` candidates is
  * by construction.
  */
class StreamNearDedupSpec extends AnyFunSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the eager rabbit watches from the tall grass near the river"
  private val other = "completely different subject matter entirely about " +
    "spacecraft navigation systems and orbital mechanics calculations today"

  test("near-copy across batches is matched to the first-seen original") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamNearDedup.minhashMatches(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", minAgree = 12)
    val q = out.writeStream.format("memory").queryName("sndd")
      .outputMode("append").start()
    try {
      mem.addData((1L, base), (2L, other))
      q.processAllAvailable()
      // later batch: a near-copy of doc 1 (appended marker), and a
      // fresh unique doc
      mem.addData((3L, base + " marker"), (4L, "unrelated short treatise " +
        "on medieval cheese making traditions in alpine villages history"))
      q.processAllAvailable()
    } finally q.stop()
    val matches = spark.table("sndd")
      .select("id", "matched_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches.nonEmpty, "near-copy produced no match events")
    assert(matches.forall(_ == (3L -> 1L)),
      s"only doc 3 should match, against doc 1: $matches")
  }

  test("exact duplicate in the same batch is suppressed deterministically") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamNearDedup.minhashMatches(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", minAgree = 16)
    val q = out.writeStream.format("memory").queryName("sndd2")
      .outputMode("append").start()
    try {
      // same batch: lower id wins regardless of partition order
      mem.addData((10L, base), (7L, base))
      q.processAllAvailable()
    } finally q.stop()
    val matches = spark.table("sndd2")
      .select("id", "matched_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches == Set(10L -> 7L), s"got $matches")
  }
}
