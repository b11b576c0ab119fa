package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.NearDupIndex
import graft.streaming.StreamIndexDedup
import graft.tsdb.TsdbFixtures.spark

/** Index-backed ingest dedup: one batch's near-dup clusters collapse to
  * their min-id representative, documents the index already holds are
  * dropped, shingle-less documents pass through un-indexed, survivors
  * are appended — so replaying the same batch contributes nothing, and
  * the streaming wrapper grows one corpus across micro-batches.
  */
class StreamIndexDedupSpec extends AnyFunSuite {
  import spark.implicits._

  // Distinct token universe per i (no cross-doc overlap); an `edit`
  // replaces one word mid-doc, a high-jaccard near-copy. Exact copies
  // (no edit) are used where the test must be band-hit-deterministic —
  // near-dup recall itself is NearDupIndexSpec's job.
  private def doc(i: Int, edit: String = ""): String =
    (0 until 40).map { j =>
      if (edit.nonEmpty && j == 15) edit else s"d${i}w$j"
    }.mkString(" ")

  private def tmp(): String =
    Files.createTempDirectory("graft_sidx").toString

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("ingestBatch: keep-one within batch, drop vs index, replay is empty") {
    val path = tmp()
    NearDupIndex.build(
      (0 until 20).map(i => (i.toLong, doc(i))).toDF("doc_id", "text"),
      "doc_id", "text", path)
    // 100: copy of indexed doc 3 -> dropped; 101/102: copies of each
    // other (novel base 50) -> 101 kept; 103: novel -> kept; 104: too
    // short to shingle -> passes through un-indexed
    val batch = Seq(
      (100L, doc(3)),
      (101L, doc(50)), (102L, doc(50)),
      (103L, doc(60)), (104L, "tiny")).toDF("doc_id", "text")
    val kept = NearDupIndex.ingestBatch(batch, "doc_id", "text", path, 0.5)
    assert(ids(kept) == Set(101L, 103L, 104L), s"got ${ids(kept)}")
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    // replay: everything comparable now self-matches the index
    val replay = NearDupIndex.ingestBatch(batch, "doc_id", "text", path, 0.5)
    assert(ids(replay) == Set(104L), s"replay kept ${ids(replay)}")
    // a later copy of a batch survivor is dropped too
    val next = NearDupIndex.ingestBatch(
      Seq((200L, doc(60))).toDF("doc_id", "text"),
      "doc_id", "text", path, 0.5)
    assert(ids(next).isEmpty)
  }

  test("beforeAppend sees the settled survivors before the index grows") {
    val path = tmp()
    NearDupIndex.init(spark, path)
    var delivered = Set.empty[Long]
    val kept = NearDupIndex.ingestBatch(
      Seq((1L, doc(1)), (2L, doc(1))).toDF("doc_id", "text"),
      "doc_id", "text", path, 0.5,
      beforeAppend = df => delivered = ids(df))
    assert(delivered == Set(1L) && ids(kept) == Set(1L))
  }

  test("streaming: index state persists across micro-batches to parquet") {
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp(); val out = tmp() + "/out"
    NearDupIndex.init(spark, idx)
    val mem = MemoryStream[(Long, String)]
    val q = StreamIndexDedup.toParquet(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", idx, out,
        threshold = 0.5)
      .option("checkpointLocation", tmp() + "/ckpt").start()
    try {
      mem.addData((1L, doc(1)), (2L, doc(2)))
      q.processAllAvailable()
      // copy of batch-1's doc 1 is suppressed by the INDEX, not
      // state-store state; doc 3 is novel
      mem.addData((3L, doc(3)), (4L, doc(1)))
      q.processAllAvailable()
    } finally q.stop()
    assert(ids(spark.read.parquet(out)) == Set(1L, 2L, 3L))
  }
}
