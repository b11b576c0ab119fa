package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.tsdb.{GraftDb, StatsAggregate}
import graft.tsdb.TsdbFixtures.spark

/** Incremental stats maintenance ≡ full rebuild: the streaming upsert
  * path (GraftDb.statsStream over Ingest.bucketStats) must leave the
  * stats table byte-identical to StatsAggregate.buildStats over the same
  * rows — including after a second micro-batch re-touches an
  * already-written bucket.
  */
class StatsStreamSpec extends AnyFunSuite {
  import spark.implicits._

  private val BucketMs = 3600 * 1000L

  test("streaming upsert equals batch rebuild, across re-touched buckets") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_stats_stream").toString
    val db = new GraftDb(spark, root, BucketMs)
    val ckpt = Files.createTempDirectory("graft_stats_ckpt").toString

    val mem = MemoryStream[(String, Long, Double)]
    val q = db.statsStream(
      mem.toDF().toDF("name", "timestamp", "value"),
      latenessMs = 1000, checkpointDir = ckpt).start()

    // integer-valued doubles: sum order cannot produce fp drift
    val batch1 = Seq(
      ("cpu", 10L, 4d), ("cpu", BucketMs + 5, 7d), ("mem", 20L, 1d))
    val batch2 = Seq(
      ("cpu", 30L, 2d), // re-touches cpu bucket 0 -> upsert, not insert
      ("mem", 2 * BucketMs + 1, 9d))
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("name", "bucket", "n", "value_sum", "min_value",
          "max_value", "min_ts", "max_ts")
        .collect().map(_.mkString("|")).sorted.toSeq

    val expected = StatsAggregate.buildStats(
      (batch1 ++ batch2).toDF("name", "timestamp", "value"), BucketMs)
    val incremental = db.statsTable()
    assert(canon(incremental) == canon(expected))

    // ...and the ScanHint path answers from the fresh table: both cpu
    // buckets are fully covered by [0, 2*bucket-1], no raw-data rows.
    val agg = db.fastAggregate("cpu", 0, 2 * BucketMs - 1).head()
    assert(agg.getLong(0) == 3L) // n
    assert(agg.getDouble(1) == 13d) // sum = 4 + 7 + 2
    assert(agg.getDouble(2) == 2d && agg.getDouble(3) == 7d)
  }
}
