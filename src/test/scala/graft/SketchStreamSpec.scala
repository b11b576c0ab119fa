package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize
import graft.tsdb.TsdbFixtures.spark

class SketchStreamSpec extends AnyFunSuite {

  test("stateful streaming sessionization closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessions(mem.toDS(), gapMs = 1000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two sessions separated by a 5s gap; user 2: one session
      mem.addData(
        Sessionize.Event(1L, 100L, 1d), Sessionize.Event(1L, 600L, 1d),
        Sessionize.Event(2L, 100L, 1d))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(1L, 6000L, 1d))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[Sessionize.Session].collect()
      // the first session of user 1 must be closed by the gap event
      assert(closed.exists(s => s.user_id == 1L && s.start == 100L &&
        s.end == 600L && s.n_events == 2L))
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[(Long, Long, Double)]
    val rmem = MemoryStream[(Long, Long, Double)]
    val joined = graft.streaming.Ingest.intervalJoin(
      lmem.toDF().toDF("key", "timestamp", "value"),
      rmem.toDF().toDF("key", "timestamp", "value"),
      windowMs = 1000, latenessMs = 100)
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      lmem.addData((1L, 1000L, 1.0), (2L, 1000L, 2.0))
      rmem.addData((1L, 1500L, 10.0), (1L, 3000L, 99.0), (2L, 900L, 5.0))
      q.processAllAvailable()
      val rows = spark.table("ssjoin").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // key 1: right@1500 within [1000, 2000] ✓; right@3000 outside;
      // key 2: right@900 before the left event — excluded.
      assert(rows == Set((1L, 1000L, 1500L)))
    } finally q.stop()
  }

  test("approximate sketches land within error bounds of exact") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (i.toLong, (i % 1000).toLong)).toDF("id", "k")
    val row = graft.functions.Sketches.profile(df, "k").head()
    val approxD = row.getAs[Long]("approx_distinct")
    assert(math.abs(approxD - 1000) < 1000 * 0.15, s"approx=$approxD")
    val quarts = row.getSeq[Long](row.fieldIndex("quartiles"))
    assert(math.abs(quarts(1) - 500) < 25) // median of 0..999
    assert(row.getAs[Long]("n") == 10000L)
  }
}
