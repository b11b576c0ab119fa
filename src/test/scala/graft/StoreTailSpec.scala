package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.tsdb.{GraftDb, VType}
import graft.tsdb.TsdbFixtures.spark

/** GraftDb.tailStream: the store as a live Structured Stream — each
  * flush delta arrives as a micro-batch through Spark's FileStreamSource
  * over the partitioned layout (new-file discovery + checkpointing are
  * the file stream's own).
  */
class StoreTailSpec extends AnyFunSuite {
  import spark.implicits._

  test("new flushes arrive as micro-batches with the table schema") {
    val root = Files.createTempDirectory("graft_tail").toString
    val ckpt = Files.createTempDirectory("graft_tail_ckpt").toString
    val db = new GraftDb(spark, root)
    db.createStream("cpu{host=\"a\"}", VType.F64)
    db.createStream("reqs", VType.U64)

    // one flush BEFORE the tail starts: the first batch picks up the
    // existing backlog
    val cpu = db.inserter("cpu")
    cpu.insert(1000L, 1.5)
    cpu.flush()

    val q = db.tailStream()
      .writeStream.format("memory").queryName("graft_tail")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val first = spark.table("graft_tail")
        .select("name", "timestamp", "value").as[(String, Long, Double)]
        .collect().toSet
      assert(first == Set(("cpu", 1000L, 1.5)))

      // two more flushes while the tail runs: a new bucket dir for cpu
      // and a first-ever dir for the second stream — both must be
      // discovered (new partition dirs, not just new files)
      cpu.insert(2 * 3600 * 1000L + 5L, 2.5)
      cpu.flush()
      val reqs = db.inserter("reqs")
      reqs.insert(500L, (1L << 60) + 7L)
      reqs.flush()
      q.processAllAvailable()

      val rows = spark.table("graft_tail")
        .select("name", "timestamp", "value", "lvalue")
        .collect()
      assert(rows.length == 3)
      assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("cpu", 1000L), ("cpu", 2 * 3600 * 1000L + 5L), ("reqs", 500L)))
      // the lvalue sidecar and labels survive the streaming read
      val rq = rows.find(_.getString(0) == "reqs").get
      assert(rq.getLong(3) == (1L << 60) + 7L)
      val labels = db.tailStream() // schema check on a fresh reader
      assert(labels.schema.fieldNames.toSeq ==
        Seq("name", "labels", "timestamp", "value", "lvalue"))
    } finally q.stop()
  }
}
