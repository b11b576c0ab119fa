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

  test("continuous recording rule: sealed windows append to the derived stream") {
    val root = Files.createTempDirectory("graft_rec_stream").toString
    val ckpt = Files.createTempDirectory("graft_rec_ckpt").toString
    val db = new GraftDb(spark, root)
    db.createStream("m", VType.F64)

    val q = graft.streaming.Recording.rule(db, "m", "m_20ms_sum",
      windowMs = 20L, latenessMs = 5L, checkpointDir = ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    // AvailableNow drains the current backlog then STOPS — so each
    // "round" of the continuous rule is one start/awaitTermination
    // (the checkpoint carries watermark + source position between
    // rounds, exactly the restart story a long-running rule needs)
    def round(): Unit = {
      val run = graft.streaming.Recording.rule(db, "m", "m_20ms_sum",
        windowMs = 20L, latenessMs = 5L, checkpointDir = ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      run.awaitTermination()
    }
    q.awaitTermination()

    val ins = db.inserter("m")
    Seq(5L -> 1d, 15L -> 2d, 25L -> 4d).foreach { case (t, v) => ins.insert(t, v) }
    ins.flush()
    round() // every window stays OPEN until the watermark passes
    ins.insert(60L, 8d) // advances event time past 20 + lateness
    ins.flush()
    round()
    val derived = db.query("m_20ms_sum", 0L, 1000L).output
      .orderBy("timestamp").collect().map(r => (r.getLong(0), r.getDouble(1)))
    // the 60ms event advances the watermark to 55: [0,20) seals with
    // 1+2 (stamped at the window END, 20) and [20,40) with 4; the 60ms
    // sample itself lands in [60,80), which stays OPEN until a later
    // event passes its end + lateness
    assert(derived.toSeq == Seq(20L -> 3d, 40L -> 4d), derived.toSeq)
    // the source stream is untouched; the derived stream composes
    assert(db.query("sum(m_20ms_sum)", 0L, 1000L).output
      .collect().map(_.getDouble(0)).toSeq == Seq(7d))
  }

  test("recording applyBatch is idempotent: a replayed (even partial) batch appends nothing new") {
    val root = Files.createTempDirectory("graft_rec_idem").toString
    val db = new GraftDb(spark, root)
    db.createStream("d", VType.F64)
    val batch = Seq((20L, 3d), (40L, 4d)).toDF("timestamp", "value")
    graft.streaming.Recording.applyBatch(db, "d", batch)
    // full replay (crash after append, before checkpoint commit)
    graft.streaming.Recording.applyBatch(db, "d", batch)
    // PARTIAL prior attempt: only one of the batch's windows landed —
    // the per-timestamp anti-join completes it without duplicating
    graft.streaming.Recording.applyBatch(db, "d",
      Seq((40L, 4d), (60L, 9d)).toDF("timestamp", "value"))
    val rows = db.query("d", 0L, 1000L).output.orderBy("timestamp")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq(20L -> 3d, 40L -> 4d, 60L -> 9d), rows)
    // empty batch: no-op, no error
    graft.streaming.Recording.applyBatch(db, "d",
      spark.emptyDataset[(Long, Double)].toDF("timestamp", "value"))
    assert(db.query("count(d)", 0L, 1000L).output
      .collect().head.getLong(0) == 3L)
    // a same-name SIBLING makes the bare target selector AMBIGUOUS:
    // the rule fails LOUDLY on the idempotency read (the same
    // exactly-1 contract importFrame enforces on the write) — never a
    // pooled read that silently anti-joins the rule's own windows away
    // against a sibling's samples
    db.createStream("""d{src="other"}""", VType.F64)
    db.importFrame("""d{src="other"}""",
      Seq((80L, 99d)).toDF("timestamp", "value"))
    val amb = intercept[IllegalArgumentException](
      graft.streaming.Recording.applyBatch(db, "d",
        Seq((80L, 7d)).toDF("timestamp", "value")))
    assert(amb.getMessage.contains("exactly 1"), amb.getMessage)
  }

  test("grouped continuous rule: per-group sealed windows append as labeled series") {
    val root = Files.createTempDirectory("graft_rec_grp").toString
    val ckpt = Files.createTempDirectory("graft_rec_grp_ckpt").toString
    val db = new GraftDb(spark, root)
    db.createStream("m{svc=\"a\"}", VType.F64)
    db.createStream("m{svc=\"b\"}", VType.F64)
    def round(): Unit = {
      val run = graft.streaming.Recording.groupedRule(db, "m", "m_sum_g",
        Seq("svc"), windowMs = 20L, latenessMs = 5L, checkpointDir = ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      run.awaitTermination()
    }
    val a = db.inserter("m{svc=\"a\"}")
    Seq(5L -> 1d, 15L -> 2d, 25L -> 4d).foreach { case (t, v) => a.insert(t, v) }
    a.flush()
    val b = db.inserter("m{svc=\"b\"}")
    b.insert(15L, 10d)
    b.flush()
    round() // everything still open
    a.insert(60L, 8d) // watermark → 55 seals [0,20) and [20,40) for ALL groups
    a.flush()
    round()
    def series(sel: String) = db.query(sel, 0L, 1000L).output
      .orderBy("timestamp").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(series("m_sum_g{svc=\"a\"}") == Seq(20L -> 3d, 40L -> 4d),
      series("m_sum_g{svc=\"a\"}"))
    assert(series("m_sum_g{svc=\"b\"}") == Seq(20L -> 10d),
      series("m_sum_g{svc=\"b\"}"))
    // the derived family composes under grouping
    val roll = db.query("sum by (svc) (m_sum_g)", 0L, 1000L).output
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(roll == Set("a" -> 7d, "b" -> 10d), roll)
    // idempotent grouped apply: a replayed batch (even with one NEW
    // group mixed in) appends only the missing (group, window) rows
    import spark.implicits._
    graft.streaming.Recording.applyGroupedBatch(db, "m_sum_g", Seq("svc"),
      Seq(("a", 20L, 3d), ("c", 20L, 5d)).toDF("svc", "timestamp", "value"))
    assert(series("m_sum_g{svc=\"a\"}") == Seq(20L -> 3d, 40L -> 4d))
    assert(series("m_sum_g{svc=\"c\"}") == Seq(20L -> 5d))
    assert(db.streams().exists(d =>
      d.name == "m_sum_g" && d.labels == Map("svc" -> "c")))
  }

  test("continuous recording survives a kill between append and checkpoint commit without duplicates") {
    val root = Files.createTempDirectory("graft_rec_replay").toString
    val ckpt = Files.createTempDirectory("graft_rec_replay_ckpt").toString
    val db = new GraftDb(spark, root)
    db.createStream("m", VType.F64)
    def round(): Unit = {
      val run = graft.streaming.Recording.rule(db, "m", "m_sum",
        windowMs = 20L, latenessMs = 5L, checkpointDir = ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      run.awaitTermination()
    }
    val ins = db.inserter("m")
    Seq(5L -> 1d, 15L -> 2d, 25L -> 4d).foreach { case (t, v) => ins.insert(t, v) }
    ins.flush()
    round()
    // snapshot the checkpoint BEFORE the sealing round: restoring it
    // after the round is exactly a crash whose appends landed but whose
    // checkpoint progress was lost — restart re-runs the sealing batch
    // and re-emits the SAME windows into foreachBatch
    def copyDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      val it = java.nio.file.Files.walk(src).iterator()
      while (it.hasNext) {
        val p = it.next()
        val t = dst.resolve(src.relativize(p).toString)
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    def deleteDir(d: java.nio.file.Path): Unit = {
      val it = java.nio.file.Files.walk(d).sorted(
        java.util.Comparator.reverseOrder()).iterator()
      while (it.hasNext) java.nio.file.Files.delete(it.next())
    }
    val backup = Files.createTempDirectory("graft_rec_replay_bak")
    copyDir(java.nio.file.Paths.get(ckpt), backup)
    ins.insert(60L, 8d) // watermark → 55: seals [0,20) and [20,40)
    ins.flush()
    round()
    val firstPass = db.query("m_sum", 0L, 1000L).output.orderBy("timestamp")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(firstPass == Seq(20L -> 3d, 40L -> 4d), firstPass)
    // the crash: roll the checkpoint back, keep the store (the append
    // already landed), restart
    deleteDir(java.nio.file.Paths.get(ckpt))
    copyDir(backup, java.nio.file.Paths.get(ckpt))
    round() // the replay — before idempotent applyBatch this duplicated
    val after = db.query("m_sum", 0L, 1000L).output.orderBy("timestamp")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == firstPass, s"replay duplicated samples: $after")
  }
}
