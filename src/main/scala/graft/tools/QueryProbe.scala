package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task accounting for the round-15 optimization
  * work: runs named SparkEntry queries twice (cold + warm) through the
  * noop sink and prints wall seconds vs. scheduled-task seconds, job
  * and stage counts — separating fixed overhead (planning, codegen,
  * scheduling) from actual task work.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.flatMap(_.split(',')).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val i = s.stageInfo
        val old = stageInfo.getOrDefault(i.stageId, ("", 0L, 0))
        stageInfo.put(i.stageId,
          (i.name.take(90), old._2, old._3))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) {
          taskMs.addAndGet(t.taskInfo.duration)
          val old = stageInfo.getOrDefault(t.stageId, ("", 0L, 0))
          stageInfo.put(t.stageId,
            (old._1, old._2 + t.taskInfo.duration, old._3 + 1))
        }
      }
    })

    def run(name: String, tag: String): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      stageInfo.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; settle before reading the counters
      Thread.sleep(300)
      println(f"[qprobe] $name%-30s $tag wall=$wall%7.3f taskSec=${taskMs.get / 1e3}%7.3f jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d")
      if (sys.env.contains("QPROBE_STAGES")) {
        import scala.jdk.CollectionConverters._
        stageInfo.asScala.toSeq.sortBy(-_._2._2).take(12).foreach {
          case (id, (nm, ms, n)) =>
            println(f"[qstage]   $id%4d ${ms / 1e3}%7.3f s  n=$n%4d  $nm")
        }
      }
    }
    // QPROBE_RUNS=N runs each gate N times; QPROBE_CLEAR=1 drops the
    // gate's plan-internal persists before every run, so runs 2..N
    // measure the bench contract exactly: JIT-warm, cache-COLD (the
    // default cold+warm pair leaves run 2 reading run 1's caches —
    // fine for fixed-overhead attribution, wrong for A/B of persist
    // shapes).
    val nRuns = sys.env.get("QPROBE_RUNS").flatMap(_.toIntOption).getOrElse(2)
    val clear = sys.env.get("QPROBE_CLEAR").contains("1")
    names.foreach { n =>
      (1 to nRuns).foreach { i =>
        if (clear) graft.queries.Pipeline.clearCaches()
        run(n, if (clear) s"r$i" else if (i == 1) "cold" else "warm")
      }
    }
    spark.stop()
  }
}
