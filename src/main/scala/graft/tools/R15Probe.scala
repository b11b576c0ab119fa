package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dedup.Dedup

/** Round-15 optimization probe: phase-level timing of the two heaviest
  * shared passes (near_pairs = PPJoin over the planted near corpus,
  * triple_components = PPJoin + label propagation over the triple
  * corpus). Mirrors Pipeline's corpus construction; measures each
  * subplan with the noop sink so the numbers attribute wall time to
  * phases instead of whole passes.
  */
object R15Probe {
  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val rows = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
          if (e.taskMetrics != null && e.taskMetrics.shuffleWriteMetrics != null)
            rows.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
        }
      })
    def t(name: String)(f: => Any): Unit = {
      taskMs.set(0); rows.set(0)
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[probe] $name%-28s $wall%8.3f s  taskSec=${taskMs.get / 1e3}%9.3f shufRows=${rows.get}%12d")
    }

    val d = graft.engine.Graft.widen(
      spark.read.parquet(s"$dir/documents.parquet"))
    val near = d.select(col("doc_id"), col("text")).unionAll(
      d.where(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" graft dup marker")).as("text")))
    val tripleExtra = d.where(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 2000000).as("doc_id"),
        concat(col("text"), lit(" graft dup marker two")).as("text"))

    // near corpus chain, phase by phase
    val sh = Dedup.shingleBase(near, "doc_id", "text", nGram = 3)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("shingles mat")(sh.count())
    val pref = Dedup.jaccardPrefixes(sh, 0.5)
    t("prefixes noop")(noop(pref))
    val prefH = pref.join(sh, "id" :: Nil).persist(StorageLevel.MEMORY_AND_DISK)
    t("prefH mat")(prefH.count())
    val self = prefH.select(col("h"), col("id").as("id_a"), col("sz").as("sz_a"),
        col("p").as("p_a"), col("hs").as("shs_a"))
      .join(prefH.select(col("h"), col("id").as("id_b"), col("sz").as("sz_b"),
        col("p").as("p_b"), col("hs").as("shs_b")), "h" :: Nil)
      .where(col("id_a") < col("id_b"))
      .where(col("sz_a").cast("double") >= col("sz_b") * 0.5 &&
        col("sz_b").cast("double") >= col("sz_a") * 0.5)
      .where(least(col("sz_a") - col("p_a"), col("sz_b") - col("p_b"))
        .cast("double") >= (col("sz_a") + col("sz_b")) * (0.5 / 1.5))
    t("selfjoin+filters noop")(noop(self))
    val verified = self.select(col("id_a"), col("id_b"),
        graft.functions.TextFunctions.jaccardSorted(
          col("shs_a"), col("shs_b")).as("jac"))
      .where(col("jac") >= 0.5).distinct()
    t("verify+distinct noop")(noop(verified))
    t("whole near_pairs again")(noop(Dedup.jaccardPairsFromShingles(sh, 0.5)))

    // triple chain
    val sh3 = sh.unionAll(Dedup.shingleBase(tripleExtra, "doc_id", "text", 3))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("triple shingles mat")(sh3.count())
    var pairs3: DataFrame = null
    t("triple pairs")(
      { pairs3 = Dedup.jaccardPairsFromShingles(sh3, 0.5)
          .persist(StorageLevel.MEMORY_AND_DISK); pairs3.count() })
    t("components")(noop(Dedup.components(pairs3)))
    spark.stop()
  }
}
