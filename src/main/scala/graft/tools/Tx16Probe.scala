package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase-level timing of the tx16 bigram-perplexity chain. */
object Tx16Probe {
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
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[tx16probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val d0 = graft.engine.Graft.widen(
      spark.read.parquet(s"$dir/documents.parquet"))
    val d = d0
      .where(graft.functions.TextKernels.tokenCount(col("text")) >= 2)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    t("tokenize noop")(noop(d))
    t("tokenize noop 2")(noop(d))
    val len = greatest(size(col("toks")) - 1, lit(0))
    val pairs = d.select(col("doc_id") +: Seq(explode(arrays_zip(
      slice(col("toks"), lit(1), len).as("w1"),
      slice(col("toks"), lit(2), len).as("w2"))).as("bg")): _*)
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    t("pairs explode noop")(noop(pairs))
    t("pairs explode noop 2")(noop(pairs))
    val pairsP = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    t("pairs persist mat")(pairsP.count())
    val bg = pairsP.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    t("bg agg noop")(noop(bg))
    val ctx = bg.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
    t("ctx agg noop")(noop(ctx))
    t("v distinct count")(
      println(d.select(explode(col("toks")).as("w")).distinct().count()))
    val lp = log((coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) /
      (coalesce(col("c1"), lit(0L)).cast("double") + lit(31.0)))
    val scored = pairsP
      .join(bg, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .select(col("doc_id"), lp.as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("lp")).as("mean_lp"),
        exp(-avg(col("lp"))).as("ppl"))
    t("score join noop")(noop(scored))
    t("score join noop 2")(noop(scored))
    t("score + orderBy noop")(noop(scored.orderBy("doc_id")))
    spark.stop()
  }
}
