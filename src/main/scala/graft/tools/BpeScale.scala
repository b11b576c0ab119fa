package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the [[graft.operators.BpeTrain]] scale claim: the corpus
  * pass (wordCounts) grows with the data, but the merge loop runs on
  * the word-TYPE table, which grows sublinearly (Heaps' law) — so
  * per-round cost must be nearly flat across corpus scales. Prints one
  * JSON line. Usage: runMain graft.tools.BpeScale <sfDir> [nMerges]
  */
object BpeScale {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val t0 = System.nanoTime()
    val wc = graft.operators.BpeTrain.wordCounts(docs, "toks")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTypes = wc.count() // materializes the corpus pass
    val countS = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val merges = graft.operators.BpeTrain.fit(wc, nMerges)
    val fitS = (System.nanoTime() - t1) / 1e9
    wc.unpersist(blocking = false)

    println(s"""{"sf_dir":"$sfDir","n_word_types":$nTypes,""" +
      s""""count_s":${"%.2f".formatLocal(java.util.Locale.ROOT, countS)},""" +
      s""""n_merges":${merges.size},""" +
      s""""fit_s":${"%.2f".formatLocal(java.util.Locale.ROOT, fitS)},""" +
      s""""top_merge":"${merges.head.a}${merges.head.b}"}""")
    spark.stop()
  }
}
