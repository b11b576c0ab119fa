package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.operators.{Packing, Sampling}

/** Splits pp01_curation's wall time into the curate() phases — shingle
  * pass, quality gate + semi-join, PPJoin pair search, connected
  * components, sample+token join, packing prefix sum — so the
  * three-capture upward drift (r5 3.5-3.8s → r6 5.47s → r7 6.57s at 1×)
  * gets a named owner instead of another "load" note. Prints one JSON
  * line (min of `reps` runs per phase, matching Dd04Probe).
  *
  * Usage: runMain graft.tools.Pp01Probe <sfDir> [reps]
  */
object Pp01Probe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    // pp01's corpus: documents + a near-copy of every 20th doc
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = d.select(col("doc_id"), col("text")).unionAll(
      d.where(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" graft dup marker")).as("text")))

    def timeMin[A](f: => A): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    // Phase 1: the corpus shingle pass (shared with the dd gates in the
    // pack, standalone-paid here like a cold pp01)
    val sh = Dedup.shingleBase(corpus, "doc_id", "text", nGram = 3)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tShingle = timeMin(sh.count())

    // Phase 2: quality gate + the semi-join that narrows the shared
    // shingles to quality survivors (curate's `shingles=Some(...)` path)
    val kept = corpus
      .where(TextFunctions.qualityScore(col("text")) >= 0.55)
      .select(col("doc_id"), col("text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tQuality = timeMin(kept.count())
    val shKept = sh.join(kept.select(col("doc_id").as("id")), Seq("id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tSemi = timeMin(shKept.count())

    // Phase 3: the PPJoin pair search over the survivors
    val pairs = Dedup.jaccardPairsFromShingles(shKept, 0.5)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tPairs = timeMin(pairs.count())

    // Phase 4: connected components over the pair edges (eager inside)
    val tComponents = timeMin(Dedup.components(pairs).count())
    val reps2 = Dedup.components(pairs)
      .withColumnRenamed("id", "_cc_id").withColumnRenamed("rep", "_cc_rep")
      .persist(StorageLevel.MEMORY_AND_DISK)
    reps2.count()

    // Phase 5: keep-one + hash sample + token-count join
    val keepOne = kept
      .join(reps2, col("doc_id") === col("_cc_id"), "left")
      .where(col("_cc_rep").isNull || col("_cc_rep") === col("doc_id"))
      .select(col("doc_id"))
    val withTokens = Sampling.hashSample(keepOne, col("doc_id"), 0.5)
      .join(corpus.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
        Seq("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tSample = timeMin(withTokens.count())

    // Phase 6: the packing prefix sum
    val tPack = timeMin(
      Packing.pack(withTokens, Seq(col("doc_id")), "n_tokens", 2048L)
        .write.mode("overwrite").format("noop").save())

    // End-to-end reference: the production curated() path, cold caches
    graft.queries.Pipeline.clearCaches()
    val t0 = System.nanoTime()
    graft.operators.Curation.curate(corpus, "doc_id", "text")
      .write.mode("overwrite").format("noop").save()
    val tEndToEnd = (System.nanoTime() - t0) / 1e9

    println(s"""{"sf":"$sfDir","reps":$reps,"t_shingle":$tShingle,""" +
      s""""t_quality":$tQuality,"t_semi_join":$tSemi,"t_pairs":$tPairs,""" +
      s""""t_components":$tComponents,"t_sample_tokens":$tSample,""" +
      s""""t_pack":$tPack,"t_end_to_end_cold":$tEndToEnd}""")
    spark.stop()
  }
}
