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
  * gets a named owner instead of another "load" note.
  *
  * Methodology: each rep rebuilds the chain COLD (fresh persists,
  * unpersisted between reps), timing the FIRST materialization of each
  * phase — downstream phases read their upstream from cache, so each
  * number isolates one phase's own work. Min across reps (Dd04Probe
  * convention). Prints one JSON line.
  *
  * Usage: runMain graft.tools.Pp01Probe <sfDir> [reps]
  */
object Pp01Probe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
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

    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val phases = Seq("shingle", "quality", "semi_join", "pairs",
      "components", "sample_tokens", "pack")
    val mins = scala.collection.mutable.Map.empty[String, Double]
    var endToEnd = Double.MaxValue

    for (_ <- 1 to reps) {
      val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      def p(df: DataFrame): DataFrame = {
        val c = df.persist(StorageLevel.MEMORY_AND_DISK); persisted += c; c
      }
      val times = scala.collection.mutable.Map.empty[String, Double]

      // Phase 1: the corpus shingle pass (shared with the dd gates in
      // the pack; standalone-paid here like a cold pp01)
      val sh = p(Dedup.shingleBase(corpus, "doc_id", "text", nGram = 3))
      times("shingle") = t(sh.count())

      // Phase 2: quality gate + the semi-join narrowing the shingles to
      // quality survivors (curate's `shingles=Some(...)` path)
      val kept = p(corpus
        .where(TextFunctions.qualityScore(col("text")) >= 0.55)
        .select(col("doc_id"), col("text")))
      times("quality") = t(kept.count())
      val shKept = p(sh.join(kept.select(col("doc_id").as("id")),
        Seq("id"), "left_semi"))
      times("semi_join") = t(shKept.count())

      // Phase 3: the PPJoin pair search over the survivors
      val pairs = p(Dedup.jaccardPairsFromShingles(shKept, 0.5))
      times("pairs") = t(pairs.count())

      // Phase 4: connected components over the pair edges (eager inside)
      val reps2 = Dedup.components(pairs)
        .withColumnRenamed("id", "_cc_id").withColumnRenamed("rep", "_cc_rep")
      times("components") = t(p(reps2).count())

      // Phase 5: keep-one + hash sample + token-count join
      val keepOne = kept
        .join(persisted.last, col("doc_id") === col("_cc_id"), "left")
        .where(col("_cc_rep").isNull || col("_cc_rep") === col("doc_id"))
        .select(col("doc_id"))
      val withTokens = p(Sampling.hashSample(keepOne, col("doc_id"), 0.5)
        .join(corpus.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
          Seq("doc_id")))
      times("sample_tokens") = t(withTokens.count())

      // Phase 6: the packing prefix sum
      times("pack") = t(
        Packing.pack(withTokens, Seq(col("doc_id")), "n_tokens", 2048L)
          .write.mode("overwrite").format("noop").save())

      phases.foreach(ph => mins(ph) =
        math.min(mins.getOrElse(ph, Double.MaxValue), times(ph)))
      persisted.foreach(_.unpersist(blocking = true))
      graft.engine.Caches.release()

      // End-to-end reference: the production curate() path, cold caches
      endToEnd = math.min(endToEnd, t(
        graft.operators.Curation.curate(corpus, "doc_id", "text")
          .write.mode("overwrite").format("noop").save()))
      graft.engine.Caches.release()
    }

    val body = phases.map(ph => s""""t_$ph":${mins(ph)}""").mkString(",")
    println(s"""{"sf":"$sfDir","reps":$reps,$body,""" +
      s""""t_phase_sum":${phases.map(mins).sum},""" +
      s""""t_end_to_end_cold":$endToEnd}""")
    spark.stop()
  }
}
