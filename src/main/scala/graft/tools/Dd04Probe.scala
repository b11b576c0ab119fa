package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Splits dd04's wall time into its two phases — candidate generation
  * (prefix explode + position/size filters + distinct) vs the verify
  * join (arrays back onto pair rows + exact intersect) — so the
  * optimization target is measured, not guessed. Prints one JSON line
  * and the verify plan.
  *
  * Usage: runMain graft.tools.Dd04Probe <sfDir>
  */
object Dd04Probe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1x30")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = d.select(col("doc_id"), col("text")).unionAll(
      d.where(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" graft dup marker")).as("text")))
    val sh = Dedup.shingleBase(corpus, "doc_id", "text", nGram = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (nDocs, tShingle) = time(sh.count())
    // sub-phase: the prefix table alone (explode + df aggregate + df
    // join + per-id window rank + prefix filter)
    val pref = Dedup.jaccardPrefixes(sh, 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (nPref, tPref) = time(pref.count())
    // sub-phase: the prefix self-join + position/size filters + distinct,
    // on top of the now-materialized prefix table
    val cand = Dedup.jaccardCandidatesFromPrefixes(pref, 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (nCand, tCand) = time(cand.count())
    // old-shape verify, over the MATERIALIZED candidate table: times
    // only the arrays-onto-pairs joins + intersect
    val verified = Dedup.jaccardVerify(cand, sh, 0.5)
    val (nPairs, tVerifyOld) = time(verified.count())
    // the production path: inline PPJoin verify (arrays on prefix rows,
    // single self-join, distinct over survivors only) — end to end on
    // top of the cached shingle table
    val inline = Dedup.jaccardPairsFromShingles(sh, 0.5)
    val (nPairsInline, tInline) = time(inline.count())
    if (sys.env.contains("GRAFT_PROBE_EXPLAIN")) inline.explain("formatted")

    println(s"""{"sf":"$sfDir","n_docs":$nDocs,"t_shingle":$tShingle,""" +
      s""""n_pref":$nPref,"t_pref":$tPref,""" +
      s""""n_cand":$nCand,"t_cand":$tCand,""" +
      s""""n_pairs":$nPairs,"t_verify_old":$tVerifyOld,""" +
      s""""n_pairs_inline":$nPairsInline,"t_inline_end_to_end":$tInline}""")
    spark.stop()
  }
}
