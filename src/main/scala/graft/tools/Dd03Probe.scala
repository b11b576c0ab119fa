package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dedup.Dedup

/** Splits dd03_simhash's wall time into phases — shingle pass,
  * fingerprint kernel, banded-key explode, the banded self-join +
  * hamming filter + survivor distinct — so the C(m, comboWidth)
  * combination constant's actual share is measured before any rework.
  * Prints one JSON line (min of `reps` runs per phase, Dd04Probe
  * methodology).
  *
  * Usage: runMain graft.tools.Dd03Probe <sfDir> [reps]
  */
object Dd03Probe {

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

    // dd03's corpus: documents + a near-copy of every 20th doc
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = d.select(col("doc_id"), col("text")).unionAll(
      d.where(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" graft dup marker")).as("text")))

    def timeMin[A](f: => A): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    val sh = Dedup.shingleBase(corpus, "doc_id", "text", nGram = 3)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tShingle = timeMin(sh.count())

    val fp = sh.select(col("id"),
        graft.functions.ShingleHash.simhash60(col("hs")).as("fp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (nDocs, tFp) = { val t = timeMin(fp.count()); (fp.count(), t) }

    // production end-to-end on top of the cached shingles (the gate's
    // own shape: fingerprints + banding + self-join + distinct)
    val tEndToEnd = timeMin(
      Dedup.simhashPairsFromShingles(sh, maxHamming = 6)
        .write.mode("overwrite").format("noop").save())

    // banded explode volume + its own cost, at the auto comboWidth
    val banded = Dedup.simhashBanded(fp, 6,
      Dedup.autoComboWidth(nDocs, 6))
    val nBand = banded.count()
    val tBand = timeMin(banded.write.mode("overwrite").format("noop").save())

    println(s"""{"sf":"$sfDir","reps":$reps,"n_docs":$nDocs,""" +
      s""""t_shingle":$tShingle,"t_fp":$tFp,""" +
      s""""n_band_rows":$nBand,"t_band_explode":$tBand,""" +
      s""""t_end_to_end_cached_shingles":$tEndToEnd}""")
    spark.stop()
  }
}
