package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.NearDupIndex

/** Measures the [[NearDupIndex]] incremental claim: build cost grows
  * with the corpus, but probing a FIXED-size delta must not — the probe
  * re-shingles only the delta and scans (never shuffles, never
  * re-hashes) the stored index. Prints one JSON line.
  *
  * The delta is the same 500 documents at every SF (doc_id < 500, ids
  * offset, a marker appended so they near-dup their originals instead
  * of exact-matching), so probe-side work is constant by construction
  * and any probe-time growth is pure index-scan cost.
  *
  * Usage: runMain graft.tools.IndexScale <sfDir>
  */
object IndexScale {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nProbe = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val delta = docs.where(col("doc_id") < 500)
      .select((col("doc_id") + 5000000).as("doc_id"),
        concat(col("text"), lit(" graft probe marker")).as("text"))
    val nCorpus = docs.count()

    val path = java.nio.file.Files.createTempDirectory("graft_idxscale").toString
    val t0 = System.nanoTime()
    NearDupIndex.build(docs, "doc_id", "text", path)
    val buildS = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    NearDupIndex.probePairs(delta, "doc_id", "text", path, threshold = 0.5)
      .write.mode("overwrite").format("noop").save()
    val probeS = (System.nanoTime() - t1) / 1e9
    graft.engine.Caches.release()

    // untimed, for the record: every delta doc should find its original
    val nPairs = NearDupIndex
      .probePairs(delta, "doc_id", "text", path, threshold = 0.5).count()
    graft.engine.Caches.release()

    // Same protocol for the embedding index: fixed 200-vector delta of
    // exact copies; probe time growth is pure stored-vectors-scan cost.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val eDelta = emb.where(col("vec_id") < 200)
      .select((col("vec_id") + 5000000).as("vec_id"), col("embedding"))
    val nEmb = emb.count()

    val ePath = java.nio.file.Files.createTempDirectory("graft_eidxscale").toString
    val t2 = System.nanoTime()
    graft.ann.EmbedIndex.build(emb, "vec_id", "embedding", ePath)
    val eBuildS = (System.nanoTime() - t2) / 1e9

    val t3 = System.nanoTime()
    graft.ann.EmbedIndex.probePairs(eDelta, "vec_id", "embedding", ePath,
        nProbe = nProbe)
      .write.mode("overwrite").format("noop").save()
    val eProbeS = (System.nanoTime() - t3) / 1e9
    val ePairs = graft.ann.EmbedIndex
      .probePairs(eDelta, "vec_id", "embedding", ePath, nProbe = nProbe)
      .count()

    println(s"""{"sf_dir":"$sfDir","n_corpus":$nCorpus,""" +
      s""""build_s":${"%.2f".formatLocal(java.util.Locale.ROOT, buildS)},""" +
      s""""probe_s":${"%.2f".formatLocal(java.util.Locale.ROOT, probeS)},""" +
      s""""n_pairs":$nPairs,""" +
      s""""n_emb":$nEmb,""" +
      s""""e_build_s":${"%.2f".formatLocal(java.util.Locale.ROOT, eBuildS)},""" +
      s""""e_probe_s":${"%.2f".formatLocal(java.util.Locale.ROOT, eProbeS)},""" +
      s""""e_pairs":$ePairs}""")
    spark.stop()
  }
}
