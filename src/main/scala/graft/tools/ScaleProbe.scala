package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Counts the CANDIDATE volumes behind the similarity operators at a
  * given SF dir — the numbers whose growth rate decides 100 TB
  * feasibility. Wall-clock at a fixed core count conflates spill, GC
  * and join-strategy transitions; the candidate counts are the
  * machine-independent invariant (SCALING.md's "never corpus²" claims,
  * measured). Prints one JSON line.
  *
  * Usage: runMain graft.tools.ScaleProbe <sfDir>
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    // the same planted near-dup corpus the dd02/dd04/dd07/dd08 gates use
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = d.select(col("doc_id"), col("text")).unionAll(
      d.where(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" graft dup marker")).as("text")))
    val sh = Dedup.shingleBase(corpus, "doc_id", "text", nGram = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val nDocs = sh.count()

    // MinHash/LSH: band-bucket candidate pairs BEFORE the verify join
    val banded = Dedup.bandedKeys(sh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lshCand = banded.select(col("band_idx"), col("band_key"), col("id").as("a"))
      .join(banded.select(col("band_idx"), col("band_key"), col("id").as("b")),
        Seq("band_idx", "band_key"))
      .where(col("a") < col("b")).select("a", "b").distinct().count()

    // PPJoin: prefix-only candidate pairs (the pre-round-5 generator)
    // vs the full prefix+position+size-ratio generator actually used
    val prefLen = (size(col("hs")) -
      ceil(size(col("hs")).cast("double") * 0.5) + 1).cast("int")
    val pref = sh.select(col("id"), explode(slice(col("hs"), lit(1), prefLen)).as("h"))
    val ppPrefixOnly = pref.select(col("h"), col("id").as("a"))
      .join(pref.select(col("h"), col("id").as("b")), "h" :: Nil)
      .where(col("a") < col("b")).select("a", "b").distinct().count()
    val ppCand = Dedup.jaccardCandidates(sh, 0.5).count()

    // verified near-dup pairs (the components edge list)
    val pairs = Dedup.jaccardPairsFromShingles(sh, 0.5).count()

    // embedding dedup: within-cell candidate pairs under the auto-sized
    // IVF blocking (the fixed-k quadratic trap this run guards against)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("vec"))
    val planted = e.unionAll(e.where(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("vec")))
    val k = graft.ann.IvfIndex.autoK(planted.count())
    val m = graft.ann.IvfIndex.fit(planted, "vec_id", "vec", k = k, iters = 1)
    val cells = graft.ann.IvfIndex.transform(planted, "vec", m)
      .groupBy("cell").agg(count(lit(1)).as("n"))
    val ivfCand = cells
      .agg(sum(col("n") * (col("n") - 1) / 2).cast("long")).head().getLong(0)

    println(s"""{"sf":"$sfDir","n_docs":$nDocs,"lsh_cand":$lshCand,""" +
      s""""pp_prefix_only":$ppPrefixOnly,"pp_cand":$ppCand,""" +
      s""""jaccard_pairs":$pairs,""" +
      s""""ivf_k":$k,"ivf_cand":$ivfCand}""")
    spark.stop()
  }
}
