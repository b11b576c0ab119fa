package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.{IvfIndex, Knn}

/** Recall measurement for the IVF quantizer at PRODUCTION cell geometry
  * (`autoK`) — the SCALE_CHECK harness behind the "recall holds at 10x"
  * row. IvfSpec pins recall floors on a tiny fixed-k fixture; this tool
  * re-proves them where autoK actually changes the geometry: k grows
  * with corpus size, so nothing in the spec's k=8 run guarantees the
  * 10x corpus's k≈400 run still recovers neighbors.
  *
  * Usage: runMain graft.tools.AnnRecall <sfDir> [nQueries]
  * Prints one JSON line: corpus size, autoK cell count, mean recall@10
  * for nProbe in {1, 2, 4}.
  */
object AnnRecall {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val k = IvfIndex.autoK(n)
    val m = IvfIndex.fit(emb, "vec_id", "vec", k = k, iters = 2)
    val assigned = IvfIndex.transform(emb, "vec", m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // deterministic hash-spread query sample taken from the DATA (id
    // ranges are generator-dependent — ScaleData offsets replica ids)
    val qVecs = emb.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nQueries)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

    // exact ground truth once per query — it does not depend on nProbe,
    // and the brute scans are the tool's dominant cost
    val sorted = qVecs.toSeq.sortBy(_._1)
    val exactSets = sorted.map { case (qid, q) =>
      qid -> Knn.bruteTopK(emb, "vec_id", "vec", q, 10)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    def recallAt(nProbe: Int): Double = {
      val hits = sorted.map { case (qid, q) =>
        val approx = IvfIndex.search(assigned, "vec_id", "vec", m, q,
          nProbe = nProbe, topK = 10).collect().map(_.getLong(0)).toSet
        (exactSets(qid) intersect approx).size / 10.0
      }
      hits.sum / hits.size
    }
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // sweep absolute probe counts AND the constant-fraction point
    // (k/16 cells ≈ the 1x fixture's nProbe=1 coverage): recall at
    // fixed nProbe falls as autoK grows the cell count, so the knob
    // that transfers across scale is the probed FRACTION, not the count
    val probes = (Seq(1, 2, 4, 8, 16) :+ math.max(1, k / 16))
      .distinct.sorted.filter(_ <= k)
    val rs = probes.map(p => s""""nprobe$p":${f(recallAt(p))}""")

    // PQ / IVF-PQ recall on the TRAINED codebook (the production path —
    // the ann07/ann08 gates pin the oracle-reproducible iters=0 form):
    // m=8 subspaces, k=16 sub-centroids, 2 Lloyd steps per subspace.
    // ADC recall measures how much the 8-byte code loses vs exact L2;
    // IVF-PQ additionally restricts ADC to the probed cells' codes, so
    // its recall is bounded above by BOTH the quantizer's and the
    // coarse cells'.
    val pq = graft.ann.Pq.fit(emb, "vec_id", "vec", m = 8, k = 16, iters = 2)
    val codes = graft.ann.Pq.encode(emb, "vec", pq)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    codes.count()
    val pqHits = sorted.map { case (qid, q) =>
      val approx = graft.ann.Pq.adcTopK(codes, "vec_id", pq, q, 10)
        .collect().map(_.getLong(0)).toSet
      (exactSets(qid) intersect approx).size / 10.0
    }
    val pqRecall = pqHits.sum / pqHits.size
    // the production refinement: 10x-oversampled ADC shortlist, exact
    // cosine re-rank of the shortlist's raw vectors
    val rrHits = sorted.map { case (qid, q) =>
      val approx = graft.ann.Pq
        .adcRerankTopK(codes, emb, "vec_id", "vec", pq, q, 10)
        .collect().map(_.getLong(0)).toSet
      (exactSets(qid) intersect approx).size / 10.0
    }
    val rrRecall = rrHits.sum / rrHits.size
    // IVF-PQ: probe the 4 nearest coarse cells, ADC over their codes
    val codesWithCell = codes.join(assigned.select(
      col("vec_id"), col("cell")), Seq("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    codesWithCell.count()
    def nearestCellIds(q: Seq[Double], nProbe: Int): Seq[Integer] = {
      def d2(c: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < c.length) { val d = c(i) - q(i); s += d * d; i += 1 }
        s
      }
      m.centroids.sortBy { case (c, v) => (d2(v), c) }
        .take(nProbe).map(c => Integer.valueOf(c._1)).toSeq
    }
    val ivfPqHits = sorted.map { case (qid, q) =>
      val cells = nearestCellIds(q, 4)
      val approx = graft.ann.Pq.adcTopK(
        codesWithCell.where(col("cell").isin(cells: _*)), "vec_id", pq, q, 10)
        .collect().map(_.getLong(0)).toSet
      (exactSets(qid) intersect approx).size / 10.0
    }
    val ivfPqRecall = ivfPqHits.sum / ivfPqHits.size

    println(s"""{"sf_dir":"$sfDir","n_vectors":$n,"auto_k":$k,""" +
      s""""recall_at_10":{${rs.mkString(",")}},""" +
      s""""pq_adc_recall_at_10":${f(pqRecall)},""" +
      s""""pq_rerank_recall_at_10":${f(rrRecall)},""" +
      s""""ivf_pq_recall_at_10_nprobe4":${f(ivfPqRecall)},""" +
      s""""n_queries":${qVecs.size}}""")
    spark.stop()
  }
}
