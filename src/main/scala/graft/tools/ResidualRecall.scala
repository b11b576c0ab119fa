package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.{IvfIndex, Knn, Pq}

/** Raw vs residual IVF-PQ recall at the SAME code budget — the
  * measurement behind the ann11 design claim (Jégou 2011 §III: encoding
  * residuals spends the codes' resolution on a smaller ball, so recall
  * rises with no extra bytes). Both variants share one coarse quantizer
  * (autoK cells, 2 Lloyd steps), one probe budget, and one PQ geometry;
  * only the encoded signal differs (vec vs vec − centroid(cell)).
  *
  * Usage: runMain graft.tools.ResidualRecall <sfDir> [nQueries] [nProbe]
  * Prints one JSON line with corpus size and mean recall@10 for both.
  */
object ResidualRecall {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(20)
    val nProbe = args.lift(2).map(_.toInt).getOrElse(4)
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
    val coarse = IvfIndex.fit(emb, "vec_id", "vec",
      k = IvfIndex.autoK(n), iters = 2)
    val assigned = IvfIndex.transform(emb, "vec", coarse)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val m = 8
    val k = 16
    val pqRaw = Pq.fit(emb, "vec_id", "vec", m = m, k = k, iters = 2)
    val codesRaw = Pq.encode(assigned, "vec", pqRaw)
      .select(col("vec_id"), col("cell"), col("codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pqRes = Pq.fitResidual(assigned, "vec_id", "vec", "cell", coarse,
      m = m, k = k, iters = 2)
    val codesRes = Pq.encodeResidual(assigned, "vec_id", "vec", "cell",
      coarse, pqRes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // hash-spread queries from the data (id ranges are
    // generator-dependent), exact ground truth once per query
    val qVecs = emb.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nQueries)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
      .sortBy(_._1)
    def probesFor(q: Seq[Double]): Seq[Int] = {
      def d2(c: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < c.length) { val d = c(i) - q(i); s += d * d; i += 1 }
        s
      }
      coarse.centroids.sortBy { case (c, v) => (d2(v), c) }
        .take(nProbe).map(_._1).toSeq
    }
    var rawHits = 0.0
    var resHits = 0.0
    qVecs.foreach { case (qid, q) =>
      val exact = Knn.bruteTopK(emb, "vec_id", "vec", q, 10)
        .collect().map(_.getLong(0)).toSet
      val probes = probesFor(q)
      val raw = Pq.adcTopK(
          codesRaw.where(col("cell").isin(probes.map(Integer.valueOf): _*))
            .select(col("vec_id"), col("codes")),
          "vec_id", pqRaw, q, 10)
        .collect().map(_.getLong(0)).toSet
      val res = Pq.ivfAdcResidualTopK(codesRes, "vec_id", coarse, pqRes,
          q, probes, 10)
        .collect().map(_.getLong(0)).toSet
      rawHits += (exact intersect raw).size / 10.0
      resHits += (exact intersect res).size / 10.0
    }
    println(s"""{"n":$n,"cells":${coarse.k},"nProbe":$nProbe,""" +
      s""""m":$m,"k":$k,"queries":${qVecs.size},""" +
      s""""recall_raw":${rawHits / qVecs.size},""" +
      s""""recall_residual":${resHits / qVecs.size}}""")
    spark.stop()
  }
}
