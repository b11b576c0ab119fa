package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.{IvfIndex, Knn}
import graft.tsdb.TsdbFixtures.spark

class IvfSpec extends AnyFunSuite {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))

  test("ivf: every vector lands in its nearest centroid cell") {
    val m = IvfIndex.fit(emb, "vec_id", "vec", k = 8, iters = 2)
    val assigned = IvfIndex.transform(emb, "vec", m)
    val rows = assigned.collect()
    assert(rows.length == 500)
    rows.take(50).foreach { r =>
      val v = r.getSeq[Double](r.fieldIndex("vec")).toArray
      val cell = r.getAs[Int]("cell")
      def d2(c: Array[Double]) =
        c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum
      val best = m.centroids.minBy { case (c, cv) => (d2(cv), c) }._1
      assert(cell == best, s"vec ${r.get(0)}")
    }
  }

  test("ivf model save/load round-trips exactly") {
    val m = IvfIndex.fit(emb, "vec_id", "vec", k = 8, iters = 1)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf").toString + "/model"
    IvfIndex.save(spark, m, path)
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.k == m.k)
    m.centroids.zip(loaded.centroids).foreach { case ((c1, v1), (c2, v2)) =>
      assert(c1 == c2 && v1.sameElements(v2))
    }
  }

  test("ivf search recall vs brute force") {
    val m = IvfIndex.fit(emb, "vec_id", "vec", k = 8, iters = 2)
    val assigned = IvfIndex.transform(emb, "vec", m)
    val q = emb.where(col("vec_id") === 7).select(col("vec")).head().getSeq[Double](0)
    val exact = Knn.bruteTopK(emb, "vec_id", "vec", q, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = IvfIndex.search(assigned, "vec_id", "vec", m, q, nProbe = 4, topK = 10)
      .collect().map(_.getLong(0)).toSet
    // half the cells probed → expect decent overlap with exact top-10
    assert((exact intersect approx).size >= 5,
      s"recall too low: ${(exact intersect approx).size}/10")
  }
}
