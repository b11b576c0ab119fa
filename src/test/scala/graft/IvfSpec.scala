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

  test("measured recall floor for nProbe in {1, 2, 4} @ k=10 (20 queries)") {
    // a NUMBER, not a vibe: quantizer regressions (bad init, broken
    // multiprobe ordering, distance-sign bugs) show up as a recall drop
    // long before they break the oracle-matched gates
    val m = IvfIndex.fit(emb, "vec_id", "vec", k = 8, iters = 2)
    val assigned = IvfIndex.transform(emb, "vec", m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = (0 until 20).map(i => 25L * i)
    val qVecs = emb.where(col("vec_id").isin(queries: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def recallAt(nProbe: Int): Double = {
      val hits = queries.map { qid =>
        val q = qVecs(qid)
        val exact = Knn.bruteTopK(emb, "vec_id", "vec", q, 10)
          .collect().map(_.getLong(0)).toSet
        val approx = IvfIndex.search(assigned, "vec_id", "vec", m, q,
          nProbe = nProbe, topK = 10).collect().map(_.getLong(0)).toSet
        (exact intersect approx).size / 10.0
      }
      hits.sum / queries.size
    }
    val (r1, r2, r4) = (recallAt(1), recallAt(2), recallAt(4))
    assigned.unpersist()
    info(f"mean recall@10: nProbe=1 $r1%.3f, nProbe=2 $r2%.3f, nProbe=4 $r4%.3f")
    // more probes may never lose candidates (multiprobe is a superset scan)
    assert(r1 <= r2 + 1e-9 && r2 <= r4 + 1e-9,
      s"recall must be monotone in nProbe: $r1, $r2, $r4")
    // floors ~0.05 under the values measured on this fixture (the fit
    // is deterministic, so these are stable: 0.375 / 0.510 / 0.825 —
    // the corpus is near-uniform, the hardest case for a coarse
    // quantizer; planted-cluster corpora sit far higher)
    assert(r1 >= 0.30, s"nProbe=1 recall regressed: $r1")
    assert(r2 >= 0.45, s"nProbe=2 recall regressed: $r2")
    assert(r4 >= 0.75, s"nProbe=4 recall regressed: $r4")
  }

  test("TopKByScore equals the row_number window; batch equals per-query brute") {
    import graft.functions.VectorAggregates.topKByScore
    // ties on score MUST break to the smaller id in both shapes
    val rows = Seq(
      (1, 0.9, 10L), (1, 0.9, 3L), (1, 0.5, 7L), (1, 0.99, 8L),
      (2, 0.1, 1L), (2, 0.1, 2L), (2, 0.1, 3L),
      (3, 0.4, 5L)) // k > group size
    val df = spark.createDataFrame(rows).toDF("g", "s", "id")
    val byAgg = df.select(col("g"),
        struct(col("s").as("score"), col("id").as("id")).as("p"))
      .groupBy("g").agg(topKByScore(col("p"), 2).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("r", "e")))
      .select(col("g"), col("r"), col("e.id"), col("e.score"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("s").desc, col("id"))
    val byWin = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
      .select(col("g"), (col("rn") - 1).as("r"), col("id"), col("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1).toLong.toInt, r.getLong(2), r.getDouble(3))).toSet
    assert(byAgg == byWin)
    // batch KNN equals per-query single-vector brute force
    val queries = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("vec").as("qv"))
    val corpus = emb.where(col("vec_id") >= 3)
    val batch = Knn.bruteTopKBatch(corpus, "vec_id", "vec", queries, "qid", "qv", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val single = (0L until 3L).flatMap { qid =>
      val q = emb.where(col("vec_id") === qid).head().getSeq[Double](1)
      Knn.bruteTopK(corpus, "vec_id", "vec", q, 4).collect()
        .zipWithIndex.map { case (r, i) => (qid, i + 1, r.getLong(0)) }
    }.toSet
    assert(batch == single)
  }

  test("VectorSum typed aggregate equals the posexplode sum shape") {
    import graft.functions.VectorAggregates.vecSum
    val byAgg = emb.withColumn("g", (col("vec_id") % 7).cast("int"))
      .groupBy("g").agg(vecSum(col("vec")).as("s"))
      .collect().map(r => r.getAs[Int]("g") -> r.getSeq[Double](1)).toMap
    val byExplode = emb.withColumn("g", (col("vec_id") % 7).cast("int"))
      .select(col("g"), posexplode(col("vec")).as(Seq("dim", "x")))
      .groupBy("g", "dim").agg(sum("x").as("s"))
      .collect().groupBy(_.getAs[Int]("g"))
      .map { case (g, rows) =>
        g -> rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("s")).toSeq
      }
    assert(byAgg.keySet == byExplode.keySet)
    for (g <- byAgg.keySet; (a, b) <- byAgg(g).zip(byExplode(g)))
      assert(math.abs(a - b) < 1e-9, s"group $g: $a vs $b")
    // null/empty handling: all-null group -> null, mixed group skips nulls
    val df = spark.createDataFrame(java.util.List.of(
        org.apache.spark.sql.Row(1, Seq(1.0, 2.0)),
        org.apache.spark.sql.Row(1, null),
        org.apache.spark.sql.Row(2, null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val out = df.groupBy("g").agg(vecSum(col("v")).as("s"))
      .collect().map(r => r.getAs[Int]("g") -> r.get(1)).toMap
    assert(out(1) == Seq(1.0, 2.0))
    assert(out(2) == null)
  }
}
