package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the standard memory compression for
  * billion-scale ANN: split each D-dim vector into `m` subspaces of
  * D/m dims, quantize every sub-vector to the nearest of `k` per-subspace
  * centroids, and keep only the m small codes (m bytes at k ≤ 256 —
  * a 64-dim float vector compresses 32×). Search never decodes:
  * asymmetric distance computation (ADC) builds one m×k table of
  * query-to-centroid sub-distances driver-side and approximates
  * ||q - v||² as the sum of m table lookups.
  *
  * Spark shape, end to end:
  *  - `fit` = m independent per-subspace k-means, each reusing
  *    [[IvfIndex.fit]] on a sliced column (deterministic first-k init +
  *    Lloyd steps; only the m·k·(D/m) = k·D doubles of the codebook ever
  *    reach the driver).
  *  - `encode` is ROW-LOCAL: m compiled nearest-centroid kernels
  *    ([[graft.functions.VectorExpressions.ivfNearest]] — the same
  *    codegen loop IVF assignment uses, per subspace over a slice), no
  *    join, no shuffle. Ties break to the smaller code, like IVF cells.
  *  - `adcTopK` is ROW-LOCAL + TakeOrderedAndProject: the distance
  *    table rides in as m literal arrays, the lookup sum is m
  *    `element_at` + adds (plain codegen — deliberately NOT an
  *    `aggregate()` HOF, which evaluates interpreted per element; the
  *    round-9 kernel lesson), and the top-k is orderBy+limit's
  *    bounded-memory heap.
  *
  * At 100 TB: the codes table (id, m small ints) is what sits in fast
  * storage; ADC scans it without touching the raw vectors, and composes
  * with IVF blocking (encode the IVF-assigned frame, filter cells, ADC
  * only the probed cells' codes).
  */
object Pq {

  /** Codebook: `centroids(s)(j)` = centroid j of subspace s (ids are
    * dense 0..k-1 per subspace, ascending — the IvfIndex convention).
    */
  final case class Model(subDim: Int, centroids: Array[Array[Array[Double]]]) {
    def m: Int = centroids.length
    def k: Int = centroids(0).length
    require(centroids.forall(_.length == k), "ragged codebook")
  }

  private def sliceCol(vecCol: String, s: Int, subDim: Int): Column =
    slice(col(vecCol), s * subDim + 1, subDim)

  /** Per-subspace deterministic k-means (first-k init, `iters` Lloyd
    * steps — iters = 0 keeps the raw init, the oracle-reproducible
    * configuration the ann07 gate runs). Input vectors must be
    * array<double> with a constant dimension divisible by `m`.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
      iters: Int = 3): Model = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val subModels = (0 until m).map { s =>
      IvfIndex.fit(
        df.select(col(idCol).as("id"),
          sliceCol(vecCol, s, subDim).as("sub")),
        "id", "sub", k, iters)
    }
    Model(subDim,
      subModels.map(_.centroids.sortBy(_._1).map(_._2)).toArray)
  }

  /** Append the m-code array (`codes`, array<int>): per subspace, the
    * nearest sub-centroid by L2, ties to the smaller code — one compiled
    * kernel per subspace, all row-local.
    */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val codeCols = (0 until model.m).map { s =>
      graft.functions.VectorExpressions.ivfNearest(
        sliceCol(vecCol, s, model.subDim),
        model.centroids(s).zipWithIndex.map { case (c, j) => (j, c.toSeq) }.toSeq,
        1)
    }
    df.withColumn("codes", array(codeCols: _*))
  }

  /** Persist the codebook as a tiny parquet table (m·k rows of subDim
    * doubles) so the per-subspace fits are paid ONCE and reused across
    * sessions — the same contract as [[IvfIndex.save]]; at 100 TB the
    * fit is m corpus passes, the model is k·D doubles.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    import spark.implicits._
    (for {
      s <- 0 until model.m
      j <- 0 until model.k
    } yield (s, j, model.centroids(s)(j).toSeq))
      .toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .select(col("subspace"), col("code"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val cents = Array.ofDim[Array[Double]](m, k)
    rows.foreach { case (s, j, c) => cents(s)(j) = c }
    require(cents.forall(_.forall(_ != null)), s"codebook at $path is incomplete")
    Model(cents(0)(0).length, cents)
  }

  /** The m×k asymmetric distance table for `query`: table(s)(j) =
    * ||query_s - centroid_{s,j}||² (exact sub-distances; the
    * approximation is only in v's quantization).
    */
  private[graft] def distTable(query: Seq[Double], model: Model): Array[Array[Double]] =
    Array.tabulate(model.m) { s =>
      Array.tabulate(model.k) { j =>
        var d2 = 0.0
        var i = 0
        while (i < model.subDim) {
          val d = query(s * model.subDim + i) - model.centroids(s)(j)(i)
          d2 += d * d; i += 1
        }
        d2
      }
    }

  /** Approximate top-k by ADC over an encoded frame: `adist` =
    * Σ_s table(s)(codes(s)), ascending (it approximates squared L2).
    * Deterministic ties to the smaller id. Row-local lookups + the
    * orderBy/limit heap; nothing shuffles but k rows per partition.
    */
  def adcTopK(codes: DataFrame, idCol: String, model: Model,
      query: Seq[Double], topK: Int): DataFrame = {
    val table = distTable(query, model)
    val adist = (0 until model.m).map { s =>
      // element_at is 1-based; codes are 0-based
      element_at(typedLit(table(s).toSeq),
        element_at(col("codes"), s + 1) + 1)
    }.reduce(_ + _)
    codes
      .withColumn("adist", adist)
      .orderBy(col("adist").asc, col(idCol).asc)
      .limit(topK)
      .select(col(idCol), col("adist"))
  }

  /** ADC top-k for a BATCH of queries — [[Knn.bruteTopKBatch]]'s shape
    * over the compressed codes table (retrieval eval / hard-negative
    * mining without touching raw vectors): each query contributes one
    * adist column of m `element_at` lookups over its driver-built
    * literal distance table (whole-stage codegen; the batch is an eval
    * batch by contract, so Q·m·k literals are plan-sized, not
    * data-sized). One codes scan computes every query's distance
    * row-locally (bounded Q× explode), then the bounded-heap
    * `TopKByScore` reduces each partition to ≤k pairs per query BEFORE
    * the exchange — the shuffle carries Q × partitions × k rows, never
    * the n × Q distance matrix. Ties to the smaller id (scores negated
    * into the heap, so equal adists keep the aggregate's id-ascending
    * rule). Returns (qid, rank, id, adist) sorted by (qid, rank).
    */
  def adcTopKBatch(codes: DataFrame, idCol: String, model: Model,
      queries: Seq[(Long, Seq[Double])], topK: Int): DataFrame = {
    require(queries.nonEmpty, "adcTopKBatch needs at least one query")
    val pairs = queries.map { case (qid, q) =>
      val table = distTable(q, model)
      val adist = (0 until model.m).map { s =>
        element_at(typedLit(table(s).toSeq),
          element_at(col("codes"), s + 1) + 1)
      }.reduce(_ + _)
      struct(lit(qid).as("qid"), adist.as("adist"))
    }
    codes.select(col(idCol), explode(array(pairs: _*)).as("_q"))
      .select(col("_q.qid").as("qid"),
        struct((-col("_q.adist")).as("score"),
          col(idCol).cast("long").as("id")).as("_p"))
      .groupBy("qid")
      .agg(graft.functions.VectorAggregates.topKByScore(col("_p"), topK)
        .as("_top"))
      .select(col("qid"), posexplode(col("_top")).as(Seq("_r", "_e")))
      .select(col("qid"), (col("_r") + 1).cast("int").as("rank"),
        col("_e.id").as(idCol), (-col("_e.score")).as("adist"))
  }

  /** Residual column `vec − centroid(cell)` for an IVF-assigned frame —
    * the IVFADC encoding input (Jégou et al. 2011 §III): PQ quantizes
    * what the coarse quantizer MISSES, so the same code budget spends
    * its resolution on a much smaller residual ball. Row-local: the
    * coarse centroid matrix rides in as one literal array indexed by
    * the cell id. The per-element zip_with fold is fine here — this is
    * the once-per-corpus encode path, not the per-query ADC loop.
    */
  def residualCol(vecCol: String, cellCol: String,
      coarse: IvfIndex.Model): Column = {
    val cents = typedLit(
      coarse.centroids.sortBy(_._1).map(_._2.toSeq).toSeq)
    zip_with(col(vecCol), element_at(cents, col(cellCol) + 1),
      (x, c) => x - c)
  }

  /** Fit the PQ codebook on the RESIDUALS of an IVF-assigned frame
    * (`cellCol` from [[IvfIndex.transform]]) — [[fit]]'s deterministic
    * contract (first-k init by id, `iters` Lloyd steps) over
    * `vec − centroid(cell)`.
    */
  def fitResidual(assigned: DataFrame, idCol: String, vecCol: String,
      cellCol: String, coarse: IvfIndex.Model, m: Int, k: Int,
      iters: Int = 3): Model =
    fit(assigned.select(col(idCol),
        residualCol(vecCol, cellCol, coarse).as(vecCol)),
      idCol, vecCol, m, k, iters)

  /** Encode residuals: (id, cell, codes) — the IVFADC codes table. The
    * cell column stays ON the row (in production the table is
    * partitioned by it, so probing is partition pruning).
    */
  def encodeResidual(assigned: DataFrame, idCol: String, vecCol: String,
      cellCol: String, coarse: IvfIndex.Model, model: Model): DataFrame =
    encode(assigned.select(col(idCol), col(cellCol),
        residualCol(vecCol, cellCol, coarse).as(vecCol)),
      vecCol, model)
      .select(col(idCol), col(cellCol), col("codes"))

  /** IVFADC search: ADC over the probed cells' residual codes, each
    * probed cell using ITS OWN distance table built from the query's
    * residual against that cell — ||q − (c + r̂)||² = ||(q−c) − r̂||²,
    * so the residual geometry is exact per cell and only the PQ
    * quantization approximates. The per-cell tables ride in as a
    * CASE over the (bounded, plan-sized) probe list; the scan stays
    * one row-local pass over the pruned cells plus the orderBy/limit
    * heap. Returns (id, adist) ascending.
    */
  def ivfAdcResidualTopK(codes: DataFrame, idCol: String,
      coarse: IvfIndex.Model, model: Model, query: Seq[Double],
      probeCells: Seq[Int], topK: Int,
      cellCol: String = "cell"): DataFrame = {
    require(probeCells.nonEmpty, "ivfAdcResidualTopK needs >= 1 probe cell")
    val byCell = coarse.centroids.toMap
    val adist = probeCells.map { c =>
      val cent = byCell.getOrElse(c,
        throw new IllegalArgumentException(s"unknown coarse cell: $c"))
      val table = distTable(
        query.indices.map(i => query(i) - cent(i)), model)
      val sum = (0 until model.m).map { s =>
        element_at(typedLit(table(s).toSeq),
          element_at(col("codes"), s + 1) + 1)
      }.reduce(_ + _)
      (c, sum)
    }.foldLeft(lit(Double.MaxValue)) { case (acc, (c, sum)) =>
      when(col(cellCol) === c, sum).otherwise(acc)
    }
    codes
      .where(col(cellCol).isin(probeCells: _*))
      .withColumn("adist", adist)
      .orderBy(col("adist").asc, col(idCol).asc)
      .limit(topK)
      .select(col(idCol), col("adist"))
  }

  /** ADC shortlist + exact re-rank — the production IVFADC refinement
    * (Jégou et al. 2011 §V-C): the m-byte codes are lossy, so the codes
    * scan selects an OVERSAMPLED shortlist by approximate distance
    * (still one pass + a bounded heap), and only the shortlist's raw
    * vectors — topK × oversample rows, metadata-sized — are fetched
    * (broadcast semi-join on the id) for exact cosine ordering. Raw-
    * vector work is shortlist-sized, never corpus-sized; measured on
    * this corpus's geometry the re-rank lifts recall@10 from ~0.2
    * (raw ADC, AnnRecall) to the shortlist's containment rate.
    * Returns (id, sim) like [[Knn.bruteTopK]].
    */
  def adcRerankTopK(codes: DataFrame, vecs: DataFrame, idCol: String,
      vecCol: String, model: Model, query: Seq[Double], topK: Int,
      oversample: Int = 10): DataFrame = {
    require(oversample >= 1, s"oversample must be >= 1, got $oversample")
    val shortlist = adcTopK(codes, idCol, model, query, topK * oversample)
      .select(col(idCol))
    Knn.bruteTopK(
      vecs.join(org.apache.spark.sql.functions.broadcast(shortlist),
        Seq(idCol)),
      idCol, vecCol, query, topK)
  }
}
