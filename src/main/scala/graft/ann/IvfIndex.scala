package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF coarse quantizer for ANN at scale: k-means cells learned with
  * deterministic Lloyd iterations. Assignment carries the whole (k x dim)
  * centroid matrix into the plan as one literal and computes the argmin
  * cell per row with a fold — no join, no shuffle, no row amplification
  * (the earlier crossJoin+groupBy shape amplified every row k times
  * through a shuffle per Lloyd iteration). The mean recompute is a
  * per-cell `VectorSum` typed aggregate — one input row per vector
  * (no dim-factor explode), map-side combined into one array per cell,
  * k output rows. Only the k x dim centroid matrix ever reaches the
  * driver.
  *
  * At 100 TB: persist the assignment as a partition column and the
  * centroid table alongside; a query then prunes to nProbe cells before
  * the exact distance pass (Knn.bruteTopK over the pruned scan).
  */
object IvfIndex {

  final case class Model(centroids: Array[(Int, Array[Double])]) {
    def k: Int = centroids.length
  }

  /** Per-row nearest-centroid id. |v|^2 is rank-invariant per row, so the
    * argmin only needs -2 v.c + |c|^2 (|c|^2 precomputed driver-side).
    * Ties break to the smaller cell id: cells scan in ascending id
    * order with a strict less-than. One compiled loop per row
    * ([[graft.functions.IvfNearestKernel]] — the `aggregate` fold this
    * replaced ran its lambda interpreted per centroid, which at autoK
    * cell counts dominated assignment).
    */
  private def nearestCell(vecCol: String, m: Model): Column =
    graft.functions.VectorExpressions.ivfNearest(col(vecCol),
      m.centroids.sortBy(_._1).map { case (c, v) => (c, v.toSeq) }.toSeq, 1)

  private def assignCells(df: DataFrame, vecCol: String, m: Model): DataFrame =
    df.withColumn("cell", nearestCell(vecCol, m))

  /** ARRAY of the min(nProbe, k) nearest cell ids per row, nearest
    * first, ties to the smaller id — row-local like [[nearestCell]] and
    * the same compiled kernel (one scan of the centroid matrix plus an
    * nProbe-bounded insertion per row). Probing several cells is how a
    * query or dedup probe reaches near-pairs that straddle a cell
    * boundary.
    */
  def nearestCells(vecCol: String, m: Model, nProbe: Int): Column =
    if (nProbe == 1) array(nearestCell(vecCol, m))
    else graft.functions.VectorExpressions.ivfNearest(col(vecCol),
      m.centroids.sortBy(_._1).map { case (c, v) => (c, v.toSeq) }.toSeq,
      nProbe)

  /** Corpus-driven cell count: enough cells that the EXPECTED cell size
    * stays ~`targetCellSize` rows regardless of corpus size. A fixed k
    * is a scale trap for dedup blocking — cell size grows linearly with
    * the corpus, so the within-cell pair join grows QUADRATICALLY. With
    * k ∝ n the per-cell candidate volume is bounded and total candidate
    * work stays O(n · targetCellSize) — the same self-sizing principle
    * as SimHash's autoComboWidth. (ANN search is different: there k
    * trades recall vs probe cost and stays an explicit knob.)
    */
  def autoK(n: Long, targetCellSize: Int = 128, kMin: Int = 16): Int =
    math.max(kMin, ((n + targetCellSize - 1) / targetCellSize).toInt)

  /** Deterministic training: init = the k vectors with smallest ids,
    * `iters` Lloyd steps. Input vectors must be array<double> (cast
    * upstream).
    */
  def fit(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3): Model = {
    var model = Model(
      df.orderBy(col(idCol)).limit(k)
        .select(col(vecCol)).collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0).toArray) })
    for (_ <- 0 until iters) {
      val assigned = assignCells(
        df.select(col(idCol).as("id"), col(vecCol).as("vec")), "vec", model)
      val sums = assigned
        .groupBy("cell")
        .agg(graft.functions.VectorAggregates.vecSum(col("vec")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byCell = sums.map(r => r.getAs[Int]("cell") ->
        (r.getSeq[Double](1).toArray, r.getAs[Long]("n"))).toMap
      model = Model(model.centroids.map { case (c, old) =>
        byCell.get(c) match {
          case Some((s, n)) => (c, s.map(_ / n))
          case None => (c, old) // empty cell keeps its centroid
        }
      })
    }
    model
  }

  /** Assign every vector its cell id. */
  def transform(df: DataFrame, vecCol: String, m: Model): DataFrame =
    assignCells(df, vecCol, m)

  /** Persist the centroid matrix as a tiny parquet table so the
    * quantizer is fit ONCE and reused across queries/sessions — at
    * 100 TB the fit is a full-corpus pass, the model is k x dim doubles.
    */
  def save(spark: org.apache.spark.sql.SparkSession, m: Model,
      path: String): Unit = {
    import spark.implicits._
    m.centroids.toSeq.map { case (c, v) => (c, v.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model =
    Model(spark.read.parquet(path)
      .select(col("cell"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1))

  /** Top-k cosine search probing only the nProbe nearest cells. */
  def search(assigned: DataFrame, idCol: String, vecCol: String, m: Model,
      query: Seq[Double], nProbe: Int, topK: Int): DataFrame = {
    def d2(c: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < c.length) {
        val d = c(i) - query(i); s += d * d; i += 1
      }
      s
    }
    val cells = m.centroids.sortBy { case (c, v) => (d2(v), c) }
      .take(nProbe).map(_._1)
    Knn.bruteTopK(assigned.where(col("cell").isin(cells.map(Integer.valueOf): _*)),
      idCol, vecCol, query, topK)
  }
}
