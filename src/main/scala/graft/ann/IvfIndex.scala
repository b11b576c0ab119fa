package graft.ann

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** IVF coarse quantizer for ANN at scale: k-means cells learned with
  * deterministic Lloyd iterations, expressed entirely as DataFrame ops —
  * assignment is a broadcast join against the (k x dim) centroid table
  * with a min_by over squared distance; the mean recompute is a
  * posexplode + groupBy(cell, dim) aggregate. Only the k x dim centroid
  * matrix ever reaches the driver.
  *
  * At 100 TB: persist the assignment as a partition column and the
  * centroid table alongside; a query then prunes to nProbe cells before
  * the exact distance pass (Knn.bruteTopK over the pruned scan).
  */
object IvfIndex {

  final case class Model(centroids: Array[(Int, Array[Double])]) {
    def k: Int = centroids.length
  }

  private def centroidDf(spark: SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    m.centroids.toSeq.map { case (c, v) => (c, v.toSeq) }.toDF("cell", "centroid")
  }

  /** Squared L2 distance: |v|^2 - 2 v.c + |c|^2; the |v|^2 term is
    * rank-invariant per vector but kept so distances are true.
    */
  private def assignCells(df: DataFrame, vecCol: String, cents: DataFrame): DataFrame = {
    val d2 = Vectors.dot(col(vecCol), col(vecCol)) -
      lit(2.0) * Vectors.dot(col(vecCol), col("centroid")) +
      Vectors.dot(col("centroid"), col("centroid"))
    df.crossJoin(broadcast(cents))
      .groupBy(df.columns.map(col): _*)
      .agg(min_by(col("cell"), struct(d2, col("cell"))).as("cell"))
  }

  /** Deterministic training: init = the k vectors with smallest ids,
    * `iters` Lloyd steps. Input vectors must be array<double> (cast
    * upstream).
    */
  def fit(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3): Model = {
    val spark = df.sparkSession
    var model = Model(
      df.orderBy(col(idCol)).limit(k)
        .select(col(vecCol)).collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0).toArray) })
    for (_ <- 0 until iters) {
      val assigned = assignCells(
        df.select(col(idCol).as("id"), col(vecCol).as("vec")), "vec",
        centroidDf(spark, model))
      val means = assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(avg("x").as("m"))
        .collect()
      val byCell = means.groupBy(_.getAs[Int]("cell"))
      model = Model(model.centroids.map { case (c, old) =>
        byCell.get(c) match {
          case Some(rows) =>
            val arr = new Array[Double](old.length)
            rows.foreach(r => arr(r.getAs[Int]("dim")) = r.getAs[Double]("m"))
            (c, arr)
          case None => (c, old) // empty cell keeps its centroid
        }
      })
    }
    model
  }

  /** Assign every vector its cell id. */
  def transform(df: DataFrame, vecCol: String, m: Model): DataFrame =
    assignCells(df, vecCol, centroidDf(df.sparkSession, m))

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
