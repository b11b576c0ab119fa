package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity primitives backed by the native codegen
  * `DotProduct` expression (graft.functions.VectorExpressions) — a
  * primitive loop in whole-stage codegen, no per-row array allocation.
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteTopK` is the exact baseline: one scan, per-row cosine against
  *    a broadcast query vector, TakeOrderedAndProject top-k. At 100 TB
  *    this is one pass over the embedding column only (column pruning
  *    keeps the scan narrow) with no shuffle at all — the k-heap merge
  *    happens on partial per-partition heaps.
  *  - `ivfTopK` is the scale path: embeddings are pre-bucketed into
  *    cells (any coarse quantizer — here the cell id column), and only
  *    the query's cell(s) are scanned. With the table partitioned by
  *    cell on disk, partition pruning skips everything else.
  */
object Knn {

  def withCosine(df: DataFrame, vecCol: String, query: Seq[Double]): DataFrame = {
    val q = array(query.map(lit): _*)
    df.withColumn("sim",
      Vectors.cosine(col(vecCol).cast("array<double>"), q))
  }

  def bruteTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame =
    withCosine(df, vecCol, query)
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, cellCol: String,
      query: Seq[Double], queryCells: Seq[Any], k: Int): DataFrame =
    bruteTopK(df.where(col(cellCol).isin(queryCells: _*)), idCol, vecCol, query, k)
}
