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

  /** Exact top-k for a BATCH of query vectors — the retrieval-eval /
    * hard-negative-mining primitive. One scan of the corpus joined
    * against the BROADCAST query table (the batch is small by contract),
    * cosine per (row, query) via the codegen dot product with both norms
    * precomputed once per side, then per-query top-k through the
    * bounded-heap `TopKByScore` aggregate: each partition reduces to at
    * most k pairs per query BEFORE the exchange, so the shuffle carries
    * #queries x #partitions x k rows — never the n x q similarity
    * matrix (a `row_number()` window partitioned by query id would
    * serialize that whole matrix through #queries reducers).
    *
    * Returns (qidCol, rank, idCol, sim) sorted by (qid, rank); ties
    * break to the smaller corpus id, so results are deterministic.
    */
  def bruteTopKBatch(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
      .withColumn("_vn", Vectors.norm(col("_v")))
    val q = queries.select(col(qidCol), col(qvecCol).cast("array<double>").as("_qv"))
      .withColumn("_qn", Vectors.norm(col("_qv")))
    val sim = Vectors.dot(col("_v"), col("_qv")) / (col("_vn") * col("_qn"))
    val top = c.join(broadcast(q))
      .select(col(qidCol),
        struct(sim.as("score"), col(idCol).cast("long").as("id")).as("_p"))
      .groupBy(qidCol)
      .agg(graft.functions.VectorAggregates.topKByScore(col("_p"), k).as("_top"))
    top.select(col(qidCol), posexplode(col("_top")).as(Seq("_r", "_e")))
      .select(col(qidCol), (col("_r") + 1).cast("int").as("rank"),
        col("_e.id").as(idCol), col("_e.score").as("sim"))
  }
}
