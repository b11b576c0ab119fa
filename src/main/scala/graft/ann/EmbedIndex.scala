package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Persisted embedding index — the semantic-dedup analogue of
  * [[graft.dedup.NearDupIndex]]: the corpus' IVF quantizer and its
  * cell-assigned vectors written ONCE to storage, so later batches (a
  * daily delta, a query set) probe the stored corpus without re-fitting
  * the quantizer or re-scanning the vectors they don't collide with.
  *
  * Layout: `centroids/` — the k × dim model ([[IvfIndex.save]] format);
  * `vectors/` — (id, vec, nrm, cell), written cell-sorted within
  * partitions so parquet row-group stats skip corpus regions sharing no
  * cell with a probe. Norms are precomputed once at write time; every
  * later cosine is one dot product.
  *
  * Scale shape: a probe assigns its own rows to cells ROW-LOCALLY (the
  * centroid matrix rides the plan as a broadcast literal — no join,
  * no shuffle), then equi-joins on `cell` against the streamed
  * `vectors/` scan; the probe side is the small one, so AQE broadcasts
  * it. The corpus is only ever scanned. Appends assign with the STORED
  * centroids and append their own rows; nothing existing is rewritten.
  * Candidate completeness is the IVF-blocking contract ([[
  * graft.dedup.Dedup.embeddingPairsIvf]]): identical vectors always
  * co-assign; near-pairs straddling a cell boundary trade against the
  * bounded candidate volume. Appending does not move centroids — after
  * drift (a corpus that outgrows its quantizer), rebuild.
  *
  * Id uniqueness across build + appends is the caller's contract.
  */
object EmbedIndex {

  private def centroidsPath(path: String) = path + "/centroids"
  private def vectorsPath(path: String)   = path + "/vectors"

  private def vecs(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"))

  private def writeVectors(v: DataFrame, m: IvfIndex.Model, path: String,
      mode: String): Unit =
    IvfIndex.transform(v, "vec", m)
      .withColumn("nrm", Vectors.norm(col("vec")))
      .sortWithinPartitions("cell")
      .write.mode(mode).parquet(vectorsPath(path))

  /** Build an index at `path` (overwrites): fit the quantizer (k <= 0
    * self-sizes via [[IvfIndex.autoK]] so within-cell candidate volume
    * stays linear in corpus size), assign, and store.
    */
  def build(docs: DataFrame, idCol: String, vecCol: String, path: String,
      k: Int = 0, iters: Int = 1): Unit = {
    val v = vecs(docs, idCol, vecCol).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val kk = if (k > 0) k else IvfIndex.autoK(v.count())
      val m = IvfIndex.fit(v, "id", "vec", k = kk, iters = iters)
      IvfIndex.save(v.sparkSession, m, centroidsPath(path))
      writeVectors(v, m, path, "overwrite")
    } finally v.unpersist(blocking = false)
  }

  /** The stored quantizer. */
  def model(spark: SparkSession, path: String): IvfIndex.Model =
    IvfIndex.load(spark, centroidsPath(path))

  /** Append a delta, assigned with the STORED centroids — a parquet
    * append sized by the delta; the corpus and model are untouched.
    */
  def append(docs: DataFrame, idCol: String, vecCol: String,
      path: String): Unit =
    writeVectors(vecs(docs, idCol, vecCol),
      model(docs.sparkSession, path), path, "append")

  /** Every (probe_id, corpus_id, cos) pair between `probeDocs` and the
    * indexed corpus with cosine >= threshold, candidates = co-assigned
    * cells of the stored quantizer. `nProbe` > 1 probes each row's
    * nProbe nearest cells (row-local, still no join for assignment) to
    * reach near-pairs straddling a cell boundary; each corpus row
    * lives in exactly one cell, so pairs never duplicate.
    */
  def probePairs(probeDocs: DataFrame, idCol: String, vecCol: String,
      path: String, threshold: Double = 0.995, nProbe: Int = 1): DataFrame = {
    val spark = probeDocs.sparkSession
    val m = model(spark, path)
    val v = vecs(probeDocs, idCol, vecCol)
    val assigned =
      if (nProbe <= 1) IvfIndex.transform(v, "vec", m)
      else v.withColumn("cell",
        explode(IvfIndex.nearestCells("vec", m, nProbe)))
    val p = assigned
      .select(col("cell"), col("id").as("probe_id"), col("vec").as("pvec"),
        Vectors.norm(col("vec")).as("pnrm"))
    p.join(spark.read.parquet(vectorsPath(path)), Seq("cell"))
      .select(col("probe_id"), col("id").as("corpus_id"),
        (Vectors.dot(col("pvec"), col("vec")) /
          (col("pnrm") * col("nrm"))).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** `probeDocs` minus every row semantically duplicating the indexed
    * corpus — the incremental filter: what a delta actually contributes.
    */
  def dedupAgainst(probeDocs: DataFrame, idCol: String, vecCol: String,
      path: String, threshold: Double = 0.995, nProbe: Int = 1): DataFrame = {
    val matched = probePairs(probeDocs, idCol, vecCol, path, threshold, nProbe)
      .select(col("probe_id").as(idCol)).distinct()
    probeDocs.join(matched, Seq(idCol), "left_anti")
  }

  /** Cell-occupancy stats for the stored index: (cells, rows, max cell
    * rows, mean cell rows). Appends assign with the FROZEN quantizer,
    * so a drifting corpus concentrates rows in few cells and the
    * within-cell candidate volume creeps back toward quadratic — the
    * exact trap [[IvfIndex.autoK]] exists to prevent. Monitor this;
    * when [[needsRebuild]] trips, re-[[build]].
    */
  def cellStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(vectorsPath(path))
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("cells"), sum(col("n")).as("rows"),
        max(col("n")).as("max_cell"),
        (sum(col("n")).cast("double") / count(lit(1))).as("mean_cell"))

  /** True when the largest cell exceeds `slack` × the autoK target —
    * the stored quantizer no longer bounds candidate volume and the
    * index should be rebuilt (one corpus pass, same as day one).
    */
  def needsRebuild(spark: SparkSession, path: String,
      targetCellSize: Int = 128, slack: Double = 8.0): Boolean = {
    val r = cellStats(spark, path).head()
    r.getLong(2) > targetCellSize * slack
  }

  /** Top-k cosine search over the stored corpus, probing the nProbe
    * nearest cells — [[IvfIndex.search]] against the scan, which prunes
    * to the probed cells via the cell-sorted parquet layout.
    */
  def search(spark: SparkSession, path: String, query: Seq[Double],
      nProbe: Int, topK: Int): DataFrame =
    IvfIndex.search(spark.read.parquet(vectorsPath(path)), "id", "vec",
      model(spark, path), query, nProbe, topK)

  /** One batch's full ingest step, mirroring
    * [[graft.dedup.NearDupIndex.ingestBatch]]: keep-one within the
    * batch (min id per within-cell cosine cluster), drop what the index
    * holds, deliver survivors via `beforeAppend`, APPEND them, return
    * the kept rows of `batch` (full schema). Replaying an already-
    * appended batch self-matches the index and contributes nothing —
    * delivery-before-append is at-least-once under crash replay.
    */
  def ingestBatch(batch: DataFrame, idCol: String, vecCol: String,
      path: String, threshold: Double = 0.995,
      beforeAppend: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val m = model(spark, path)
    val v = IvfIndex.transform(vecs(batch, idCol, vecCol), "vec", m)
      .withColumn("nrm", Vectors.norm(col("vec")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val reps = graft.dedup.Dedup.components(
        graft.dedup.Dedup.embeddingPairs(v, "id", "vec", Seq("cell"), threshold))
      val kept = v.join(
        reps.where(col("rep") =!= col("id")).select("id"), Seq("id"), "left_anti")
      val matched = kept
        .join(spark.read.parquet(vectorsPath(path))
            .select(col("cell"), col("id").as("cid"), col("vec").as("cvec"),
              col("nrm").as("cnrm")),
          Seq("cell"))
        .where(Vectors.dot(col("vec"), col("cvec")) /
          (col("nrm") * col("cnrm")) >= threshold)
        .select("id").distinct()
      val survivors = kept.join(matched, Seq("id"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      // settle BEFORE the append — a post-append recompute would
      // self-match the rows it just wrote (see NearDupIndex.ingestBatch)
      val out = batch.join(
        survivors.select(col("id").as(idCol)), Seq(idCol), "left_semi")
        .localCheckpoint(eager = true)
      beforeAppend(out)
      survivors.select("id", "vec", "cell", "nrm") // writeVectors' order
        .sortWithinPartitions("cell")
        .write.mode("append").parquet(vectorsPath(path))
      survivors.unpersist(blocking = false)
      out
    } finally v.unpersist(blocking = false)
  }
}
