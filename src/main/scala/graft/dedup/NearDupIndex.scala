package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Persisted near-duplicate index: the corpus' shingle and LSH-band
  * tables written ONCE to storage, so later batches (a daily delta, an
  * eval set to decontaminate) probe against the stored index without
  * re-reading or re-shingling the corpus.
  *
  * This is the incremental form of [[Dedup.minhashPairsAcrossFromShingles]]:
  * at 100 TB the corpus-side tokenize→shingle→md5 pass is the dominant
  * cost and must not be paid per batch. The index holds exactly the two
  * tables that pass produces — `shingles/` (id, hs) and `bands/`
  * (id, band_idx, band_key) — plus a one-row `meta/` dataset pinning
  * (bands, rowsPerBand, nGram) so every probe and append shingles its
  * input the same way the index was built.
  *
  * Scale shape of [[probePairs]]: the index tables are only SCANNED,
  * never shuffled — the probe side of a delta-vs-corpus join is the
  * small one, so AQE broadcasts the probe bands against the streamed
  * `bands/` scan, and the candidate id set (band-collision-bound, not
  * corpus-bound) broadcasts against the streamed `shingles/` scan for
  * the verify. `bands/` is written sorted by band_key within
  * partitions, so parquet row-group stats can skip corpus regions that
  * share no band key with the probe. Appends are parquet appends of the
  * delta's own rows; nothing existing is rewritten.
  *
  * Id uniqueness across build + appends is the caller's contract, as it
  * is for every pair operator in [[Dedup]].
  */
object NearDupIndex {

  /** Banding/shingling parameters an index was built with. */
  case class Meta(bands: Int, rowsPerBand: Int, nGram: Int)

  private def shinglesPath(path: String) = path + "/shingles"
  private def bandsPath(path: String)    = path + "/bands"
  private def metaPath(path: String)     = path + "/meta"

  /** Build an index at `path` from raw documents (overwrites). */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
      bands: Int = 4, rowsPerBand: Int = 4, nGram: Int = 3): Unit =
    buildFromShingles(
      Dedup.shingleBase(docs, idCol, textCol, nGram), path,
      bands, rowsPerBand, nGram)

  /** [[build]] over a pre-computed (id, hs) shingle table — callers that
    * already paid the corpus shingle pass (see [[Dedup.shingleBase]])
    * write it straight out. `nGram` is recorded so probes shingle their
    * input identically; it must be the width `shingles` was built with.
    */
  def buildFromShingles(shingles: DataFrame, path: String,
      bands: Int = 4, rowsPerBand: Int = 4, nGram: Int = 3): Unit = {
    val spark = shingles.sparkSession
    writeTables(shingles, path, Meta(bands, rowsPerBand, nGram), "overwrite")
    import spark.implicits._
    Seq((bands, rowsPerBand, nGram)).toDF("bands", "rows_per_band", "n_gram")
      .coalesce(1).write.mode("overwrite").json(metaPath(path))
  }

  /** Append a delta's rows to an existing index, shingled and banded
    * with the parameters the index was built with. Existing files are
    * untouched — this is two parquet appends sized by the delta.
    */
  def append(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val m = meta(docs.sparkSession, path)
    writeTables(Dedup.shingleBase(docs, idCol, textCol, m.nGram),
      path, m, "append")
  }

  private def writeTables(shingles: DataFrame, path: String, m: Meta,
      mode: String): Unit = {
    // Read twice (own write + banding) — persist for the duration,
    // unless the caller already holds a persist (then it owns release).
    val callerPersisted = shingles.storageLevel != StorageLevel.NONE
    val sh = if (callerPersisted) shingles
      else shingles.persist(StorageLevel.MEMORY_AND_DISK)
    sh.write.mode(mode).parquet(shinglesPath(path))
    Dedup.bandedKeys(sh, m.bands, m.rowsPerBand)
      .sortWithinPartitions("band_key")
      .write.mode(mode).parquet(bandsPath(path))
    if (!callerPersisted) sh.unpersist(blocking = false)
  }

  /** The parameters an index at `path` was built with. */
  def meta(spark: SparkSession, path: String): Meta = {
    val row = spark.read.json(metaPath(path))
      .select("bands", "rows_per_band", "n_gram").head()
    Meta(row.getLong(0).toInt, row.getLong(1).toInt, row.getLong(2).toInt)
  }

  /** Every (probe_id, corpus_id, jac) near-dup pair between `probeDocs`
    * and the indexed corpus, jac >= threshold, candidates complete for
    * the index's band scheme. The probe's shingle pass is persisted for
    * the plan's two reads and registered with [[graft.engine.Caches]].
    */
  def probePairs(probeDocs: DataFrame, idCol: String, textCol: String,
      path: String, threshold: Double = 0.6): DataFrame = {
    val spark = probeDocs.sparkSession
    val m = meta(spark, path)
    val psh = graft.engine.Caches.track(
      Dedup.shingleBase(probeDocs, idCol, textCol, m.nGram)
        .persist(StorageLevel.MEMORY_AND_DISK))
    Dedup.minhashPairsAcrossFromBanded(
      Dedup.bandedKeys(psh, m.bands, m.rowsPerBand),
      spark.read.parquet(bandsPath(path)),
      psh, spark.read.parquet(shinglesPath(path)), threshold)
  }

  /** `probeDocs` minus every document near-duplicating the indexed
    * corpus — the incremental-ingest filter: survivors are what a daily
    * delta contributes after dedup against everything already ingested.
    */
  def dedupAgainst(probeDocs: DataFrame, idCol: String, textCol: String,
      path: String, threshold: Double = 0.6): DataFrame = {
    val matched = probePairs(probeDocs, idCol, textCol, path, threshold)
      .select(col("probe_id").as(idCol)).distinct()
    probeDocs.join(matched, Seq(idCol), "left_anti")
  }

  /** Start an EMPTY index at `path` — the day-zero form of [[build]]
    * for pipelines that grow an index purely by [[ingestBatch]] /
    * [[append]]. Pins the band scheme and (id BIGINT, hs ARRAY<BIGINT>)
    * table schemas; callers' id column must be long-valued.
    */
  def init(spark: SparkSession, path: String, bands: Int = 4,
      rowsPerBand: Int = 4, nGram: Int = 3): Unit = {
    import spark.implicits._
    buildFromShingles(Seq.empty[(Long, Seq[Long])].toDF("id", "hs"),
      path, bands, rowsPerBand, nGram)
  }

  /** The full ingest step for one batch: keep-one within the batch
    * (min id per [[Dedup.components]] near-dup cluster), drop what the
    * index already holds, APPEND the survivors, and return the kept
    * rows of `batch` (full schema). First-seen-wins across batches —
    * the index is the memory — and the batch's shingle pass is paid
    * once (persisted through pairing, probing, and the append, then
    * released). Shingle-less documents (text shorter than the index's
    * n-gram) are uncomparable: they pass through kept but un-indexed,
    * the same contract as [[dedupAgainst]].
    *
    * `beforeAppend` runs on the settled result AFTER the dedup but
    * BEFORE the index append — a downstream delivery hooked there is
    * at-least-once under batch replay (a crash between delivery and
    * append re-delivers; a crash after the append makes the replayed
    * batch self-match the index and contribute nothing twice). This is
    * the per-micro-batch body of [[graft.streaming.StreamIndexDedup]],
    * and equally the daily-batch entry point for a scheduled pipeline.
    */
  def ingestBatch(batch: DataFrame, idCol: String, textCol: String,
      path: String, threshold: Double = 0.6,
      beforeAppend: DataFrame => Unit = _ => ()): DataFrame = {
    val m = meta(batch.sparkSession, path)
    val sh = Dedup.shingleBase(batch, idCol, textCol, m.nGram)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // within-batch keep-one: cluster representatives stay
      val reps = Dedup.components(
        Dedup.minhashPairsFromShingles(sh, m.bands, m.rowsPerBand, threshold))
      val kept = sh.join(
        reps.where(col("rep") =!= col("id")).select("id"), Seq("id"), "left_anti")
      // drop what the corpus already holds
      val matched = Dedup.minhashPairsAcrossFromBanded(
          Dedup.bandedKeys(kept, m.bands, m.rowsPerBand),
          batch.sparkSession.read.parquet(bandsPath(path)),
          kept, batch.sparkSession.read.parquet(shinglesPath(path)), threshold)
        .select(col("probe_id").as("id")).distinct()
      val survivors = kept.join(matched, Seq("id"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      // Settle the result BEFORE appending: survivors' plan probes the
      // index parquet, so a post-append recompute would self-match the
      // rows it just wrote and come back empty.
      val out = batch
        .join(sh.select(col("id").as(idCol)), Seq(idCol), "left_anti")
        .unionByName(batch.join(
          survivors.select(col("id").as(idCol)), Seq(idCol), "left_semi"))
        .localCheckpoint(eager = true)
      beforeAppend(out)
      writeTables(survivors, path, m, "append")
      survivors.unpersist(blocking = false)
      out
    } finally sh.unpersist(blocking = false)
  }
}
