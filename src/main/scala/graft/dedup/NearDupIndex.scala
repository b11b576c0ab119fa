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
    // Read twice (own write + banding) — persist for the duration.
    val sh = shingles.persist(StorageLevel.MEMORY_AND_DISK)
    sh.write.mode(mode).parquet(shinglesPath(path))
    Dedup.bandedKeys(sh, m.bands, m.rowsPerBand)
      .sortWithinPartitions("band_key")
      .write.mode(mode).parquet(bandsPath(path))
    sh.unpersist(blocking = false)
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
}
