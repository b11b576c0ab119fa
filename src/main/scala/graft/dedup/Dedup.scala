package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines, designed around
  * Spark's shuffle model:
  *
  *  - exact:    one hash-shuffle on md5(text) — the minimum possible.
  *  - minhash:  signatures computed row-wise (no shuffle), candidates via
  *              an equi-join on LSH band keys (shuffle on band buckets —
  *              tiny vs. the corpus), verification row-wise on the pair.
  *  - simhash:  row-wise fingerprints; candidate pairs from equi-join on
  *              cheap block keys, verified by bit_count(xor) <= radius.
  *  - jaccard:  candidate pairs from block keys, exact set-Jaccard.
  *
  * At 100 TB the only all-to-all movement in any of these is the
  * candidate join keyed on band/block buckets, whose cardinality is data
  * (near-dup) bound, not corpus^2 bound. Skewed buckets (e.g. boilerplate
  * shingles) are AQE-skew-join split.
  */
object Dedup {

  /** Exact duplicate groups: (group_key = md5 of text, representative =
    * min id, n_dups). Returns only groups with >1 member.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .where(col("n_dups") > 1)

  /** MinHash+LSH near-duplicate pairs with exact Jaccard verification.
    * k = bands * rowsPerBand signature size.
    */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4, nGram: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    val k = bands * rowsPerBand
    val withSig = df
      .select(col(idCol).as("id"),
        array_distinct(wordShingles(tokens(col(textCol)), nGram)).as("shs"))
      .where(size(col("shs")) > 0)
      .withColumn("sig", minhashSig(col("shs"), k))
      .withColumn("bands", bandKeys(col("sig"), bands, rowsPerBand))
    val banded = withSig.select(col("id"), col("shs"),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    val l = banded.select(col("band_idx"), col("band_key"),
      col("id").as("id_a"), col("shs").as("shs_a"))
    val r = banded.select(col("band_idx"), col("band_key"),
      col("id").as("id_b"), col("shs").as("shs_b"))
    l.join(r, Seq("band_idx", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("shs_a"), col("shs_b")).as("jac"))
      .distinct()
      .where(col("jac") >= threshold)
  }

  /** SimHash near-duplicate pairs: candidates from equality on
    * `blockCols`, kept when hamming(simhash32) <= maxHamming.
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], maxHamming: Int = 6, nGram: Int = 3): DataFrame = {
    val fp = df.select(
        col(idCol).as("id"),
        struct(blockCols.map(col): _*).as("blk"),
        array_distinct(wordShingles(tokens(col(textCol)), nGram)).as("shs"))
      .where(size(col("shs")) > 0)
      .select(col("id"), col("blk"), simhash32(col("shs")).as("fp"))
    val l = fp.select(col("blk"), col("id").as("id_a"), col("fp").as("fp_a"))
    val r = fp.select(col("blk"), col("id").as("id_b"), col("fp").as("fp_b"))
    l.join(r, "blk" :: Nil)
      .where(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram-set Jaccard pairs over candidate blocks. */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], nGram: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sh = df.select(
      col(idCol).as("id"),
      struct(blockCols.map(col): _*).as("blk"),
      array_distinct(wordShingles(tokens(col(textCol)), nGram)).as("shs"))
      .where(size(col("shs")) > 0)
    val l = sh.select(col("blk"), col("id").as("id_a"), col("shs").as("shs_a"))
    val r = sh.select(col("blk"), col("id").as("id_b"), col("shs").as("shs_b"))
    l.join(r, "blk" :: Nil)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("shs_a"), col("shs_b")).as("jac"))
      .where(col("jac") >= threshold)
  }

  /** Embedding near-duplicate pairs by cosine within `blockCols` cells
    * (IVF-style candidate restriction).
    */
  def embeddingPairs(
      df: DataFrame, idCol: String, vecCol: String,
      blockCols: Seq[String], threshold: Double = 0.995): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      struct(blockCols.map(col): _*).as("blk"),
      col(vecCol).cast("array<double>").as("vec"))
    val l = v.select(col("blk"), col("id").as("id_a"), col("vec").as("vec_a"))
    val r = v.select(col("blk"), col("id").as("id_b"), col("vec").as("vec_b"))
    l.join(r, "blk" :: Nil)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.ann.Vectors.cosine(col("vec_a"), col("vec_b")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
