package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  *
  * Self-joined intermediates (the shingle-hash pass) persist at
  * MEMORY_AND_DISK: Spark's exchange reuse does not deduplicate the two
  * sides of a self-join here (the build side broadcasts, the streamed
  * side has no exchange), so without a persist the md5 pass runs once
  * per side — measured ~2x at sf0.1. Same pattern Spark MLlib uses for
  * reused training intermediates; spills to executor disk at scale.
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
    *
    * Execution shape: shingle hashes EXPLODE to (id, h) rows and the k
    * permutation minimums are plain `min` aggregates over the id
    * shuffle. The per-row alternative (k `array_min(transform(...))`
    * lambdas in one Project) builds an expression tree large enough to
    * knock the stage out of whole-stage codegen — measured 25x slower at
    * sf0.1 — and the aggregate shape is also the one that scales: the
    * shuffle is (id, h) pairs, map-side-combined, never corpus^2.
    */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4, nGram: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    val k = bands * rowsPerBand
    val base = df
      .select(col(idCol).as("id"),
        shingleHashes(wordShingles(tokens(col(textCol)), nGram)).as("hs"))
      .where(size(col("hs")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val exploded = base.select(col("id"), explode(col("hs")).as("h"))
    val sigCols = (0 until k).map { j =>
      min((col("h").bitwiseAND(Mask28) * minhashA(j) + minhashB(j)) % MinhashPrime)
        .as(s"mh$j")
    }
    val sigs = exploded.groupBy("id").agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(i => col(s"mh${b * rowsPerBand + i}").cast("string")): _*))
    }
    val banded = sigs.select(col("id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_key")))
    val cand = banded.select(col("band_idx"), col("band_key"), col("id").as("id_a"))
      .join(banded.select(col("band_idx"), col("band_key"), col("id").as("id_b")),
        Seq("band_idx", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("hs").as("shs_a")), "id_a" :: Nil)
      .join(base.select(col("id").as("id_b"), col("hs").as("shs_b")), "id_b" :: Nil)
      .select(col("id_a"), col("id_b"),
        jaccardSorted(col("shs_a"), col("shs_b")).as("jac"))
      .where(col("jac") >= threshold)
  }

  /** SimHash near-duplicate pairs: candidates from equality on
    * `blockCols`, kept when hamming(simhash32) <= maxHamming.
    *
    * Same explode+aggregate shape as minhashPairs (and for the same
    * codegen/scale reasons): 32 `sum` bit-vote aggregates over the
    * exploded (id, h) rows, fingerprint assembled from the votes.
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], maxHamming: Int = 6, nGram: Int = 3): DataFrame = {
    val base = df.select(
        col(idCol).as("id"),
        struct(blockCols.map(col): _*).as("blk"),
        shingleHashes(wordShingles(tokens(col(textCol)), nGram)).as("hs"))
      .where(size(col("hs")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val voteCols = (0 until 32).map { i =>
      sum(shiftright(col("h"), i).bitwiseAND(1) * 2 - 1).as(s"v$i")
    }
    val votes = base.select(col("id"), explode(col("hs")).as("h"))
      .groupBy("id").agg(voteCols.head, voteCols.tail: _*)
    val fpExpr = (0 until 32)
      .map(i => when(col(s"v$i") >= 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)
    val fp = votes.select(col("id"), fpExpr.as("fp"))
      .join(base.select(col("id"), col("blk")), "id" :: Nil)
      .persist(StorageLevel.MEMORY_AND_DISK)
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
      shingleHashes(wordShingles(tokens(col(textCol)), nGram)).as("shs"))
      .where(size(col("shs")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val l = sh.select(col("blk"), col("id").as("id_a"), col("shs").as("shs_a"))
    val r = sh.select(col("blk"), col("id").as("id_b"), col("shs").as("shs_b"))
    // Size-ratio prefilter: jac >= t implies min(|A|,|B|)/max(|A|,|B|) >= t,
    // so mismatched sizes are dropped before the expensive set intersect.
    // Semantics-preserving — no false negatives.
    l.join(r, "blk" :: Nil)
      .where(col("id_a") < col("id_b") &&
        size(col("shs_a")).cast("double") >= size(col("shs_b")) * threshold &&
        size(col("shs_b")).cast("double") >= size(col("shs_a")) * threshold)
      .select(col("id_a"), col("id_b"),
        jaccardSorted(col("shs_a"), col("shs_b")).as("jac"))
      .where(col("jac") >= threshold)
  }

  /** Embedding near-duplicate pairs by cosine within `blockCols` cells
    * (IVF-style candidate restriction).
    */
  def embeddingPairs(
      df: DataFrame, idCol: String, vecCol: String,
      blockCols: Seq[String], threshold: Double = 0.995): DataFrame = {
    // Norms are computed once per row before the pair join — recomputing
    // them inside cosine would triple the per-pair flops.
    val v = df.select(col(idCol).as("id"),
      struct(blockCols.map(col): _*).as("blk"),
      col(vecCol).cast("array<double>").as("vec"))
      .withColumn("nrm", graft.ann.Vectors.norm(col("vec")))
    val l = v.select(col("blk"), col("id").as("id_a"), col("vec").as("vec_a"),
      col("nrm").as("nrm_a"))
    val r = v.select(col("blk"), col("id").as("id_b"), col("vec").as("vec_b"),
      col("nrm").as("nrm_b"))
    l.join(r, "blk" :: Nil)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (graft.ann.Vectors.dot(col("vec_a"), col("vec_b")) /
          (col("nrm_a") * col("nrm_b"))).as("cos"))
      .where(col("cos") >= threshold)
  }
}
