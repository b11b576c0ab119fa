package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dedup.Dedup
import graft.functions.TextFunctions

/** The end-to-end corpus-curation pipeline as ONE public call:
  * quality gate → near-dup keep-one (complete prefix-filter candidates +
  * connected components) → deterministic hash sample → sequence packing.
  * This is the composition the pp01 gate verifies against a
  * recursive-CTE DuckDB oracle; every stage is an operator verified
  * alone elsewhere.
  *
  * Scale shape: inherits each stage's invariants — the quality gate is
  * row-local, dedup candidates are prefix-filter-bound (never corpus²),
  * components moves only the edge list, sampling is a row-local hash
  * decision, and packing's global prefix sum is the two-pass
  * `RangeRank.globalCumSum` (global-order work touches #partitions
  * rows). Nothing in the composition adds a driver-side loop or a
  * data-global window.
  */
object Curation {

  /** Pipeline knobs. `qualityMin` gates on
    * [[TextFunctions.qualityScore]]; `jaccardThreshold` is the near-dup
    * pair cutoff; `sampleFraction` the deterministic hash-sample rate;
    * `binTokens` the packing bin size; `nGram` the shingle width.
    */
  case class Opts(
      qualityMin: Double = 0.55,
      jaccardThreshold: Double = 0.5,
      sampleFraction: Double = 0.5,
      binTokens: Long = 2048L,
      nGram: Int = 3)

  /** A pre-paid whole-corpus near-dup pair table plus the parameters it
    * was computed under. Exact Jaccard depends on BOTH the threshold
    * and the shingle width, so [[curate]] requires them to equal the
    * run's `opts` — a pair table computed under different parameters
    * would silently produce different dedup clusters than the
    * recompute path, and that mismatch must fail loudly, not skew
    * results.
    */
  case class PrepaidPairs(pairs: DataFrame,
      jaccardThreshold: Double, nGram: Int)

  /** Returns the packed training manifest: (idCol, n_tokens, gcum, bin,
    * bin_offset) for every document that survives quality → keep-one →
    * sample, laid end-to-end in idCol order.
    *
    * The shingle persist releases itself before this returns; the
    * packing stage's plan-internal persists release via
    * [[graft.engine.Caches.release]] — long-lived sessions call it
    * after the terminal action on the returned frame.
    *
    * `shingles`: callers that already paid the corpus shingle pass
    * (see [[Dedup.shingleBase]]) pass it here and the pipeline
    * semi-joins it down to the quality survivors instead of recomputing
    * — shingling is the dominant cost and Spark cannot share it across
    * separately-planned queries.
    *
    * `pairs`: callers that already paid the WHOLE-corpus pair search
    * (Dedup.jaccardPairsFromShingles) pass it here — tagged with the
    * threshold and shingle width it was computed under, which MUST
    * equal this run's `opts` (checked, loud) — and the pipeline
    * restricts it to quality survivors instead of re-running PPJoin.
    * Exact Jaccard depends only on the two documents, so
    * pairs(survivors) ≡ pairs(corpus) ∩ survivors², edge for edge —
    * including bridge docs dropped by the quality gate correctly
    * splitting their clusters. Takes precedence over `shingles`.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      opts: Opts = Opts(), shingles: Option[DataFrame] = None,
      pairs: Option[PrepaidPairs] = None): DataFrame = {
    pairs.foreach { pp =>
      require(pp.jaccardThreshold == opts.jaccardThreshold &&
          pp.nGram == opts.nGram,
        s"pre-paid pair table was computed at threshold=" +
          s"${pp.jaccardThreshold}, nGram=${pp.nGram} but opts ask for " +
          s"threshold=${opts.jaccardThreshold}, nGram=${opts.nGram} — " +
          "mismatched parameters would silently change dedup clusters")
    }
    val kept = docs
      .where(TextFunctions.qualityScore(col(textCol)) >= opts.qualityMin)
      .select(col(idCol), col(textCol))
    // components() returns (id, rep); rename both before the join so a
    // caller whose idCol is literally "id" (or "rep") doesn't hit an
    // ambiguous-reference AnalysisException
    val reps = (pairs match {
      case Some(pp) =>
        val keptIds = kept.select(col(idCol).as("_kept_id"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val restricted = pp.pairs
          .join(keptIds, col("id_a") === col("_kept_id"), "left_semi")
          .join(keptIds, col("id_b") === col("_kept_id"), "left_semi")
        val cc = Dedup.components(restricted)
        keptIds.unpersist(blocking = false) // components() is eager
        cc
      case None =>
        val sh = shingles match {
          case Some(pre) => pre
            .join(kept.select(col(idCol).as("id")), Seq("id"), "left_semi")
            .persist(StorageLevel.MEMORY_AND_DISK)
          case None => Dedup.shingleBase(kept, idCol, textCol, opts.nGram)
            .persist(StorageLevel.MEMORY_AND_DISK)
        }
        val cc = Dedup.components(
          Dedup.jaccardPairsFromShingles(sh, opts.jaccardThreshold))
        // components() is eager (it label-propagates through per-round
        // localCheckpoints), so by here the labeling is materialized and
        // nothing downstream reads the shingle table again — release it
        // now rather than leak a session-lifetime cache entry per call
        sh.unpersist(blocking = false)
        cc
    })
      .withColumnRenamed("id", "_cc_id")
      .withColumnRenamed("rep", "_cc_rep")
    val keepOne = kept
      .join(reps, col(idCol) === col("_cc_id"), "left")
      .where(col("_cc_rep").isNull || col("_cc_rep") === col(idCol))
      .select(col(idCol))
    val sampled = Sampling.hashSample(keepOne, col(idCol), opts.sampleFraction)
    val withTokens = sampled.join(
      docs.select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens")),
      Seq(idCol))
    Packing.pack(withTokens, Seq(col(idCol)), "n_tokens", opts.binTokens)
  }
}
