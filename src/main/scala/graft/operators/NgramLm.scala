package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** N-gram language-model perplexity filtering — the third classic
  * corpus-quality filter beside rule-based (tx12) and classifier-based
  * (tx14/tx15): CCNet-style pipelines score every document with a
  * small LM and drop the perplexity outliers. Here the LM is an
  * honest in-engine bigram model with add-k smoothing, trained and
  * applied as plain aggregates and joins.
  *
  * Scale shape: training is ONE explode of the corpus into bigrams
  * with a map-side-combined count — the model is two vocabulary-bound
  * tables (bigram counts, context totals) and one scalar (vocab
  * size), never the corpus. Scoring explodes the scored documents the
  * same way and equi-joins the model on the bigram key — a
  * high-cardinality-keyed shuffle whose model side is LM-sized, then
  * a per-document map-side-combined average. Nothing unbounded is
  * collected; V rides the plan as a literal.
  */
object NgramLm {

  /** Bigram counts (w1, w2, c), context totals (w1, c1 = Σ_w2 c), and
    * the training vocabulary size. `bigrams` is persisted (registered
    * with [[graft.engine.Caches]]) — the scoring plan reads it twice
    * (pair join + context derivation).
    */
  final case class Model(bigrams: DataFrame, contexts: DataFrame, v: Long)

  /** (doc rows exploded to adjacent pairs) — `toksCol` is an
    * array<string> column; rows with fewer than 2 tokens contribute
    * nothing.
    */
  private def bigramPairs(df: DataFrame, cols: Seq[Column],
      toksCol: String): DataFrame = {
    val t = col(toksCol)
    df.select(cols :+ explode(arrays_zip(
      slice(t, lit(1), size(t) - 1).as("w1"),
      slice(t, lit(2), size(t) - 1).as("w2"))).as("bg"): _*)
      .select(cols :+ col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)
  }

  /** Train on a tokenized corpus: bigram + context counts and V. Two
    * jobs (the V count and the later count materializations); the
    * corpus itself is never collected.
    */
  def fit(docs: DataFrame, toksCol: String): Model = {
    val bg = graft.engine.Caches.track(
      bigramPairs(docs, Seq.empty, toksCol)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val ctx = bg.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
    val v = docs.select(explode(col(toksCol)).as("w")).distinct().count()
    Model(bg, ctx, v)
  }

  /** Per-document bigram perplexity under the model with add-k
    * smoothing: ppl = exp(-mean ln P(w2|w1)), P = (c + k)/(c1 + kV).
    * Unseen bigrams/contexts get c = 0 / c1 = 0 via the smoothing.
    * Output: (idCol, n_bigrams, mean_lp, ppl) for documents with >= 2
    * tokens — `mean_lp` is the ln-space mean importance weighting
    * composes on ([[https://arxiv.org/abs/2302.03169 DSIR]]-style
    * selection is mean_lp_target - mean_lp_raw).
    */
  def perplexity(docs: DataFrame, idCol: String, toksCol: String,
      m: Model, k: Double = 1.0): DataFrame = {
    val pairs = bigramPairs(docs, Seq(col(idCol)), toksCol)
    val lp = log((coalesce(col("c"), lit(0L)).cast("double") + lit(k)) /
      (coalesce(col("c1"), lit(0L)).cast("double") + lit(k * m.v)))
    pairs
      .join(m.bigrams, Seq("w1", "w2"), "left")
      .join(m.contexts, Seq("w1"), "left")
      .select(col(idCol), lp.as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("lp")).as("mean_lp"),
        exp(-avg(col("lp"))).as("ppl"))
  }
}
