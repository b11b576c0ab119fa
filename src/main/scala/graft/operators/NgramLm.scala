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
    val len = greatest(size(t) - 1, lit(0)) // slice throws on negatives
    df.select(cols :+ explode(arrays_zip(
      slice(t, lit(1), len).as("w1"),
      slice(t, lit(2), len).as("w2"))).as("bg"): _*)
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

  /** Counts for Stupid Backoff (Brants et al. 2007 — the smoothing
    * DESIGNED for distributed counting: no discounting state, just
    * raw counts at three orders). All three tables are
    * map-side-combined aggregates; `n` is the corpus token total.
    */
  final case class Model3(trigrams: DataFrame, bigrams: DataFrame,
      unigrams: DataFrame, n: Long)

  private def trigramTriples(df: DataFrame, cols: Seq[Column],
      toksCol: String): DataFrame = {
    val t = col(toksCol)
    val len = greatest(size(t) - 2, lit(0)) // slice throws on negatives
    df.select(cols :+ explode(arrays_zip(
      slice(t, lit(1), len).as("w1"),
      slice(t, lit(2), len).as("w2"),
      slice(t, lit(3), len).as("w3"))).as("tg"): _*)
      .select(cols :+ col("tg.w1").as("w1") :+ col("tg.w2").as("w2") :+
        col("tg.w3").as("w3"): _*)
  }

  /** Train the three count tables; all three are persisted — the score
    * plan reads the trigram table once, and the bigram AND unigram
    * tables twice each (numerator + lower-order denominator).
    */
  def fitTrigram(docs: DataFrame, toksCol: String): Model3 = {
    val tri = graft.engine.Caches.track(
      trigramTriples(docs, Seq.empty, toksCol)
        .groupBy(col("w1"), col("w2"), col("w3"))
        .agg(count(lit(1)).as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val bi = graft.engine.Caches.track(
      bigramPairs(docs, Seq.empty, toksCol)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val uni = graft.engine.Caches.track(
      docs.select(explode(col(toksCol)).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    // N = Σ unigram counts — identical to sum(size(toks)) over docs
    // (explode emits one row per token; empty/null arrays contribute 0
    // both ways) but reads the unigram table the score plan needs
    // anyway instead of re-scanning the corpus. coalesce: SUM over an
    // empty unigram table (empty corpus) is null.
    val n = uni.agg(coalesce(sum(col("c")), lit(0L)))
      .head().getLong(0)
    Model3(tri, bi, uni, n)
  }

  /** Per-document mean log Stupid-Backoff score over trigram
    * positions: S(w3|w1 w2) = c(w1w2w3)/c(w1w2) when the trigram was
    * seen, else alpha * S(w3|w2); S(w3|w2) = c(w2w3)/c(w2) when seen,
    * else alpha * S(w3); S(w3) = max(c(w3), 1)/N (the floor keeps
    * unseen words finite — Stupid Backoff scores are not normalized
    * probabilities to begin with). Five model-sized equi-joins, one
    * map-side-combined average; documents need >= 3 tokens.
    * Output: (idCol, n_trigrams, mean_log_s).
    */
  def stupidBackoff(docs: DataFrame, idCol: String, toksCol: String,
      m: Model3, alpha: Double = 0.4): DataFrame = {
    require(m.n > 0, "model was fit on an empty corpus (n = 0)")
    val triples = trigramTriples(docs, Seq(col(idCol)), toksCol)
    val joined = triples
      .join(m.trigrams.select(col("w1"), col("w2"), col("w3"),
        col("c").as("c3")), Seq("w1", "w2", "w3"), "left")
      .join(m.bigrams.select(col("w1"), col("w2"), col("c").as("c12")),
        Seq("w1", "w2"), "left")
      .join(m.bigrams.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c").as("c23")), Seq("w2", "w3"), "left")
      .join(m.unigrams.select(col("w").as("w2"), col("c").as("c2")),
        Seq("w2"), "left")
      .join(m.unigrams.select(col("w").as("w3"), col("c").as("c3u")),
        Seq("w3"), "left")
    val s1 = greatest(coalesce(col("c3u"), lit(0L)), lit(1L))
      .cast("double") / lit(m.n.toDouble)
    val s2 = when(coalesce(col("c23"), lit(0L)) > 0,
      col("c23").cast("double") / col("c2").cast("double"))
      .otherwise(lit(alpha) * s1)
    val s3 = when(coalesce(col("c3"), lit(0L)) > 0,
      col("c3").cast("double") / col("c12").cast("double"))
      .otherwise(lit(alpha) * s2)
    joined
      .select(col(idCol), log(s3).as("ls"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), avg(col("ls")).as("mean_log_s"))
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

  /** [[fit]] + [[perplexity]] over the SAME corpus with ONE tokenize:
    * the narrow (id, toks) projection is persisted, the model counts
    * aggregate from its bigram explode (dropping the id), and the
    * scoring probe re-explodes the same cached arrays — the
    * self-perplexity shape every CCNet-style filter runs. Output
    * matches `perplexity(docs, ..., fit(docs, ...))` exactly.
    */
  def fitScorePerplexity(docs: DataFrame, idCol: String, toksCol: String,
      k: Double = 1.0): DataFrame = {
    // `docs` is read three times (vocabulary count + model-count
    // aggregate + scoring probe), and its toks column is typically an
    // expensive tokenizer projection — persist the NARROW (id, toks)
    // projection unless the caller already persisted, so the corpus is
    // tokenized ONCE (the V count below runs first and populates the
    // cache). A derived select, not docs itself: persisting the
    // caller's handle in place is a side effect they can see. The pair
    // explode is NOT persisted — it is cheap column math over the
    // cached arrays, and caching the exploded one-row-per-pair table
    // costs more to write+read than re-running the explode (the tx20
    // lesson, re-measured here in r16).
    val src =
      if (docs.storageLevel == StorageLevel.NONE)
        graft.engine.Caches.track(docs.select(col(idCol), col(toksCol))
          .persist(StorageLevel.MEMORY_AND_DISK))
      else docs
    val pairs = bigramPairs(src, Seq(col(idCol)), toksCol)
    val bg = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val ctx = bg.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
    val v = src.select(explode(col(toksCol)).as("w")).distinct().count()
    val lp = log((coalesce(col("c"), lit(0L)).cast("double") + lit(k)) /
      (coalesce(col("c1"), lit(0L)).cast("double") + lit(k * v)))
    pairs
      .join(bg, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .select(col(idCol), lp.as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("lp")).as("mean_lp"),
        exp(-avg(col("lp"))).as("ppl"))
  }

  /** DSIR importance log-weight (mean_lp_target − mean_lp_reference,
    * Xie et al.) in ONE corpus pass instead of four. The naive
    * composition — fit target, fit reference, score under each —
    * explodes the corpus into bigram pairs four times; here the pairs
    * explode ONCE carrying a per-doc target flag, one aggregate yields
    * BOTH models' counts (`c_t` is a conditional sum over the same
    * groups as `c_r`), one countDistinct pass yields both vocabularies,
    * and one model-sized join scores both log-probabilities per pair.
    * The per-pair difference averages to exactly
    * mean_lp_t − mean_lp_r because both means run over the same pairs.
    *
    * `targetCol` is a boolean expression over `docs`' columns selecting
    * the target distribution. Smoothing matches [[perplexity]]:
    * add-k with each model's own vocabulary size.
    */
  def dsirLogRatio(docs: DataFrame, idCol: String, toksCol: String,
      targetCol: Column, k: Double = 1.0): DataFrame = {
    // flagged is read twice (vocabulary pass + pair explode) — persist
    // so the tokenizer projection under `docs` runs once (the eager
    // vocabulary head() below populates the cache first); same policy
    // as fitScorePerplexity.
    val flagged = graft.engine.Caches.track(
      docs.withColumn("_tgt", targetCol)
        .persist(StorageLevel.MEMORY_AND_DISK))
    // the pair explode is NOT persisted (tx20 lesson): both consumers
    // re-explode from the cached arrays, which is cheaper than
    // writing+reading a one-row-per-pair cache
    val pairs = bigramPairs(flagged, Seq(col(idCol), col("_tgt")), toksCol)
    val counts = pairs
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_r"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("c_t"))
    val ctx = counts.groupBy(col("w1"))
      .agg(sum(col("c_r")).as("c1_r"), sum(col("c_t")).as("c1_t"))
    val vRow = flagged
      .select(explode(col(toksCol)).as("w"), col("_tgt"))
      .agg(countDistinct(col("w")).as("vr"),
        countDistinct(when(col("_tgt"), col("w"))).as("vt"))
      .head()
    val (vR, vT) = (vRow.getLong(0), vRow.getLong(1))
    def lp(c: Column, c1: Column, v: Long) =
      log((coalesce(c, lit(0L)).cast("double") + lit(k)) /
        (coalesce(c1, lit(0L)).cast("double") + lit(k * v)))
    pairs
      .join(counts, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .select(col(idCol),
        lp(col("c_t"), col("c1_t"), vT).as("lp_t"),
        lp(col("c_r"), col("c1_r"), vR).as("lp_r"))
      .groupBy(col(idCol))
      // two means over the SAME pairs in one aggregate, subtracted
      // after — structurally identical to the two-model composition
      // (and to the oracle), so no float-order drift is introduced
      .agg(avg(col("lp_t")).as("mean_lp_t"), avg(col("lp_r")).as("mean_lp_r"))
      .select(col(idCol),
        (col("mean_lp_t") - col("mean_lp_r")).as("dsir_logw"))
  }
}
