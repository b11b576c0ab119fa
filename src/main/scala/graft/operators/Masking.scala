package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-objective prep: span corruption (the T5/UL2 denoising
  * objective — Raffel et al. 2020 §3.1.4). Each document's token list
  * becomes an (input, targets) pair: masked spans are replaced by
  * numbered sentinels in the input, and the targets string is each
  * sentinel followed by the tokens it hid.
  *
  * The paper samples span starts sequentially with an RNG — a per-doc
  * sequential scan that neither parallelizes nor reproduces across
  * engines. This is the distributed re-design: tokens are divided into
  * fixed blocks of `block` tokens, and each block masks ONE `span`-token
  * run whose offset is a 60-bit content hash of (seed, doc id, block
  * index) — the same md5 basis every other curation decision in this
  * library uses (Sampling.keyHash). Corruption density is span/block on
  * full blocks, spans can never overlap or cross block boundaries, and
  * the output is bit-identical on any cluster layout, partition count,
  * or engine. A tail block shorter than `span` passes through unmasked.
  *
  * Scale: entirely row-local — per-block math inside one
  * transform/slice/flatten chain, no shuffle, no window, no state;
  * 100 TB of documents is a single scan→project codegen pipeline.
  */
object Masking {

  /** Adds `masked_input`, `targets` (space-joined strings) and
    * `n_masked` (masked token count) to `df`. Empty or null token lists
    * yield empty strings and 0.
    *
    * @param idCol  stable document key the mask decision is hashed on
    * @param block  tokens per block (one span masked per full block)
    * @param span   masked run length, 1 <= span <= block
    * @param seed   salt so independent corruption passes decorrelate
    */
  def spanCorrupt(df: DataFrame, idCol: String, toksCol: String,
      block: Int = 16, span: Int = 3, seed: String = "span"): DataFrame = {
    require(block >= 1, s"block must be >= 1, got $block")
    require(span >= 1 && span <= block,
      s"span must be in [1, block], got $span (block $block)")
    val toks = col(toksCol)
    val n = size(toks)
    val nBlocks = expr(s"(size(`$toksCol`) + ${block - 1}) div $block")
      .cast("int")
    val blocks = transform(sequence(lit(0), nBlocks - 1), k => {
      val bs = k * block                       // 0-based block start
      val bl = least(lit(block), n - bs)       // block length
      val h = conv(substring(md5(concat_ws(":",
        lit(seed), col(idCol).cast("string"), k.cast("string"))),
        1, 15), 16, 10).cast("long")
      val off = pmod(h, (bl - span + 1).cast("long")).cast("int")
      val sentinel = concat(lit("<extra_id_"), k.cast("string"), lit(">"))
      when(bl >= span, struct(
        concat(slice(toks, bs + 1, off), array(sentinel),
          slice(toks, bs + off + span + 1, bl - off - span)).as("inp"),
        concat(array(sentinel), slice(toks, bs + off + 1, lit(span)))
          .as("tgt")))
        .otherwise(struct(slice(toks, bs + 1, bl).as("inp"),
          lit(null).cast("array<string>").as("tgt")))
    })
    // blocks materialized in its own Project: three consumers below
    // would otherwise each inline (and re-run) the per-block md5 pass
    val staged = df.withColumn("_blocks", when(n >= 1, blocks))
    // flatten() propagates a null ELEMENT to a null result — tail
    // blocks' null tgt entries must be filtered out first
    val inps = flatten(transform(col("_blocks"), b => b.getField("inp")))
    val tgts = flatten(filter(
      transform(col("_blocks"), b => b.getField("tgt")), t => t.isNotNull))
    staged
      .withColumn("masked_input",
        when(n >= 1, array_join(inps, " ")).otherwise(""))
      .withColumn("targets",
        when(n >= 1, array_join(tgts, " ")).otherwise(""))
      .withColumn("n_masked",
        // tgts holds exactly (span + 1) elements per masked block
        // (sentinel + span tokens), so the division below is exact
        when(n >= 1, (size(tgts) / (span + 1)).cast("int") * span)
          .otherwise(0))
      .drop("_blocks")
  }
}
