package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: lay documents end-to-end in
  * a deterministic global order and cut fixed-capacity context windows
  * ("concat-and-cut" packing). Each document is assigned the bin where
  * its first token lands — `bin = exclusive-prefix-tokens / capacity` —
  * plus its offset inside that bin; a document longer than the
  * remaining bin space straddles into the next bin, exactly like the
  * token stream it models.
  *
  * Scale: the only global computation is the exclusive prefix sum,
  * done by the two-pass `RangeRank.globalCumSum` (range partition +
  * per-partition sequential pass + #partitions-row offset table) — no
  * single-partition window anywhere, deterministic under any
  * partitioning because the order is a total order.
  */
object Packing {

  /** Returns `df` plus (gcum, bin, bin_offset): exclusive prefix sum of
    * `weightCol`, the capacity bin where the row starts, and the offset
    * within it. `sortCols` must be a total order.
    */
  def pack(df: DataFrame, sortCols: Seq[Column], weightCol: String,
      capacity: Long, numPartitions: Int = 0): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    // `div`, not `/`: Column / is double division, which loses exactness
    // past 2^53 — token prefix sums at 100 TB scale live there
    RangeRank.globalCumSum(df, sortCols, weightCol, numPartitions)
      .withColumn("bin", expr(s"gcum div ${capacity}L"))
      .withColumn("bin_offset", pmod(col("gcum"), lit(capacity)))
  }

  /** Materialize the token text each span actually contributes — the
    * step that turns [[packSpans]]'s (doc, block, range) METADATA into
    * writable training content. Joins the span rows to the corpus on
    * the id and slices the span's token range back out of the
    * document; concatenating every block's `content` in stream order
    * reconstructs the packed token stream exactly (PackingSpec pins
    * this round trip).
    *
    * Scale: one equi-join on the id — both sides hash-partition, no
    * broadcast assumption (the corpus is the big side), AQE splits
    * skew. The corpus side tokenizes BEFORE the join, so each document
    * pays its tokenizer regex once, not once per straddled block; the
    * shuffle then carries token arrays instead of raw text — byte-wise
    * a wash, CPU-wise once-per-doc. The slice itself is row-local.
    *
    * Contract: `docs` must cover every span id and hold it ONCE. A
    * missing id fails LOUDLY (left join + raise_error — an inner join
    * would silently drop the span and corrupt the reconstructed
    * stream); a duplicate id is the caller's to prevent (detecting it
    * would cost an extra aggregation over the corpus — it duplicates
    * content rows, which the PackingSpec round-trip equality would
    * catch downstream).
    */
  def spanContent(spans: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, tokenizer: Column => Column): DataFrame =
    spans.join(
        docs.select(col(idCol), tokenizer(col(textCol)).as("_toks")),
        idCol :: Nil, "left")
      .withColumn("content",
        when(col("_toks").isNull, raise_error(concat(
          lit("spanContent: span references a document id absent from docs: "),
          col(idCol).cast("string"))))
        .otherwise(concat_ws(" ", slice(col("_toks"),
          (col("span_start") + 1).cast("int"), col("span_len").cast("int")))))
      .drop("_toks")

  /** The writer-side decomposition of [[pack]]: one row per (document,
    * context block) the document OVERLAPS — `bin` plus the half-open
    * token range [span_start, span_start + span_len) the document
    * contributes to it. A doc straddling block boundaries emits one row
    * per covered block, exactly the spans a training-sequence writer
    * materializes; concatenating every block's spans in (gcum) order
    * reconstructs the token stream. Rows with weight < 1 — zero, null,
    * or (upstream-bug) negative — contribute nothing and are dropped;
    * plain [[pack]] is the variant that surfaces them.
    *
    * Scale: after the two-pass prefix sum the block explode is
    * row-local, and each document emits at most weight/capacity + 1
    * rows — output is corpus-token-bound, never quadratic.
    */
  /** Packing-efficiency report over [[packSpans]]'s decomposition: one
    * row per context block with its composition — span count, whole-doc
    * vs head/tail/mid fragment mix, filled tokens, fill ratio.
    * Concat-and-cut leaves no intra-block padding, so every block but
    * the final one reports fill 1.0; what the report measures is
    * FRAGMENTATION — how many documents each block mixes and how many
    * straddle its boundaries, i.e. the attention-mask / cross-document-
    * leakage cost the packing discipline pays per block. The run report
    * a curation pipeline publishes next to dd19's cluster histogram.
    *
    * Scale: [[packSpans]]'s own shape plus ONE aggregate keyed on `bin`
    * (map-side combined, block-count output rows — corpus-token-bound
    * input, metadata-sized output).
    */
  def packReport(df: DataFrame, sortCols: Seq[Column], weightCol: String,
      capacity: Long, numPartitions: Int = 0): DataFrame = {
    val n = col(weightCol).cast("long")
    packSpans(df, sortCols, weightCol, capacity, numPartitions)
      .select(col("bin"), col("span_start"), col("span_len"), n.as("_n"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("span_len") === col("_n"), 1L).otherwise(0L))
          .as("n_whole"),
        sum(when(col("span_start") === 0 && col("span_len") < col("_n"), 1L)
          .otherwise(0L)).as("n_head"),
        sum(when(col("span_start") > 0 &&
            col("span_start") + col("span_len") === col("_n"), 1L)
          .otherwise(0L)).as("n_tail"),
        sum(when(col("span_start") > 0 &&
            col("span_start") + col("span_len") < col("_n"), 1L)
          .otherwise(0L)).as("n_mid"),
        sum(col("span_len")).as("filled"),
        (sum(col("span_len")).cast("double") / capacity).as("fill_ratio"))
  }

  def packSpans(df: DataFrame, sortCols: Seq[Column], weightCol: String,
      capacity: Long, numPartitions: Int = 0): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val n = col(weightCol).cast("long")
    val packed = pack(df.where(n >= 1), sortCols, weightCol, capacity,
        numPartitions)
      .withColumn("_last",
        expr(s"(gcum + cast($weightCol as bigint) - 1) div ${capacity}L"))
    packed
      .withColumn("bin", explode(sequence(col("bin"), col("_last"))))
      .withColumn("span_start",
        greatest(lit(0L), col("bin") * capacity - col("gcum")))
      .withColumn("span_len",
        least(n, (col("bin") + 1) * capacity - col("gcum")) -
          col("span_start"))
      .drop("_last", "bin_offset")
  }
}
