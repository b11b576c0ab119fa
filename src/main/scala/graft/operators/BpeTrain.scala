package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary TRAINING, distributed the way the
  * classic fast implementations are: BPE learns from the WORD-
  * FREQUENCY table, not the running text — so the corpus is read
  * exactly once (a map-side-combined word count), and every merge
  * round runs over the vocab-bound table. At 100 TB the corpus pass
  * dominates and is unavoidable; the loop's per-round cost is
  * |vocab| × mean word length, independent of corpus size.
  *
  * Per round: explode each word's adjacent symbol pairs weighted by
  * the word count (map-side combined), take the argmax pair (ONE
  * 1-row collect; ties break lexicographically so training is
  * deterministic), and apply the merge row-locally — a fold over the
  * symbol array (leftmost-first, non-overlapping, textbook BPE).
  * Encoding new text joins its words against [[encodeWords]]' output
  * (each distinct word encoded once), never re-running merges per
  * occurrence.
  */
object BpeTrain {

  /** A learned merge: adjacent (a, b) -> a+b, with its weighted count
    * at the round it was learned.
    */
  final case class Merge(a: String, b: String, count: Long)

  /** (word, n) frequency table from a tokenized corpus — the one
    * corpus-sized job in BPE training.
    */
  def wordCounts(docs: DataFrame, toksCol: String): DataFrame =
    docs.select(explode(col(toksCol)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Initial symbol sequence of a word: its characters. (split on the
    * empty pattern keeps a trailing "" under Spark's limit=-1 — drop
    * empties.)
    */
  private def chars(word: Column): Column =
    filter(split(word, ""), s => s =!= "")

  /** Leftmost-first, non-overlapping replacement of adjacent (a, b)
    * with a+b in a symbol array — a row-local fold with a one-symbol
    * carry. Interpreted HOF, but it only ever runs on the vocab table.
    */
  private def applyMerge(syms: Column, a: String, b: String): Column = {
    val folded = aggregate(
      syms,
      struct(array().cast("array<string>").as("out"), lit("").as("carry")),
      (acc, s) => {
        val out = acc.getField("out")
        val carry = acc.getField("carry")
        when(carry === lit(a) && s === lit(b),
          struct(concat(out, array(lit(a + b))).as("out"), lit("").as("carry")))
          .otherwise(struct(
            when(carry === "", out).otherwise(concat(out, array(carry)))
              .as("out"),
            s.as("carry")))
      })
    when(folded.getField("carry") === "", folded.getField("out"))
      .otherwise(concat(folded.getField("out"),
        array(folded.getField("carry"))))
  }

  /** Learn `nMerges` merges from a (word, n) table. Each round is one
    * vocab-sized job; the running symbolization is persisted and
    * localCheckpoint'd every few rounds so the plan does not grow with
    * the merge count.
    */
  def fit(words: DataFrame, nMerges: Int): Seq[Merge] = {
    // localCheckpoint both caches and truncates lineage — the plan
    // must not grow by one fold per learned merge
    var syms = words
      .select(chars(col("word")).as("syms"), col("n"))
      .localCheckpoint(eager = true)
    val merges = Seq.newBuilder[Merge]
    var exhausted = false
    for (_ <- 0 until nMerges if !exhausted) {
      val top = syms
        .select(posexplode(slice(col("syms"), lit(1), size(col("syms")) - 1))
          .as(Seq("i", "a")), col("syms"), col("n"))
        .select(col("a"),
          element_at(col("syms"), col("i") + 2).as("b"), col("n"))
        .groupBy(col("a"), col("b")).agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every word is one symbol
      else {
        val m = Merge(top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += m
        val prev = syms
        syms = prev
          .select(applyMerge(col("syms"), m.a, m.b).as("syms"), col("n"))
          .localCheckpoint(eager = true)
        prev.unpersist(blocking = false)
      }
    }
    syms.unpersist(blocking = false)
    merges.result()
  }

  /** Encode each distinct word of a (word, ...) table with the learned
    * merges, in training order — the output (word, syms) joins against
    * a tokenized corpus to encode it without per-occurrence work.
    */
  def encodeWords(words: DataFrame, merges: Seq[Merge]): DataFrame =
    words.select(col("word"),
      merges.foldLeft(chars(col("word"))) { (c, m) =>
        applyMerge(c, m.a, m.b)
      }.as("syms"))
}
