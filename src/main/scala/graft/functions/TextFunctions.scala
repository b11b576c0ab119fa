package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines.
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * codegen-friendly, no UDFs — and each has a direct portable-SQL
  * equivalent used by the DuckDB oracles (scripts/oracle_check.py).
  */
object TextFunctions {

  /** Whitespace tokenization as full regex matches (NOT split, whose
    * trailing-empty behavior differs across engines).
    */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("[^\\s]+"), lit(0))

  /** Sliding word n-gram shingles, space-joined. Empty when the document
    * has fewer than n tokens.
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** MinHash signature: k independent permutation proxies, each the
    * lexicographic min of md5(seed || shingle). md5 is bit-identical
    * across engines, which makes signatures portable to the oracle.
    */
  def minhashSig(shingles: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(shingles, s => md5(concat(lit(s"$j:"), s))))
    }: _*)

  /** LSH band keys: the signature split into `bands` equal rows-per-band
    * groups, each hashed to one bucket key.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|", slice(sig, b * rowsPerBand + 1, rowsPerBand)))
    }: _*)

  /** A 32-bit SimHash over a shingle array: each shingle hashes to 32
    * bits (first 8 md5 hex digits); bit i of the fingerprint is set when
    * the sum of (+1/-1) votes at position i is >= 0.
    */
  def simhash32(shingles: Column): Column = {
    val hashes = transform(shingles, s =>
      conv(substring(md5(s), 1, 8), 16, 10).cast("long"))
    val bits = (0 until 32).map { i =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, i).bitwiseAND(1) * 2 - 1))
      when(vote >= 0, lit(1L) * (1L << i)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Set-Jaccard of two pre-deduplicated string arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Marker-word count: how many tokens are in `words`. Language-ID
    * heuristic building block (exact token membership — regex-free, so
    * Java-regex vs RE2 differences can't bite).
    */
  def markerHits(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t)))
  }

  /** Winnowing-lite document fingerprint: lexicographic min of the md5s
    * of the document's word 3-gram shingles (stable under reordering of
    * unrelated edits far from the minimum).
    */
  def fingerprint(shingles: Column): Column =
    array_min(transform(shingles, s => md5(s)))
}
