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

  /** Token COUNT without materializing the token substrings — use this
    * when only the count is needed. Compiled one-pass kernel
    * (PropertySpec pins it equal to `regexp_count(text, "[^\\s]+")`,
    * the form it replaces).
    */
  def tokenCount(text: Column): Column =
    TextKernels.tokenCount(text)

  /** The heuristic quality score in [0, 1] that tx03 reports, sp03
    * weights its sample by, and the curation pipeline gates on — length,
    * digit density, and mean token length mixed 50/30/20. One shared
    * column expression so the three stay bit-identical (the DuckDB
    * oracles mirror the same formula).
    */
  def qualityScore(text: Column): Column = {
    // token stats from the compiled kernel (PropertySpec pins it equal
    // to the aggregate/transform lambda formulation, unicode included)
    val st = TextKernels.tokenStats(text)
    val nTok = st.getField("n_tokens").cast("double")
    val avgLen = st.getField("sum_token_len").cast("double") / nTok
    val digits = size(regexp_extract_all(text, lit("[0-9]"), lit(0)))
      .cast("double") / length(text).cast("double")
    least(lit(1.0), nTok / 200.0) * 0.5 +
      (lit(1.0) - digits) * 0.3 + least(lit(1.0), avgLen / 8.0) * 0.2
  }

  /** Sliding word n-gram shingles, space-joined. Empty when the document
    * has fewer than n tokens.
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Fixed-size token chunks with overlap — the context-window split of
    * a training pipeline: chunk i covers tokens [i*stride, i*stride +
    * chunkSize), space-rejoined; the last chunk may be shorter. Start
    * generation stops once a chunk reaches the document end — a further
    * start would emit a pure suffix of the previous chunk, feeding its
    * tail tokens to training twice (the largest start is the smallest
    * stride multiple s with s + chunkSize >= n). Empty token lists
    * yield no chunks. Row-local — no shuffle at any corpus size.
    */
  def tokenChunks(toks: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    val lastStart = greatest(size(toks) - (chunkSize - stride) - 1, lit(0))
    when(size(toks) <= 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), lastStart, lit(stride)),
        s => concat_ws(" ", slice(toks, s + 1, lit(chunkSize)))))
  }

  /** 60-bit integer hash per shingle (first 15 md5 hex digits) —
    * bit-identical across engines. All downstream set/sketch ops work on
    * these longs: integer arrays shuffle and intersect far cheaper than
    * the shingle strings.
    *
    * IMPORTANT for callers: materialize the result in its own column
    * (`withColumn`) before fanning out into k signature expressions —
    * Catalyst inlines non-materialized sub-expressions into every
    * consumer, recomputing the md5 pass k times (a measured 4x
    * regression at sf0.1).
    */
  def shingleHashes(shingles: Column): Column =
    array_sort(array_distinct(transform(shingles, s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long"))))

  /** Affine-permutation MinHash constants: a_j bounded so a_j * h28 stays
    * well inside Long (h28 < 2^28, a_j < 2^18). Shared with the DuckDB
    * oracle SQL generators.
    */
  val MinhashPrime = 2147483647L
  val Mask28 = 268435455L // 2^28 - 1
  def minhashA(j: Int): Long = 100003L + 7919L * j
  def minhashB(j: Int): Long = 40009L + 104729L * j

  /** MinHash signature over pre-materialized shingle hashes: k affine
    * permutations h_j = (a_j*(h & mask28) + b_j) mod p, min-reduced.
    * One md5 pass total (in shingleHashes), then pure integer math.
    */
  def minhashSig(hashes: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(hashes, h =>
        (h.bitwiseAND(Mask28) * minhashA(j) + minhashB(j)) % MinhashPrime))
    }: _*)

  /** LSH band keys: the signature split into `bands` equal rows-per-band
    * groups, each hashed to one bucket key.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        transform(slice(sig, b * rowsPerBand + 1, rowsPerBand),
          h => h.cast("string"))))
    }: _*)

  /** A 32-bit SimHash over pre-materialized shingle hashes (see
    * shingleHashes): bit i of the fingerprint is set when the sum of
    * (+1/-1) votes from the shingle hashes' bit i is >= 0.
    */
  def simhash32(hashes: Column): Column = {
    val bits = (0 until 32).map { i =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, i).bitwiseAND(1) * 2 - 1))
      when(vote >= 0, lit(1L << i)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Set-Jaccard of two pre-deduplicated string arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Set-Jaccard of two SORTED distinct long arrays (shingleHashes
    * output): one merge-count, |A∪B| derived as |A|+|B|-|A∩B| — no hash
    * sets, no second pass.
    */
  def jaccardSorted(a: Column, b: Column): Column = {
    val inter = VectorExpressions.sortedIntersectCount(a, b).cast("double")
    inter / (size(a) + size(b) - inter)
  }

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

  /** WITHIN-document repeated-line removal (the C4/Gopher boilerplate
    * rule; cross-document frequency is `Dedup.dedupLines`' job): keep
    * each line's FIRST occurrence, preserving order. Row-local fold —
    * no shuffle, no state beyond the document's own lines; the
    * interpreted HOF is fine because the per-row work is lines², with
    * lines small by construction.
    */
  def dedupLinesWithin(text: Column): Column =
    array_join(
      aggregate(split(text, "\n"), array().cast("array<string>"),
        (acc, l) => when(array_contains(acc, l), acc)
          .otherwise(concat(acc, array(l)))),
      "\n")

  /** Latin-1/Latin-Extended accent fold map — a FIXED table, so both
    * engines (and any re-run) normalize identically; ICU-style locale
    * folding would make the dedup key engine-version-dependent.
    */
  private val AccentFrom =
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿāăąćčďēĕėęěğīĭįıłńňōŏőœřśšťūŭůűųźżž"
  private val AccentTo =
    "aaaaaaceeeeiiiinooooouuuuyyaaaccdeeeeegiiiilnnoooorsstuuuuuzzz"

  /** Canonical text normalization — the pre-dedup / pre-fingerprint
    * key transform (lowercase, fold the fixed accent table, collapse
    * whitespace runs, trim). Row-local column math; the SAME transform
    * must produce the SAME bytes on every engine and run, which is why
    * the fold table is a fixed literal (tx22's DuckDB oracle applies
    * the identical translate) rather than locale-aware ICU folding.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      translate(lower(text), AccentFrom, AccentTo), "\\s+", " "))

  /** Tag-stripping text extraction for HTML-ish payloads: drop tags,
    * decode the five predefined entities (amp last, so double-encoded
    * text decodes one level only), collapse runs of whitespace. All
    * row-local regexp/replace column math — format extraction at
    * 100 TB is a pure scan.
    */
  def stripHtml(html: Column): Column = {
    val noTags = regexp_replace(html, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&").foldLeft(noTags) {
      case (c, (e, ch)) => replace(c, lit(e), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
