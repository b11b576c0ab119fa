package graft.tsdb

/** Catalog label (de)serialization. The catalog stores one stream per
  * line as `vtype \t name \t k=v,k=v`, so a PromQL-legal label key or
  * value containing one of the structural characters (`=`, `,`, tab,
  * newline) would corrupt the line format — the reference treats label
  * values as opaque TEXT end-to-end
  * (tachyon_core/src/query/indexer.rs:136-149), so this codec must too.
  * Structural characters (plus `%`, the escape lead-in) are
  * percent-encoded exactly like Hive partition-dir escaping
  * ([[graft.sources.GraftSource.unescapePathName]]). Escaped catalogs
  * carry the [[V2Header]] marker line; a headerless catalog predates
  * escaping and parses RAW (a literal `%` there must never decode),
  * and is upgraded in place by the first write — so existing catalogs
  * keep their exact label values under either reader.
  *
  * Decoding is LOUD on malformed input: a catalog token without `=`
  * means the file was hand-edited or written by incompatible tooling,
  * and silently skipping it would mis-resolve label matchers — the
  * labelEq DSv2 prune would then drop series that should match
  * (silently wrong query results), which is strictly worse than
  * failing the scan with the offending line in hand.
  */
object LabelCodec {

  /** First line of an escaped catalog. A catalog WITHOUT it was written
    * before escaping existed and holds labels raw (`%` literal, no
    * structural chars possible) — decoding such a file with the v2
    * rules would silently mutate any value containing `%XX`, so
    * readers parse headerless catalogs raw and writers upgrade them
    * in place before the first v2 append (GraftDb.upgradeCatalog).
    */
  val V2Header = "#graft-catalog-v2"

  private val Escaped = "%=,\t\n\r"

  /** Percent-encode the structural characters of the catalog line. */
  def escape(s: String): String = {
    if (!s.exists(Escaped.contains(_))) return s
    val sb = new StringBuilder(s.length + 8)
    s.foreach { c =>
      if (Escaped.contains(c)) sb.append(f"%%${c.toInt}%02X")
      else sb.append(c)
    }
    sb.result()
  }

  /** Inverse of [[escape]] — the same `%XX` decode as Hive partition
    * values (any `%XX` is decoded, not just the escaped set).
    */
  def unescape(s: String): String =
    graft.sources.GraftSource.unescapePathName(s)

  /** [[escape]] as a Column — percent-encodes the structural set (`%`
    * first, then `=`, `,`, tab, LF, CR; uppercase hex), byte-for-byte
    * the string codec's output. Shared by the engine's `without`
    * canonical group key and the grouped-recording join keys, so the
    * three sites cannot drift.
    */
  def escapeCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, replace}
    Seq("%" -> "%25", "=" -> "%3D", "," -> "%2C",
        "\t" -> "%09", "\n" -> "%0A", "\r" -> "%0D")
      .foldLeft(c) { case (acc, (ch, enc)) => replace(acc, lit(ch), lit(enc)) }
  }

  /** A label MAP column → its canonical `k=v,k=v` string (sorted keys,
    * escaped) — [[encodeLabels]] as a Column; "" for the empty map.
    */
  def canonCol(m: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    array_join(transform(array_sort(map_keys(m)),
      k => concat(escapeCol(k), lit("="), escapeCol(element_at(m, k)))), ",")
  }

  /** Labels → the catalog's `k=v,k=v` field (sorted by key, escaped). */
  def encodeLabels(labels: Map[String, String]): String =
    labels.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${escape(k)}=${escape(v)}" }
      .mkString(",")

  /** The catalog's `k=v,k=v` field → labels. Loud on malformed tokens:
    * `context` names the offending line in the error. `v2 = false`
    * parses a pre-header catalog's field RAW (no `%XX` decode — the
    * legacy writer never escaped, so `%` is a literal there).
    */
  def decodeLabels(field: String, context: => String,
      v2: Boolean = true): Map[String, String] = {
    if (field.isEmpty) return Map.empty
    val pairs = field.split(",", -1).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty =>
          if (v2) unescape(k) -> unescape(v) else k -> v
        case _ => throw new IllegalStateException(
          s"malformed catalog label token '$kv' in: $context")
      }
    }
    // Loud on duplicate keys too: `a=1,a=2` can only come from a
    // hand-edited catalog (createStream parses PromQL first), and
    // silently keeping the last value would mis-resolve matchers.
    val dups = pairs.groupBy(_._1).collect { case (k, vs) if vs.length > 1 => k }
    if (dups.nonEmpty) throw new IllegalStateException(
      s"duplicate label key(s) ${dups.toSeq.sorted.mkString(", ")} in: $context")
    pairs.toMap
  }
}
