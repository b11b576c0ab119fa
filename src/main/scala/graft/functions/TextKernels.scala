package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled one-pass kernels for the per-token feature math the quality
  * and language-ID queries run (token/length/alpha stats, marker-word
  * counts). The declarative formulations — `aggregate(transform(toks,
  * length))`, `filter(toks, rlike)`, one `filter` per marker set —
  * evaluate their lambdas interpreted, per token, per expression; these
  * kernels tokenize once and produce every count in a single compiled
  * loop. Value semantics are pinned equal to the declarative forms by
  * PropertySpec (token = `\s`-separated run, lengths in CODE POINTS to
  * match SQL `length`).
  */
object TokenStatsUtil {

  /** Java-regex `\s` (the TextFunctions.tokens contract). */
  @inline private[functions] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  /** (n_tokens, sum_token_len in code points, n_alpha_tokens) — the
    * inputs of mean token length and alphabetic-token fraction.
    */
  def tokenStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val len = s.length
    var n = 0
    var sumLen = 0L
    var nAlpha = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val st = i
      var alpha = false
      while (i < len && !isWs(s.charAt(i))) {
        if (isAlpha(s.charAt(i))) alpha = true
        i += 1
      }
      if (i > st) {
        n += 1
        sumLen += s.codePointCount(st, i)
        if (alpha) nAlpha += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(n, sumLen, nAlpha)
  }

  /** `regexp_count(text, "[^\\s]+")` as a compiled loop: the number of
    * maximal non-whitespace runs (Java `\s`, so `` IS whitespace
    * — the same engine semantics the regex form had).
    */
  def tokenCount(text: UTF8String): Int = {
    // scans the UTF-8 BYTES directly (no String copy per row): every
    // Java-\s char is a single ASCII byte, and multi-byte code points
    // consist of bytes >= 0x80 (negative as signed) which never equal
    // a whitespace byte — run boundaries land identically
    val len = text.numBytes()
    var n = 0
    var i = 0
    while (i < len) {
      while (i < len && isWsByte(text.getByte(i))) i += 1
      if (i < len) n += 1
      while (i < len && !isWsByte(text.getByte(i))) i += 1
    }
    n
  }

  @inline private def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  // ---- BPE-ish pretoken scanner (the tx10 pattern) ----
  // Hand-compiled form of
  //   '(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f]+|[ \t\n\r\f]+
  // (ASCII classes only, NO  in the whitespace class — it is
  // deliberately a symbol there, see the BpeIshPattern scaladoc). The
  // scanner reproduces the regex's leftmost-first alternation exactly:
  // at `'` try the seven contraction suffixes first; at a literal
  // space prefer the space-prefixed letter/digit/symbol run and fall
  // back to the whitespace run; PropertySpec pins equality against the
  // regex on adversarial and random inputs.

  // byte-level classes: every class char is ASCII, and multi-byte code
  // points consist of bytes >= 0x80 (negative as signed) which land in
  // the symbol class — exactly where the code-point classification put
  // them, so run boundaries (and counts) are identical with zero
  // String allocation per row
  @inline private def isBpeAlpha(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  @inline private def isBpeDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isBpeWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'
  @inline private def isBpeSym(b: Byte): Boolean =
    !isBpeAlpha(b) && !isBpeDigit(b) && !isBpeWs(b)

  /** Length of the contraction suffix at byte `i` (after `'`), or 0 —
    * alternation order s|t|re|ve|m|ll|d has no overlapping prefixes,
    * so first-match equals any-match.
    */
  @inline private def contractionLen(s: UTF8String, i: Int, len: Int): Int = {
    if (i >= len) return 0
    val b = s.getByte(i)
    if (b == 's' || b == 't' || b == 'm' || b == 'd') 1
    else if ((b == 'r' || b == 'v') &&
        i + 1 < len && s.getByte(i + 1) == 'e') 2
    else if (b == 'l' && i + 1 < len && s.getByte(i + 1) == 'l') 2
    else 0
  }

  /** The number of BPE-ish pretokens of `text` — equal to
    * `regexp_count(text, BpeIshPattern)` by PropertySpec.
    */
  def bpeTokenCount(text: UTF8String): Int = {
    val s = text
    val len = s.numBytes()
    var n = 0
    var i = 0
    while (i < len) {
      val c = s.getByte(i)
      n += 1
      if (c == '\'') {
        val cl = contractionLen(s, i + 1, len)
        if (cl > 0) i += 1 + cl
        else { // symbol run starting at the quote
          i += 1
          while (i < len && isBpeSym(s.getByte(i))) i += 1
        }
      } else if (c == ' ') {
        // leftmost-first: " X" prefers the space-prefixed run; a space
        // followed by whitespace (or end) is a whitespace-run token
        val next: Byte = if (i + 1 < len) s.getByte(i + 1) else ' '.toByte
        if (i + 1 < len && isBpeAlpha(next)) {
          i += 2
          while (i < len && isBpeAlpha(s.getByte(i))) i += 1
        } else if (i + 1 < len && isBpeDigit(next)) {
          i += 2
          while (i < len && isBpeDigit(s.getByte(i))) i += 1
        } else if (i + 1 < len && isBpeSym(next)) {
          i += 2
          while (i < len && isBpeSym(s.getByte(i))) i += 1
        } else {
          i += 1
          while (i < len && isBpeWs(s.getByte(i))) i += 1
        }
      } else if (isBpeAlpha(c)) {
        i += 1
        while (i < len && isBpeAlpha(s.getByte(i))) i += 1
      } else if (isBpeDigit(c)) {
        i += 1
        while (i < len && isBpeDigit(s.getByte(i))) i += 1
      } else if (isBpeWs(c)) {
        i += 1
        while (i < len && isBpeWs(s.getByte(i))) i += 1
      } else { // symbol (incl. non-ASCII and )
        i += 1
        while (i < len && isBpeSym(s.getByte(i))) i += 1
      }
    }
    n
  }

  /** Per-set counts of tokens that exactly equal a member of each word
    * set — `sets` is flattened as (offsets, words) for a serializable
    * literal; one tokenize pass serves every set.
    */
  def markerHits(text: UTF8String, sets: Array[java.util.HashSet[String]]): GenericArrayData = {
    val s = text.toString
    val len = s.length
    val out = new Array[Int](sets.length)
    var i = 0
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val st = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > st) {
        val tok = s.substring(st, i)
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(tok)) out(j) += 1
          j += 1
        }
      }
    }
    new GenericArrayData(out)
  }
}

/** struct(n_tokens INT, sum_token_len LONG, n_alpha_tokens INT). */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("n_alpha_tokens", IntegerType, nullable = false)))

  override def prettyName: String = "graft_token_stats"

  override def nullSafeEval(t: Any): Any =
    TokenStatsUtil.tokenStats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenStatsUtil.tokenStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<int> of marker-word counts, one element per word set. */
case class MarkerHitsKernel(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  // one shared lookup structure per executor-deserialized instance
  @transient private lazy val lookup: Array[java.util.HashSet[String]] =
    sets.map { ws =>
      val h = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(h.add)
      h
    }.toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_marker_hits"

  override def nullSafeEval(t: Any): Any =
    TokenStatsUtil.markerHits(t.asInstanceOf[UTF8String], lookup)

  // Whole-stage codegen: the marker sets ride along as a referenced
  // driver object (addReferenceObj), so the generated code calls the
  // same lambda-free hot loop as the interpreted path.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerSets", lookup,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenStatsUtil.markerHits($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** INT count of `\s`-separated tokens (compiled regexp_count form). */
case class TokenCountKernel(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"
  override def nullSafeEval(t: Any): Any =
    TokenStatsUtil.tokenCount(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenStatsUtil.tokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** INT count of BPE-ish pretokens (compiled BpeIshPattern scanner). */
case class BpeTokenCountKernel(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_token_count"
  override def nullSafeEval(t: Any): Any =
    TokenStatsUtil.bpeTokenCount(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenStatsUtil.bpeTokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernels {
  /** Column wrapper: struct(n_tokens, sum_token_len, n_alpha_tokens). */
  def tokenStats(text: Column): Column =
    ColumnShim.column(TokenStats(ColumnShim.expression(text)))

  /** Column wrapper: per-set marker-word counts in one tokenize pass. */
  def markerHits(text: Column, sets: Seq[Seq[String]]): Column =
    ColumnShim.column(MarkerHitsKernel(ColumnShim.expression(text), sets))

  /** Column wrapper: `regexp_count(text, "[^\\s]+")` as a kernel. */
  def tokenCount(text: Column): Column =
    ColumnShim.column(TokenCountKernel(ColumnShim.expression(text)))

  /** Column wrapper: BPE-ish pretoken count (the tx10 pattern). */
  def bpeTokenCount(text: Column): Column =
    ColumnShim.column(BpeTokenCountKernel(ColumnShim.expression(text)))
}
