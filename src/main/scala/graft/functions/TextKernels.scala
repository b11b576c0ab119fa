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

object TextKernels {
  /** Column wrapper: struct(n_tokens, sum_token_len, n_alpha_tokens). */
  def tokenStats(text: Column): Column =
    ColumnShim.column(TokenStats(ColumnShim.expression(text)))

  /** Column wrapper: per-set marker-word counts in one tokenize pass. */
  def markerHits(text: Column, sets: Seq[Seq[String]]): Column =
    ColumnShim.column(MarkerHitsKernel(ColumnShim.expression(text), sets))
}
