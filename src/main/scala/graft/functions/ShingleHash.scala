package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tokenize → word-n-gram → md5-60-bit hash kernel.
  *
  * Semantically identical to the declarative composition
  * `shingleHashes(wordShingles(tokens(text), n))` in [[TextFunctions]]
  * (the DuckDB oracle SQL mirrors are unchanged), but executed as a
  * single compiled loop. The lambda-based composition is a chain of
  * higher-order functions (`transform`, `concat_ws`, `conv`) that
  * Catalyst evaluates interpreted — measured ~18 microseconds per
  * shingle, which at corpus scale is the dominant CPU cost of every
  * dedup/fingerprint operator. This kernel hashes token bytes straight
  * into a reused MessageDigest (no shingle string is ever built) and
  * returns the sorted distinct 60-bit values.
  */
object ShingleHashUtil {
  private val Digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Java-regex `\s` (the tokenizer contract of TextFunctions.tokens). */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** POSITIONAL 60-bit hashes (first 15 md5 hex digits) of the
    * space-joined word n-gram shingles of `text`, one per gram start —
    * no dedup, no sort. Empty when the text has fewer than n tokens.
    */
  private[functions] def gramHashes60(text: UTF8String, n: Int): Array[Long] = {
    val s = text.toString
    val len = s.length
    val toks = new java.util.ArrayList[Array[Byte]](len / 6 + 1)
    var i = 0
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val st = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > st) toks.add(s.substring(st, i).getBytes(StandardCharsets.UTF_8))
    }
    val m = toks.size - (n - 1)
    if (m <= 0) return Array.empty[Long]
    val out = new Array[Long](m)
    val md = Digest.get()
    var k = 0
    while (k < m) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks.get(k + j))
        j += 1
      }
      val d = md.digest()
      // first 15 hex digits = first 60 bits, big-endian
      out(k) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      k += 1
    }
    out
  }

  /** Sorted distinct 60-bit hashes (first 15 md5 hex digits) of the
    * space-joined word n-gram shingles of `text`. Empty array when the
    * text has fewer than n tokens.
    */
  def shingleHashes60(text: UTF8String, n: Int): ArrayData = {
    val out = gramHashes60(text, n)
    val m = out.length
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < m) {
      if (out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == m) out else java.util.Arrays.copyOf(out, w))
  }
}

object WinnowHashUtil {
  import ShingleHashUtil.gramHashes60

  /** Distinct winnowing fingerprints (Schleimer et al.): positional
    * k-gram 60-bit hashes, minimum per w-wide window, deduplicated.
    * Tail rule: k <= tokens < k+w-1 emits the single min-gram
    * fingerprint; under k tokens emits nothing. One compiled pass —
    * the declarative formulation (nested `transform` over `slice` +
    * `array_min`) is interpreted per element with O(n·k) array copies,
    * measured 25s at sf0.1 vs sub-second for this kernel.
    */
  def winnowHashes60(text: UTF8String, k: Int, w: Int): ArrayData = {
    val grams = gramHashes60(text, k)
    val m = grams.length
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    if (m < w) {
      var mn = grams(0)
      var i = 1
      while (i < m) { if (grams(i) < mn) mn = grams(i); i += 1 }
      return new GenericArrayData(Array(mn))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long](m / w * 2 + 4)
    var i = 0
    while (i + w <= m) {
      var mn = grams(i)
      var j = 1
      while (j < w) { if (grams(i + j) < mn) mn = grams(i + j); j += 1 }
      seen.add(mn)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }
}

object SimhashUtil {
  /** 60-bit SimHash of an array of 60-bit shingle hashes: per-bit ±1
    * votes over the array, bit set iff votes >= 0 — bit-identical to
    * the explode + `sum(shiftright(h, i) & 1) * 2 - 1) >= 0` aggregate
    * formulation it replaces, but row-local: the aggregate shape
    * shuffles every (id, hash) pair and runs 60 sums per group, where
    * this is one compiled pass over the row's own hashes with NO
    * exchange at all. Callers exclude empty arrays (shingleBase does);
    * an empty input returns 0L.
    */
  def simhash60(hs: ArrayData): Long = {
    val n = hs.numElements()
    if (n == 0) return 0L
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) >= 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

object MinhashUtil {
  import TextFunctions.{minhashA, minhashB, Mask28, MinhashPrime}

  /** MinHash signature over 60-bit shingle hashes: k affine permutations
    * h_j = (a_j * (h & mask28) + b_j) mod p, min-reduced — the same math
    * as `TextFunctions.minhashSig`, in one compiled loop. Round 1
    * measured the per-row LAMBDA formulation 25x slower than the
    * explode+agg shape (the expression tree fell out of whole-stage
    * codegen); this kernel beats both — row-local like the lambdas
    * (no (id, hash) shuffle at all) and compiled like the aggregate.
    * Empty input yields a MaxValue-filled signature (callers exclude
    * empty-shingle docs, as shingleBase does).
    */
  def minhashSig(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h28 = hs.getLong(i) & Mask28
      var j = 0
      while (j < k) {
        val v = (h28 * minhashA(j) + minhashB(j)) % MinhashPrime
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** MinHash-signature kernel wrapper — see [[MinhashUtil.minhashSig]]. */
case class MinhashSig60(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash_sig60"

  override def nullSafeEval(t: Any): Any =
    MinhashUtil.minhashSig(t.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashUtil.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash kernel wrapper — see [[SimhashUtil.simhash60]]. */
case class Simhash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash60"

  override def nullSafeEval(t: Any): Any =
    SimhashUtil.simhash60(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimhashUtil.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing-fingerprint kernel wrapper — see [[WinnowHashUtil]]. */
case class WinnowHash60(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_winnow_hash60"

  override def nullSafeEval(t: Any): Any =
    WinnowHashUtil.winnowHashes60(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowHashUtil.winnowHashes60($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Catalyst expression wrapper for [[ShingleHashUtil.shingleHashes60]]:
  * stays inside whole-stage codegen (the generated code is one static
  * call), unlike the higher-order-function composition it replaces.
  */
case class ShingleHash60(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hash60"

  override def nullSafeEval(t: Any): Any =
    ShingleHashUtil.shingleHashes60(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashUtil.shingleHashes60($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash {
  /** Column wrapper: sorted distinct 60-bit word-n-gram shingle hashes. */
  def shingleHashes60(text: Column, n: Int): Column =
    ColumnShim.column(ShingleHash60(ColumnShim.expression(text), n))

  /** Column wrapper: distinct winnowing fingerprints (k-gram hashes,
    * min per w-window) — see [[WinnowHashUtil.winnowHashes60]].
    */
  def winnowHashes60(text: Column, k: Int, w: Int): Column =
    ColumnShim.column(WinnowHash60(ColumnShim.expression(text), k, w))

  /** Column wrapper: 60-bit SimHash of a shingle-hash array. */
  def simhash60(hs: Column): Column =
    ColumnShim.column(Simhash60(ColumnShim.expression(hs)))

  /** Column wrapper: k-element MinHash signature of a shingle-hash
    * array — see [[MinhashUtil.minhashSig]].
    */
  def minhashSig60(hs: Column, k: Int): Column =
    ColumnShim.column(MinhashSig60(ColumnShim.expression(hs), k))
}
