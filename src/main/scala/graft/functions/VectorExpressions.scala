package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path: dot product of
  * two DOUBLE arrays with whole-stage codegen. The `zip_with` +
  * `aggregate` composition allocates an intermediate array per row; this
  * generates a primitive loop instead — the difference is ~3x on the
  * 13M-pair sf0.1 near-dup join.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers guarantee ARRAY<DOUBLE> inputs (Knn/Dedup cast upstream).
  // ExpectsInputTypes can't be mixed in from outside the sql package
  // (its input-type alphabet is private[sql]); wrong types surface as an
  // analysis-time resolution failure on this expression instead.
  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Merge-count of common elements between two SORTED distinct LONG
  * arrays. The built-in `array_intersect` materializes a hash set per
  * call; for the near-dup verification joins (millions of pairs x
  * ~300-element arrays) the two-pointer merge is several times cheaper
  * and allocation-free. Callers must sort upstream (one array_sort per
  * document vs. a hash set per pair).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var cnt = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { cnt += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $cnt++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static hot loops behind [[IvfNearestKernel]]. */
object IvfKernelUtil {

  /** argmin over cells of `-2 v·c + |c|²` — ties to the SMALLER cell id
    * (strict less-than scanning cells in ascending-id order, the fold
    * semantics of the declarative formulation this replaced). Returns
    * -1 for an empty model. Dot matches [[DotProduct]]: ascending-index
    * sum over min(|v|, |c|) elements.
    */
  def nearestCell(vec: ArrayData, ids: Array[Int],
      cents: Array[Array[Double]], norms: Array[Double]): Int = {
    val n = vec.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = vec.getDouble(i); i += 1 }
    var best = -1
    var bestScore = Double.PositiveInfinity
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      val m = math.min(n, c.length)
      var acc = 0.0
      var j = 0
      while (j < m) { acc += v(j) * c(j); j += 1 }
      val score = -2.0 * acc + norms(k)
      if (score < bestScore) { bestScore = score; best = ids(k) }
      k += 1
    }
    best
  }

  /** The min(nProbe, k) nearest cell ids, nearest first, ties to the
    * smaller id — the (score, cell) lexicographic order of the
    * declarative `array_sort` formulation (cells scanned ascending by
    * id, so strictly-less insertion preserves id order among equal
    * scores).
    */
  def nearestCells(vec: ArrayData, ids: Array[Int],
      cents: Array[Array[Double]], norms: Array[Double],
      nProbe: Int): GenericArrayData = {
    // nProbe <= 0 yields no cells (the slice(…, 1, 0) semantics of the
    // declarative form), not an insertion at index -1
    if (nProbe <= 0 || cents.isEmpty)
      return new GenericArrayData(Array.emptyIntArray)
    val n = vec.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = vec.getDouble(i); i += 1 }
    val cap = math.min(nProbe, cents.length)
    val bestS = new Array[Double](cap)
    val bestId = new Array[Int](cap)
    var size = 0
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      val m = math.min(n, c.length)
      var acc = 0.0
      var j = 0
      while (j < m) { acc += v(j) * c(j); j += 1 }
      val score = -2.0 * acc + norms(k)
      if (size < cap || score < bestS(size - 1)) {
        // insertion position: after every entry with score <= this one
        // (ascending-id scan makes that the tie rule)
        var p = if (size < cap) size else size - 1
        while (p > 0 && bestS(p - 1) > score) {
          bestS(p) = bestS(p - 1); bestId(p) = bestId(p - 1); p -= 1
        }
        bestS(p) = score; bestId(p) = ids(k)
        if (size < cap) size += 1
      }
      k += 1
    }
    new GenericArrayData(bestId)
  }
}

/** Nearest-centroid assignment as ONE compiled loop per row. The
  * declarative `aggregate`/`transform` formulation evaluates its lambda
  * INTERPRETED per centroid element (higher-order functions sit outside
  * whole-stage codegen), which at autoK cell counts (~n/128 cells) made
  * IVF assignment lambda-overhead-bound. The centroid matrix rides
  * along as a codegen reference object. nProbe == 1 → INT cell id
  * (argmin, -1 on an empty model); nProbe > 1 → ARRAY<INT> of the
  * min(nProbe, k) nearest ids, nearest first, ties to the smaller id —
  * both pinned equal to the declarative forms by PropertySpec.
  */
case class IvfNearestKernel(child: Expression,
    cells: Seq[(Int, Seq[Double])], nProbe: Int) extends UnaryExpression {

  @transient private lazy val ids: Array[Int] =
    cells.map(_._1).toArray
  @transient private lazy val cents: Array[Array[Double]] =
    cells.map(_._2.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

  override def dataType: DataType =
    if (nProbe == 1) org.apache.spark.sql.types.IntegerType
    else ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def prettyName: String = "graft_ivf_nearest"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (nProbe == 1) IvfKernelUtil.nearestCell(v, ids, cents, norms)
    else IvfKernelUtil.nearestCells(v, ids, cents, norms, nProbe)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ivfIds", ids, "int[]")
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
    if (nProbe == 1)
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.IvfKernelUtil.nearestCell($c, $idsRef, $centsRef, $normsRef)")
    else
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.IvfKernelUtil.nearestCells($c, $idsRef, $centsRef, $normsRef, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column wrapper for DotProduct. */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column wrapper for SortedLongIntersectCount. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnShim.column(SortedLongIntersectCount(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column wrapper for IvfNearestKernel: `cells` as (id, centroid)
    * pairs sorted ascending by id.
    */
  def ivfNearest(vec: Column, cells: Seq[(Int, Seq[Double])],
      nProbe: Int): Column =
    ColumnShim.column(IvfNearestKernel(ColumnShim.expression(vec), cells, nProbe))
}
