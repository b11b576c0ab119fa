package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise sum of DOUBLE arrays as a native typed aggregate.
  *
  * The declarative alternative — `posexplode` into (group, dim, x) rows
  * and a (group, dim) hash aggregate — multiplies the aggregate input by
  * the vector dimensionality (64x for the embeddings table) and shuffles
  * dim scalar rows per group per partition. This aggregate keeps each
  * vector as ONE input row, map-side combines into a single mutable
  * `Array[Double]` per group, and shuffles one array per group per
  * partition: the partial state is dim doubles either way, but the row
  * count (and per-row agg-map probe cost) drops by the dim factor.
  *
  * Used by the centroid primitives (`ann03`, `IvfIndex.fit`) where the
  * group count is data-bound (labels, cells) and dims are fixed per
  * corpus. Dimension mismatches between rows of one group throw rather
  * than silently truncate. Null and empty arrays are skipped (an
  * all-null group evaluates to null, matching `sum`'s convention).
  */
case class VectorSum(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_sum"

  // zero-length buffer = "no input seen yet" (dims unknown until then)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return buf
    val b = if (buf.length == 0) new Array[Double](n) else buf
    if (b.length != n) throw new IllegalArgumentException(
      s"graft_vec_sum: vector length $n != ${b.length} within one group")
    var i = 0
    while (i < n) { b(i) += arr.getDouble(i); i += 1 }
    b
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b2.length == 0) return b1
    if (b1.length == 0) return b2
    if (b1.length != b2.length) throw new IllegalArgumentException(
      s"graft_vec_sum: partial lengths ${b1.length} != ${b2.length}")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}

/** Bounded top-k by score as a native typed aggregate: keeps the k
  * best (score, id) pairs in a size-k min-heap per group, map-side
  * combined — the scale-safe shape for per-group top-k.
  *
  * The declarative alternative — a window `row_number() <= k`
  * partitioned by the group — shuffles EVERY input row to at most
  * #groups reducers; with few groups (a batch of query vectors, a
  * handful of categories) that serializes the whole corpus through a
  * handful of tasks. This aggregate reduces each partition to at most
  * k pairs per group before the exchange, so the shuffle carries
  * #groups x #partitions x k rows regardless of corpus size.
  *
  * Input: struct(score double, id bigint). Output: array of the same
  * structs, sorted score-descending with ascending-id tie-break (a
  * total order, so results are deterministic). Null inputs and null
  * struct fields are skipped.
  */
case class TopKByScore(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with UnaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("score", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_top_k_by_score"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        buf.offer(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(b1: TopKHeap, b2: TopKHeap): TopKHeap = { b1.absorb(b2); b1 }

  override def eval(buf: TopKHeap): Any = {
    if (buf.size == 0) return null
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKHeap): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap = TopKHeap.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKByScore =
    copy(child = newChild)
}

/** Size-bounded min-heap on (score asc, id desc) so the root is the
  * WORST kept pair — an incoming pair replaces the root iff it beats it
  * under the (score desc, id asc) result order.
  */
final class TopKHeap(val k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  def size: Int = n

  // "a is worse than b" under the result order (score desc, id asc)
  private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def offer(s: Double, id: Long): Unit = {
    if (n < k) {
      scores(n) = s; ids(n) = id; n += 1
      var i = n - 1 // sift up
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def absorb(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.n) { offer(other.scores(i), other.ids(i)); i += 1 }
  }

  def sortedDesc: Array[(Double, Long)] =
    (0 until n).map(i => (scores(i), ids(i))).toArray
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * n)
    bb.putInt(k); bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val h = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { val s = bb.getDouble(); val id = bb.getLong(); h.offer(s, id); i += 1 }
    h
  }
}

object VectorAggregates {
  /** Aggregate Column: element-wise sum of an ARRAY<DOUBLE> column. */
  def vecSum(c: Column): Column =
    ColumnShim.column(VectorSum(ColumnShim.expression(c)).toAggregateExpression())

  /** Aggregate Column: the k best (score, id) pairs per group, sorted
    * score-descending / id-ascending. `c` must be struct(score, id).
    */
  def topKByScore(c: Column, k: Int): Column =
    ColumnShim.column(
      TopKByScore(ColumnShim.expression(c), k).toAggregateExpression())
}
