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

object VectorAggregates {
  /** Aggregate Column: element-wise sum of an ARRAY<DOUBLE> column. */
  def vecSum(c: Column): Column =
    ColumnShim.column(VectorSum(ColumnShim.expression(c)).toAggregateExpression())
}
