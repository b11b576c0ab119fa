package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Byte-distribution feature extraction for opaque multimodal payloads:
  * one pass over the binary builds the 256-bin histogram and derives
  *
  *   - n_bytes            payload length
  *   - n_distinct_bytes   occupied bins (narrow for text, ~256 for
  *                        compressed/encrypted media)
  *   - byte_collision_sum sum of squared bin counts — the unnormalized
  *                        Simpson index; collision probability =
  *                        sum / n^2. Integer-exact, unlike entropy.
  *   - top_byte           most frequent byte value (ties to the
  *                        smallest value; -1 for an empty payload)
  *
  * These are the cheap content-type/corruption signals a curation
  * pipeline computes BEFORE handing payloads to a real codec: text,
  * compressed, and constant-fill payloads separate on
  * (n_distinct_bytes, collision) alone. Runs as one compiled loop per
  * row (static-call codegen, same pattern as ShingleHash60).
  */
object ByteStatsUtil {
  def byteStats(payload: Array[Byte]): InternalRow = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < payload.length) {
      hist(payload(i) & 0xff) += 1
      i += 1
    }
    var distinct = 0
    var collision = 0L
    var top = -1
    var topCount = 0L
    var b = 0
    while (b < 256) {
      val c = hist(b)
      if (c > 0) {
        distinct += 1
        collision += c * c
        if (c > topCount) { topCount = c; top = b }
      }
      b += 1
    }
    InternalRow(payload.length.toLong, distinct, collision, top)
  }
}

/** Catalyst wrapper: BINARY -> STRUCT(n_bytes, n_distinct_bytes,
  * byte_collision_sum, top_byte).
  */
case class ByteStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_distinct_bytes", IntegerType, nullable = false),
    StructField("byte_collision_sum", LongType, nullable = false),
    StructField("top_byte", IntegerType, nullable = false)))

  override def prettyName: String = "graft_byte_stats"

  override def nullSafeEval(v: Any): Any =
    ByteStatsUtil.byteStats(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ByteStatsUtil.byteStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteStatsFn {
  /** Column wrapper for [[ByteStats]]. */
  def byteStats(payload: Column): Column =
    ColumnShim.column(ByteStats(ColumnShim.expression(payload)))
}
