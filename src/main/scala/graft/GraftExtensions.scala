package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.DotProduct

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Enable with
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * or programmatically via `withExtensions`.
  *
  * SQL surface:
  *   SELECT graft_dot(a.embedding, b.embedding) ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
  }
}
