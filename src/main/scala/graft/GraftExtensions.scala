package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProduct, MinhashSig60, ShingleHash60, Simhash60, SortedLongIntersectCount, TokenStats, WinnowHash60}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Enable with
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * or programmatically via `withExtensions`.
  *
  * SQL surface:
  *   SELECT graft_dot(a.embedding, b.embedding) ...
  *   SELECT graft_shingle_hash60(text, 3) ...
  *   SELECT graft_sorted_intersect_count(a.hs, b.hs) ...
  *   SELECT graft_winnow_hash60(text, 8, 4) ...
  *   SELECT graft_simhash60(graft_shingle_hash60(text, 3)) ...
  *   SELECT graft_token_stats(text).n_tokens ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    type Exprs = Seq[org.apache.spark.sql.catalyst.expressions.Expression]
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Exprs) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedLongIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (exprs: Exprs) => SortedLongIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_shingle_hash60"),
      new ExpressionInfo(classOf[ShingleHash60].getName, "graft_shingle_hash60"),
      (exprs: Exprs) => ShingleHash60(exprs(0),
        exprs.lift(1).map(_.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_shingle_hash60 n must be an integer literal, got $other")
        }).getOrElse(3))))
    def intLit(name: String)(expr: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      expr.eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$name arguments must be integer literals, got $other")
      }
    e.injectFunction((
      FunctionIdentifier("graft_token_stats"),
      new ExpressionInfo(classOf[TokenStats].getName, "graft_token_stats"),
      (exprs: Exprs) => TokenStats(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[Simhash60].getName, "graft_simhash60"),
      (exprs: Exprs) => Simhash60(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("graft_minhash_sig60"),
      new ExpressionInfo(classOf[MinhashSig60].getName, "graft_minhash_sig60"),
      (exprs: Exprs) => MinhashSig60(exprs(0),
        exprs.lift(1).map(intLit("graft_minhash_sig60")).getOrElse(16))))
    e.injectFunction((
      FunctionIdentifier("graft_winnow_hash60"),
      new ExpressionInfo(classOf[WinnowHash60].getName, "graft_winnow_hash60"),
      (exprs: Exprs) => WinnowHash60(exprs(0),
        exprs.lift(1).map(intLit("graft_winnow_hash60")).getOrElse(8),
        exprs.lift(2).map(intLit("graft_winnow_hash60")).getOrElse(4))))
  }
}
