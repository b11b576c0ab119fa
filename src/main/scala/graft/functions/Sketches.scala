package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates for corpus-scale profiling — thin, named
  * wrappers over Spark's sketch implementations so pipelines reach for
  * the bounded-memory version by default:
  *
  *  - approxDistinct: HyperLogLog++ (`approx_count_distinct`) — fixed
  *    sketch size vs. the unbounded hash table of COUNT(DISTINCT).
  *  - approxQuantiles: Greenwald-Khanna (`approx_percentile`) — one pass,
  *    bounded memory vs. full sort.
  *  - frequentItems: count-min-style heavy hitters per column.
  *
  * These have no DuckDB oracle (sketch internals differ across engines);
  * correctness is asserted against exact results within error bounds in
  * SketchSpec.
  */
object Sketches {

  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  def approxQuantiles(c: Column, percentages: Seq[Double], accuracy: Int = 10000): Column =
    percentile_approx(c,
      array(percentages.map(lit): _*), lit(accuracy))

  def profile(df: DataFrame, col_ : String): DataFrame =
    df.agg(
      approxDistinct(col(col_)).as("approx_distinct"),
      approxQuantiles(col(col_), Seq(0.25, 0.5, 0.75, 0.99)).as("quartiles"),
      count(lit(1)).as("n"))
}
