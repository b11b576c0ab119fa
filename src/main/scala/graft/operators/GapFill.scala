package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense-grid gap filling over a bucketed series: emit EVERY bucket in
  * the series' [min, max] range (or an explicit range) and forward-fill
  * missing values — the resolution-normalization step dashboards and
  * model-feature pipelines expect after downsampling.
  *
  * Scale shape: the grid generates per series (one `sequence` per name —
  * grid size = time-range / bucketMs, bounded by the RANGE, not the
  * data), the join is an equi-join on (name, bucket), and the fill
  * window partitions by name. No global windows; a series' fill state
  * is one running value. Skewed series lengths are a non-issue because
  * every series has the same grid length.
  */
object GapFill {

  /** `data`: (name, bucket, value) with one row per present bucket.
    * Returns (name, bucket, value, filled) over the dense grid;
    * `filled` marks synthesized rows. The grid spans each series' own
    * [min, max] bucket range, or `range` = (startMs, endMs inclusive,
    * bucket-aligned) to align every series to a common window — there,
    * buckets before a series' first sample stay null (nothing to
    * carry).
    */
  def forwardFill(data: DataFrame, bucketMs: Long,
      range: Option[(Long, Long)] = None): DataFrame = {
    val w = Window.partitionBy("name").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid(data, bucketMs, range).join(data, Seq("name", "bucket"), "left")
      .select(col("name"), col("bucket"),
        last(col("value"), ignoreNulls = true).over(w).as("value"),
        col("value").isNull.as("filled"))
  }

  /** Linear-interpolation fill over the same dense grid: a synthesized
    * bucket takes the line between its nearest present neighbors;
    * buckets before the first or after the last sample stay null (no
    * extrapolation). Returns (name, bucket, value DOUBLE, filled). The
    * "next present sample" lookup runs as a DESCENDING running frame —
    * Spark evaluates UnboundedFollowing frames quadratically, the same
    * trap the as-of join avoids.
    */
  def linearFill(data: DataFrame, bucketMs: Long,
      range: Option[(Long, Long)] = None): DataFrame = {
    val asc = Window.partitionBy("name").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.partitionBy("name").orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val presentB = when(col("value").isNotNull, col("bucket"))
    // interpolation arithmetic is spelled (dv * db) / span with every
    // operand cast to double FIRST — the oracle mirrors the exact
    // operation order so IEEE results are bit-identical
    val lin = col("pv").cast("double") +
      (col("nv") - col("pv")).cast("double") *
        (col("bucket") - col("pb")).cast("double") /
        (col("nb") - col("pb")).cast("double")
    grid(data, bucketMs, range).join(data, Seq("name", "bucket"), "left")
      .withColumn("pv", last(col("value"), ignoreNulls = true).over(asc))
      .withColumn("pb", last(presentB, ignoreNulls = true).over(asc))
      .withColumn("nv", last(col("value"), ignoreNulls = true).over(desc))
      .withColumn("nb", last(presentB, ignoreNulls = true).over(desc))
      .select(col("name"), col("bucket"),
        when(col("value").isNotNull, col("value").cast("double"))
          .when(col("pb").isNotNull && col("nb").isNotNull, lin)
          .otherwise(lit(null).cast("double")).as("value"),
        col("value").isNull.as("filled"))
  }

  /** The dense (name, bucket) grid both fill modes join against. */
  private def grid(data: DataFrame, bucketMs: Long,
      range: Option[(Long, Long)]): DataFrame = range match {
    case Some((r0, r1)) =>
      data.select("name").distinct()
        .select(col("name"),
          explode(sequence(lit(r0 - r0 % bucketMs), lit(r1 - r1 % bucketMs),
            lit(bucketMs))).as("bucket"))
    case None =>
      data.groupBy("name")
        .agg(min("bucket").as("b0"), max("bucket").as("b1"))
        .select(col("name"),
          explode(sequence(col("b0"), col("b1"), lit(bucketMs))).as("bucket"))
  }
}
