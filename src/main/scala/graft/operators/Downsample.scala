package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-bucket downsampling of a long-format series table — the
  * resolution-reduction op every TSDB front end needs (and the batch
  * analogue of Ingest.windowedStats). One shuffle on (name, bucket),
  * partial aggregation map-side.
  *
  * `exact = true` accumulates sums in DECIMAL(28,8) instead of f64:
  * decimal addition is associative, so sum/avg become independent of
  * partitioning and reduction order — reproducible across reruns,
  * cluster layouts, and engines (f64 summation differs in final ulps
  * with order, which flips a 6-decimal rounding at large row counts —
  * observed at sf0.1). The trade: inputs are quantized at 8 decimals,
  * the right contract for fixed-point measurements, the wrong one for
  * full-range f64 — hence opt-in.
  */
object Downsample {

  def apply(data: DataFrame, bucketMs: Long, exact: Boolean = false): DataFrame = {
    val bucketed = data
      .withColumn("bucket", col("timestamp") - pmod(col("timestamp"), lit(bucketMs)))
      .groupBy("name", "bucket")
    if (exact)
      bucketed
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(28,8)")).as("_dsum"),
          min("value").as("min_value"),
          max("value").as("max_value"))
        .select(col("name"), col("bucket"), col("n"),
          (col("_dsum").cast("double") / col("n")).as("avg_value"),
          col("min_value"), col("max_value"),
          col("_dsum").cast("double").as("sum_value"))
    else
      bucketed
        .agg(
          count(lit(1)).as("n"),
          avg("value").as("avg_value"),
          min("value").as("min_value"),
          max("value").as("max_value"),
          sum("value").as("sum_value"))
  }
}
