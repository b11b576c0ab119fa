package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-bucket downsampling of a long-format series table — the
  * resolution-reduction op every TSDB front end needs (and the batch
  * analogue of Ingest.windowedStats). One shuffle on (name, bucket),
  * partial aggregation map-side.
  */
object Downsample {

  def apply(data: DataFrame, bucketMs: Long): DataFrame =
    data
      .withColumn("bucket", col("timestamp") - pmod(col("timestamp"), lit(bucketMs)))
      .groupBy("name", "bucket")
      .agg(
        count(lit(1)).as("n"),
        avg("value").as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        sum("value").as("sum_value"))
}
