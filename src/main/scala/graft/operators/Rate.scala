package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-bucket rate/delta for counter-style series — beyond-parity ops
  * (the reference rejects PromQL `rate()`/`delta()` calls,
  * planner.rs:218-222; pipelines need them anyway). One shuffle on
  * (name, bucket); endpoints via min_by/max_by, no window needed.
  */
object Rate {

  /** (name, bucket, delta, rate_per_sec): value change across each
    * bucket and its per-second rate over the observed span.
    */
  def apply(data: DataFrame, bucketMs: Long): DataFrame =
    data
      .withColumn("bucket", col("timestamp") - pmod(col("timestamp"), lit(bucketMs)))
      .groupBy("name", "bucket")
      .agg(
        min_by(col("value"), col("timestamp")).as("first_value"),
        max_by(col("value"), col("timestamp")).as("last_value"),
        min("timestamp").as("first_ts"),
        max("timestamp").as("last_ts"))
      .select(col("name"), col("bucket"),
        (col("last_value") - col("first_value")).as("delta"),
        when(col("last_ts") > col("first_ts"),
          (col("last_value") - col("first_value")) /
            ((col("last_ts") - col("first_ts")) / 1000.0))
          .otherwise(lit(0.0)).as("rate_per_sec"))
}
