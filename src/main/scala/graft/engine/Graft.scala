package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_millis}
import org.apache.spark.sql.types.LongType

/** Session + table helpers shared by SparkEntry / Verify / Bench / tests.
  *
  * Design notes (100 TB posture):
  *  - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  *    and dynamic join-strategy switching are the main levers that survive a
  *    1000-executor scale-up without hand-tuning per query.
  *  - `spark.sql.shuffle.partitions` is a *default* sized for local[32]; on a
  *    real cluster AQE re-derives it from `advisoryPartitionSizeInBytes`.
  */
object Graft {

  /** Standard session for local development / tests. */
  def session(appName: String = "graft", cores: String = "32"): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Older testdata generations carried TIMESTAMP(NANOS), which Spark
      // has no native type for; keep the flag so those read as an
      // epoch-nanos Long (Graft.tsMillis handles either physical type).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply scale-aware defaults to an externally-built session (Verify/Bench). */
  def tune(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }

  /** Load one driver testdata table (see TESTDATA.md). Column pruning and
    * predicate pushdown reach the parquet scan because this stays a plain
    * file-source relation — callers `.select`/`.where` on top.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Epoch-millis projection of the events `ts` column, robust to the
    * physical parquet type the generator happened to use:
    *  - TIMESTAMP(NANOS) has no native Spark type and reads as an
    *    epoch-nanos Long under `nanosAsLong` → divide to ms;
    *  - TIMESTAMP(MICROS/MILLIS) reads as a native timestamp
    *    (NTZ or LTZ) → `unix_millis` after a cast that is exact because
    *    every session here pins UTC.
    * Stays a plain codegen'd projection either way, so pushdown and
    * pruning through it are unaffected.
    */
  def tsMillis(events: DataFrame): Column = events.schema("ts").dataType match {
    case LongType => expr("ts div 1000000")
    case _ => unix_millis(col("ts").cast("timestamp"))
  }

  /** Restore scan parallelism for CPU-heavy per-row passes when the
    * source is a handful of unsplittable files (single-row-group parquet
    * reads as ONE task no matter what `maxPartitionBytes` says — the
    * whole corpus then tokenizes on one core).
    *
    * At 100 TB the scan already yields thousands of row-group-sized
    * partitions and this is a no-op; it only ever adds a round-robin
    * exchange when the scan cannot feed the cluster. Callers put it
    * AFTER pushdown-able filters/projections so the exchange moves the
    * narrow residue, and Catalyst still prunes columns through it.
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
