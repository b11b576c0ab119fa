package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables ONCE at write time so
  * every later equi-join / aggregation on the bucket key runs with no
  * exchange at all.
  *
  * Spark's bucketing is the write-side half of a co-located join: rows
  * are hash-distributed into a fixed number of buckets per partition
  * and each bucket sorted on the key, so a join between two tables
  * bucketed on the same key with the same bucket count is a zip of
  * pre-sorted files — no shuffle, no sort, just the merge. At 100 TB
  * this converts the recurring cost of a fact-fact join (two full
  * shuffles per query) into a one-time layout decision, the same trade
  * the reference bakes into its (stream, time)-sorted `.ty` files.
  *
  * Bucket-count choice: buckets x target-file-size should cover the
  * table (e.g. 100 TB / 256 MB ≈ 400k bucket-files across partitions);
  * both join sides must agree on (key, count), so standardize counts
  * per key domain.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table registered under
    * `table` with files at `path` (external table: the data outlives
    * the metastore, like every other dataset in this library).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit = {
    require(buckets > 0, "buckets must be positive")
    // repartition(buckets, key) IS Spark's bucket assignment (Murmur3
    // hash mod buckets), so each task holds exactly one bucket and
    // writes ONE file — without it every upstream task writes a sliver
    // of every bucket (tasks x buckets files), and multi-file buckets
    // make Spark re-Sort before every "sorted" merge join.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** The registered bucketed table. */
  def bucketedTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
