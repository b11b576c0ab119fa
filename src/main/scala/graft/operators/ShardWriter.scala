package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sharded training-file writer — the last step of
  * "corpus in, training files out". Takes the writer-ready span rows
  * (Packing.packSpans output in training order) and materializes them
  * as N shard directories whose boundaries and internal order are a
  * pure function of the DATA, never of the write configuration:
  *
  *   - `offset` — the row's global position in training order, from the
  *     two-pass RangeRank (no single-partition sort ever exists);
  *   - `shard`  — `offset * N div total`: N contiguous, balanced
  *     (±1 row) ranges of the training stream. Reading shard 0..N-1,
  *     each in `offset` order, IS the training order.
  *
  * Both columns are persisted with the rows, so read-back order is
  * recovered by `ORDER BY (shard, offset)` regardless of how the writer
  * split files (`maxRecordsPerFile`, AQE coalescing, task count — none
  * of them can change the result, only the file layout). Reference
  * capability analogue: the CSV export sink (tachyon_cli/src/main.rs:
  * 177-186), scaled from "dump one table" to "emit a pinned-order
  * training corpus".
  *
  * Scale: the shard math is a row-local projection on top of the
  * two-pass rank (offset*N stays far under Long overflow until
  * ~10^14 rows x 10^4 shards); the write itself is rebalanced by
  * `shard`, so each shard directory is written by one task instead of
  * a sliver from every task, while AQE may still split a skewed shard.
  */
object ShardWriter {

  /** Returns `df` plus (`offset`, `shard`): global training-order
    * position (0-based, in `order` — which must be a total order) and
    * the contiguous shard range it falls in.
    */
  def shardAssign(df: DataFrame, order: Seq[Column], nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    // reject rather than clobber: these are the writer's address
    // columns, and silently overwriting a caller's same-named data
    // column would write corrupted shards with no error (same guard
    // principle as RangeRank's reserved columns)
    Seq("offset", "shard", "grank", "gcount").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it before shardAssign")
    }
    RangeRank.globalRowNumber(df, order)
      .withColumn("offset", col("grank") - 1)
      .withColumn("shard",
        expr(s"(offset * ${nShards}L) div gcount").cast("int"))
      .drop("grank", "gcount")
  }

  /** Writes `df` to `outDir` as one directory per shard (`shard=K/`),
    * rows carrying (`offset`, `shard`), and returns the READ-BACK
    * DataFrame in (shard, offset) order — the caller's proof obligation
    * ("what a trainer reads equals what packing produced") reduces to
    * comparing this against the pre-write rows.
    *
    * `format` is "parquet" (default — columnar, self-describing schema)
    * or "json" (JSON Lines, the interchange format most training
    * loaders consume directly; read-back passes the writer's schema
    * back in, so types round-trip without inference).
    */
  def writeSharded(df: DataFrame, order: Seq[Column], nShards: Int,
      outDir: String, format: String = "parquet"): DataFrame = {
    require(format == "parquet" || format == "json",
      s"format must be parquet or json, got '$format'")
    val spark = df.sparkSession
    val assigned = shardAssign(df, order, nShards)
    assigned
      .hint("rebalance", col("shard"))
      // local sort only: file order inside a shard is a nicety for
      // sequential readers; correctness rides the offset column
      .sortWithinPartitions(col("shard"), col("offset"))
      .write.partitionBy("shard").mode("overwrite").format(format).save(outDir)
    // partitionBy drops `shard` from the data files; supply the
    // remaining schema explicitly for json so read-back types match
    // the written frame instead of being re-inferred from text
    val dataSchema = org.apache.spark.sql.types.StructType(
      assigned.schema.filterNot(_.name == "shard"))
    // an empty input writes only _SUCCESS (no shard dirs): parquet
    // read-back would fail schema inference and json would miss the
    // partition column — return the empty frame with the full schema
    // instead of crashing (checked on the filesystem, no extra job)
    val hasShards = {
      val p = new org.apache.hadoop.fs.Path(outDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).exists(_.getPath.getName.startsWith("shard="))
    }
    if (!hasShards) {
      val outSchema = org.apache.spark.sql.types.StructType(
        dataSchema :+ org.apache.spark.sql.types.StructField(
          "shard", org.apache.spark.sql.types.IntegerType))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    } else
      (if (format == "json") spark.read.schema(dataSchema).json(outDir)
       else spark.read.parquet(outDir))
        .withColumn("shard", col("shard").cast("int"))
        .orderBy(col("shard"), col("offset"))
  }
}
