package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: lay documents end-to-end in
  * a deterministic global order and cut fixed-capacity context windows
  * ("concat-and-cut" packing). Each document is assigned the bin where
  * its first token lands — `bin = exclusive-prefix-tokens / capacity` —
  * plus its offset inside that bin; a document longer than the
  * remaining bin space straddles into the next bin, exactly like the
  * token stream it models.
  *
  * Scale: the only global computation is the exclusive prefix sum,
  * done by the two-pass `RangeRank.globalCumSum` (range partition +
  * per-partition sequential pass + #partitions-row offset table) — no
  * single-partition window anywhere, deterministic under any
  * partitioning because the order is a total order.
  */
object Packing {

  /** Returns `df` plus (gcum, bin, bin_offset): exclusive prefix sum of
    * `weightCol`, the capacity bin where the row starts, and the offset
    * within it. `sortCols` must be a total order.
    */
  def pack(df: DataFrame, sortCols: Seq[Column], weightCol: String,
      capacity: Long, numPartitions: Int = 0): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    // `div`, not `/`: Column / is double division, which loses exactness
    // past 2^53 — token prefix sums at 100 TB scale live there
    RangeRank.globalCumSum(df, sortCols, weightCol, numPartitions)
      .withColumn("bin", expr(s"gcum div ${capacity}L"))
      .withColumn("bin_offset", pmod(col("gcum"), lit(capacity)))
  }
}
