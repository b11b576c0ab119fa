package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global ranking without the single-partition window.
  *
  * `Window.orderBy(...)` with no partition key funnels the whole table
  * through one task — the textbook scale cliff for NTILE / PERCENT_RANK /
  * global ROW_NUMBER. This operator computes the same total-order rank in
  * two parallel passes:
  *
  *   1. range-repartition on the sort key (partitions are globally
  *      ordered), then rank LOCALLY inside each partition — a parallel
  *      per-partition sort;
  *   2. count rows per partition (one row per partition), prefix-sum
  *      those counts with a window over that tiny table, and
  *      broadcast-join the offsets back: global rank = partition offset +
  *      local rank.
  *
  * The only global-order work touches #partitions rows. Correctness does
  * not depend on the range partitioner's sampled boundaries — any split
  * yields the same ranks — but the sort key MUST be a total order (add a
  * unique tiebreaker), otherwise ties straddling a partition boundary
  * would be ranked in partition order rather than SQL RANK tie order.
  */
object RangeRank {

  /** Returns `df` plus `grank` (1-based global row number in `sortCols`
    * order) and `gcount` (total row count, for NTILE/PERCENT_RANK math).
    *
    * NOTE on the range exchange's boundary sampling (r16 measurement):
    * the sampling pass re-executes the child subplan above its last
    * exchange, so an expensive projection there runs twice. A generic
    * input persist here was implemented and A/B-measured at 1x and 10x
    * data (sq01/sq02/pp03/q24/pp07/sp02, min over repeated cache-cold
    * runs): it LOST or tied on every caller at both scales — the cache
    * write+read on the critical path costs more than the re-executed
    * map work, which shuffle-file reuse already bounds to the
    * post-exchange slice. Callers with a measured-expensive child can
    * persist narrowly themselves (pp02 does; re-measured a wash at
    * 10x, kept). Do not re-add an unconditional persist without fresh
    * numbers.
    *
    * The local rank comes from `monotonically_increasing_id` after a
    * per-partition sort — its documented encoding is (partition id <<
    * 33) | per-partition sequence, so pid and local row number are two
    * bit-slices of one column and the rank costs NO window and NO second
    * shuffle. (A Window.partitionBy(_pid) formulation would re-shuffle
    * the whole table on _pid, because Catalyst cannot see that range
    * partitioning already clusters by partition id — measured as a full
    * extra Exchange in the q24 plan.) Partitions are capped at 2^33 rows
    * by the encoding — a per-task bound no sane configuration reaches.
    * The two windows over the per-partition `counts` table order
    * #partitions rows, not data.
    */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // Persisted because both the rank output and the counts aggregate
    // read it, and exchange reuse does not kick in across the two sides
    // (measured ReusedExchange=0 — the same trap as broadcast self-joins
    // in round 1): without the persist the scan + range shuffle would run
    // twice. Spilling the sorted table to executor disk is strictly
    // cheaper than a second full shuffle.
    val local = graft.engine.Caches.track(df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftrightunsigned(col("_mid"), 33).cast("int"))
      .withColumn("_lrn", col("_mid").bitwiseAND((1L << 33) - 1) + 1)
      .drop("_mid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // one row per partition; prefix-sum + total over #partitions rows
    val counts = local.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
    val prefW = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val allW = Window.orderBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_n")).over(prefW), lit(0L)))
      .withColumn("gcount", sum(col("_n")).over(allW))
      .select(col("_pid"), col("_off"), col("gcount"))

    local.join(broadcast(offsets), "_pid" :: Nil)
      .withColumn("grank", col("_off") + col("_lrn"))
      .drop("_pid", "_lrn", "_off")
  }

  /** Returns `df` plus `gcum` — the EXCLUSIVE global prefix sum of
    * `weightCol` (long) in `sortCols` order: the sum of all weights
    * strictly before each row. Same two-pass shape as
    * [[globalRowNumber]]: range-repartition + per-partition local
    * prefix sums (one imperative pass per partition — a
    * `Window.partitionBy(pid)` here would re-shuffle the whole table,
    * the measured q24 trap), then per-partition totals (#partitions
    * rows) prefix-summed and broadcast back as offsets.
    *
    * `sortCols` must be a total order for a deterministic result.
    */
  def globalCumSum(df: DataFrame, sortCols: Seq[Column], weightCol: String,
      numPartitions: Int = 0): DataFrame = {
    val reserved = Set("_w", "_pid", "_lcum", "_off", "gcum")
    require(!df.columns.exists(reserved),
      s"input must not carry the reserved columns ${reserved.mkString(", ")} " +
        "(chain by renaming gcum away first)")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // NULL weights count as 0 (SQL SUM skips them; a bare getLong would
    // NPE in the partition pass)
    val base = df.withColumn("_w", coalesce(col(weightCol).cast("long"), lit(0L)))
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
    val schema = base.schema.add("_lcum", org.apache.spark.sql.types.LongType)
    val wIdx = base.schema.fieldIndex("_w")
    // local exclusive prefix sum: one sequential pass per partition, no
    // window, no extra exchange
    val local = graft.engine.Caches.track(base.mapPartitions { it =>
      var acc = 0L
      it.map { r =>
        val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(wIdx)
        out
      }
    }(org.apache.spark.sql.Encoders.row(schema))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val prefW = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("_pid")).agg(sum(col("_w")).as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(prefW), lit(0L)))
      .select(col("_pid"), col("_off"))
    local.join(broadcast(offsets), "_pid" :: Nil)
      .withColumn("gcum", col("_off") + col("_lcum"))
      .drop("_pid", "_w", "_lcum", "_off")
  }

  /** Returns `df` plus `gcum` — the EXCLUSIVE prefix sum of `weightCol`
    * within each `groupCols` group, rows ordered by `sortCols` inside
    * the group. The naive formulation — `Window.partitionBy(groupCols)`
    * — caps parallelism at the GROUP CARDINALITY and sorts n/groups rows
    * per task: with a handful of groups (sources, languages, priorities)
    * that is the same cliff q32 had. This shape never groups a group
    * into one task: range-partition on (group, sort) — a group freely
    * SPANS partitions — run one sequential pass per partition resetting
    * the accumulator at group boundaries, then prefix-sum the
    * per-(partition, group) totals (≤ #partitions + #groups rows,
    * because the range clustering gives each partition at most two
    * boundary groups... conservatively #partitions × resident groups,
    * still metadata-sized) and broadcast the offsets back.
    */
  def groupedCumSum(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[Column], weightCol: String,
      numPartitions: Int = 0): DataFrame = {
    val reserved = Set("_w", "_pid", "_lcum", "_off", "gcum")
    require(!df.columns.exists(reserved),
      s"input must not carry the reserved columns ${reserved.mkString(", ")}")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val order = groupCols.map(col) ++ sortCols
    val base = df.withColumn("_w", coalesce(col(weightCol).cast("long"), lit(0L)))
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id())
    val schema = base.schema.add("_lcum", org.apache.spark.sql.types.LongType)
    val wIdx = base.schema.fieldIndex("_w")
    val gIdx = groupCols.map(base.schema.fieldIndex)
    // local exclusive prefix sum, resetting at group boundaries — the
    // rows arrive clustered by group key within the partition
    val local = graft.engine.Caches.track(base.mapPartitions { it =>
      var acc = 0L
      var prev: Seq[Any] = null
      it.map { r =>
        val key = gIdx.map(r.get)
        if (prev == null || key != prev) { acc = 0L; prev = key }
        val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(wIdx)
        out
      }
    }(org.apache.spark.sql.Encoders.row(schema))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // per-(partition, group) totals; exclusive prefix over partition ids
    // WITHIN each group — a window over a metadata-sized table
    val prefW = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy(col("_pid") +: groupCols.map(col): _*)
      .agg(sum(col("_w")).as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(prefW), lit(0L)))
      .select(col("_pid") +: groupCols.map(col) :+ col("_off"): _*)
    local.join(broadcast(offsets), "_pid" +: groupCols)
      .withColumn("gcum", col("_off") + col("_lcum"))
      .drop("_pid", "_w", "_lcum", "_off")
  }

  /** SQL NTILE(buckets) derived from a 1-based total-order rank and the
    * total count: the first n%k buckets hold floor(n/k)+1 rows, the rest
    * floor(n/k) — pure integer column math, no window.
    */
  def ntileFromRank(rank: Column, total: Column, buckets: Int): Column = {
    // Column./ is double division; floor+cast makes it integer division
    // (exact below 2^53 — a row-count bound, not a data bound).
    def idiv(a: Column, b: Column): Column =
      floor(a.cast("double") / b.cast("double")).cast("long")
    val q = idiv(total, lit(buckets))
    val rem = total % buckets
    val bigCut = rem * (q + 1) // ranks covered by the larger buckets
    when(rank <= bigCut, idiv(rank - 1, q + 1) + 1)
      .otherwise(rem + idiv(rank - bigCut - 1, q) + 1)
  }

  /** SQL PERCENT_RANK for a UNIQUE total order (rank == row number). */
  def percentRankFromRank(rank: Column, total: Column): Column =
    when(total === 1, 0.0)
      .otherwise((rank - 1).cast("double") / (total - 1).cast("double"))
}
