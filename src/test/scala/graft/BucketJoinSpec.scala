package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing
import graft.tsdb.TsdbFixtures.spark

/** Co-located joins via bucketed tables: two tables bucketed on the
  * same key with the same bucket count sort-merge-join with ZERO
  * exchanges — the write-time layout replaces the per-query shuffle.
  */
class BucketJoinSpec extends AnyFunSuite {
  import spark.implicits._

  test("join of same-bucketed tables has no exchange; results correct") {
    val root = Files.createTempDirectory("graft_buckets")
    val left = (0 until 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (0 until 1000 by 2).map(i => (i.toLong, i * 10L)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", s"$root/left", "k", 8)
    Bucketing.writeBucketed(right, "bkt_right", s"$root/right", "k", 8)
    try {
      // merge hint pins SMJ (broadcast would trivially skip the
      // exchange); the claim under test is exchange-free SMJ
      val joined = Bucketing.bucketedTable(spark, "bkt_left").hint("merge")
        .join(Bucketing.bucketedTable(spark, "bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(joined.count() == 500)
      assert(joined.where($"k" === 10).select($"rv").head().getLong(0) == 100L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val root = Files.createTempDirectory("graft_buckets_agg")
    val df = (0 until 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    Bucketing.writeBucketed(df, "bkt_agg", s"$root/t", "k", 8)
    try {
      val agg = Bucketing.bucketedTable(spark, "bkt_agg")
        .groupBy("k").agg(sum("v").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation still shuffles:\n${plan.take(1500)}")
      assert(agg.count() == 50)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_agg")
  }
}
