package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin
import graft.tsdb.TsdbFixtures.spark

/** RangeJoin.byBucket must (a) equal the naive inequality join exactly,
  * with no duplicate (point, interval) pairs, and (b) plan as an
  * equi-join — never the nested-loop Spark picks for a bare range
  * predicate.
  */
class RangeJoinSpec extends AnyFunSuite {
  import spark.implicits._

  private val points = Seq(
    // key, ts
    ("a", 0L), ("a", 999L), ("a", 1000L), ("a", 1500L), ("a", 2500L),
    ("a", 10000L), ("b", 1500L), ("b", 7200L)
  ).toDF("k", "ts")

  private val intervals = Seq(
    // key, start, end (exclusive), id — lengths from sub-bucket to 7x bucket
    ("a", 0L, 1000L, 0), ("a", 500L, 2600L, 1), ("a", 2500L, 2501L, 2),
    ("a", 3000L, 10001L, 3), ("b", 0L, 8000L, 4), ("b", 7200L, 7300L, 5)
  ).toDF("k", "s", "e", "iv_id")

  test("byBucket equals the naive inequality join, no dup pairs") {
    for (bucket <- Seq(1L, 300L, 1000L, 4096L)) {
      val got = RangeJoin.byBucket(points, intervals, "k", "ts", "s", "e", bucket)
        .select("k", "ts", "iv_id").collect().map(r =>
          (r.getString(0), r.getLong(1), r.getInt(2))).toSeq.sorted
      val want = points.join(intervals, Seq("k"))
        .where(col("ts") >= col("s") && col("ts") < col("e"))
        .select("k", "ts", "iv_id").collect().map(r =>
          (r.getString(0), r.getLong(1), r.getInt(2))).toSeq.sorted
      assert(got == want, s"bucket=$bucket")
      assert(got.distinct == got, s"bucket=$bucket produced duplicate pairs")
    }
  }

  test("a caller-owned 'bucket' column passes through untouched") {
    val pts = points.withColumn("bucket", col("ts") * 100)
    val got = RangeJoin.byBucket(pts, intervals, "k", "ts", "s", "e", 1000L)
    assert(got.columns.contains("bucket"))
    assert(got.where(col("bucket") =!= col("ts") * 100).isEmpty,
      "caller's bucket column was clobbered")
  }

  test("empty intervals (end <= start) match nothing and do not throw") {
    val withEmpty = intervals.unionByName(
      Seq(("a", 1000L, 1000L, 6), ("a", 2000L, 1500L, 7)).toDF("k", "s", "e", "iv_id"))
    val got = RangeJoin.byBucket(points, withEmpty, "k", "ts", "s", "e", 1000L)
      .select("iv_id").distinct().as[Int].collect().toSet
    assert(!got.contains(6) && !got.contains(7))
  }

  test("plan is an equi-join on (key, bucket), not a nested loop") {
    val plan = RangeJoin
      .byBucket(points, intervals, "k", "ts", "s", "e", 1000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a nested loop:\n$plan")
  }
}
