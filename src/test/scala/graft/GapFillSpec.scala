package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GapFill
import graft.tsdb.TsdbFixtures.spark

/** Pins GapFill.forwardFill semantics: dense per-series grids, carry of
  * the last present value, nulls before a series' first sample, and the
  * `filled` marker.
  */
class GapFillSpec extends AnyFunSuite {
  import spark.implicits._

  test("forwardFill: dense grid, carry, filled marker, per-series ranges") {
    // series a: buckets 0,30 present (10 missing twice); series b: 10,20
    val data = Seq(
      ("a", 0L, 1L), ("a", 30L, 4L),
      ("b", 10L, 7L), ("b", 20L, 9L)
    ).toDF("name", "bucket", "value")
    val out = GapFill.forwardFill(data, 10L)
      .orderBy("name", "bucket")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(out == Seq(
      ("a", 0L, 1L, false), ("a", 10L, 1L, true), ("a", 20L, 1L, true),
      ("a", 30L, 4L, false),
      ("b", 10L, 7L, false), ("b", 20L, 9L, false)))
  }

  test("forwardFill: single-bucket series emits exactly one unfilled row") {
    val data = Seq(("solo", 42L, 5L)).toDF("name", "bucket", "value")
    val out = GapFill.forwardFill(data, 7L).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 42L && !out.head.getBoolean(3))
  }

  test("explicit range aligns series to a common window; leading nulls") {
    val data = Seq(("a", 20L, 5L), ("b", 0L, 7L)).toDF("name", "bucket", "value")
    val out = GapFill.forwardFill(data, 10L, range = Some((0L, 30L)))
      .orderBy("name", "bucket")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(out == Seq(
      // before a's first sample: nothing to carry, null but filled
      ("a", 0L, -1L, true), ("a", 10L, -1L, true),
      ("a", 20L, 5L, false), ("a", 30L, 5L, true),
      ("b", 0L, 7L, false), ("b", 10L, 7L, true),
      ("b", 20L, 7L, true), ("b", 30L, 7L, true)))
  }

  test("forwardFill plan: fill window partitions by name (no global window)") {
    val data = Seq(("a", 0L, 1L), ("a", 20L, 2L)).toDF("name", "bucket", "value")
    // the optimized logical plan is not AQE-wrapped, unlike executedPlan
    val plan = GapFill.forwardFill(data, 10L).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "gap-fill window must be partitioned by series, never global")
  }
}
