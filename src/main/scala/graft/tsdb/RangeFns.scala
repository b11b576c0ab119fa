package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Expr._

/** Range functions over a matrix selector — this engine's documented
  * extension (the reference rejects every Call expr,
  * tachyon_core/src/query/planner.rs:118-123; matrix selectors are a
  * parse error there too). Semantics, chosen to fit the engine's
  * whole-range evaluation model and written down here as the contract:
  *
  *  - The query range [start, end] is cut into TUMBLING windows of the
  *    selector's `[range]`, aligned to `start`: window i covers
  *    `[start + i*range, start + (i+1)*range)` (the final window is
  *    clipped by the range scan's inclusive `end`). Each window with
  *    enough samples emits one row at `timestamp = window start`. This
  *    is the downsampling / recording-rule shape rather than Prometheus'
  *    per-step sliding re-evaluation: one pass, one shuffle, no overlap —
  *    the form that holds up on a 100 TB scan.
  *  - `*_over_time` (avg/min/max/sum/count/last) need ≥1 sample;
  *    `last_over_time` ties on duplicate timestamps break toward the
  *    larger value so the result is deterministic on any input.
  *  - `delta` = last - first (by timestamp) and needs ≥2 samples, as in
  *    Prometheus.
  *  - `increase` = sum of sample-to-sample deltas with counter-reset
  *    correction (a decrease counts the new sample's full value, i.e. the
  *    counter restarted from 0 — Prometheus' reset rule); ≥2 samples.
  *  - `rate` = increase / observed span in seconds (t_last - t_first).
  *    Prometheus additionally extrapolates toward the window boundaries;
  *    this engine deliberately reports the un-extrapolated estimator so
  *    the result is an exact function of the samples (and therefore
  *    oracle-checkable) — the difference is the documented tradeoff, not
  *    an approximation bug.
  *  - Results are Float64 regardless of the stream's value type, like
  *    Prometheus' range functions.
  *
  * Scale shape: the only shuffle is on the window-start key. rate and
  * increase need consecutive-sample deltas, so they sort WITHIN each
  * window (`Window.partitionBy(wstart)` — partition-bounded, never a
  * global order), and the following groupBy reuses the same hash
  * partitioning, so the sort's exchange is the aggregate's exchange.
  * The `*_over_time` family is a bare partial+final HashAggregate.
  */
object RangeFns {

  /** Evaluate `kind` over `samples` (timestamp LONG ms, value — already
    * range-filtered to [startMs, endMs] by the selector scan) with
    * tumbling `windowMs` windows aligned to `startMs`. Returns
    * (timestamp LONG = window start, value DOUBLE).
    */
  def apply(kind: RangeFnKind, samples: DataFrame, windowMs: Long,
      startMs: Long): DataFrame = {
    require(windowMs > 0, s"range window must be positive, got $windowMs")
    val v = col("value").cast("double")
    // timestamp >= startMs is guaranteed by the selector scan; pmod keeps
    // the window key in exact Long arithmetic (a double division would
    // wobble near window edges at large epoch magnitudes).
    val base = samples.select(
      (col("timestamp") - pmod(col("timestamp") - startMs, lit(windowMs)))
        .as("wstart"),
      col("timestamp"), v.as("value"))

    val out = kind match {
      case FnAvgOverTime =>
        base.groupBy("wstart").agg(avg("value").as("value"))
      case FnSumOverTime =>
        base.groupBy("wstart").agg(sum("value").as("value"))
      case FnMinOverTime =>
        base.groupBy("wstart").agg(min("value").as("value"))
      case FnMaxOverTime =>
        base.groupBy("wstart").agg(max("value").as("value"))
      case FnCountOverTime =>
        base.groupBy("wstart")
          .agg(count(lit(1)).cast("double").as("value"))
      case FnLastOverTime =>
        // newest sample; duplicate timestamps break toward the larger
        // value (struct ordering) so the answer is input-order-free
        base.groupBy("wstart")
          .agg(max(struct(col("timestamp"), col("value")))
            .getField("value").as("value"))
      case FnDelta =>
        base.groupBy("wstart")
          .agg(
            (max(struct(col("timestamp"), col("value"))).getField("value") -
              min(struct(col("timestamp"), col("value"))).getField("value"))
              .as("value"),
            count(lit(1)).as("n"))
          .where(col("n") >= 2)
          .select(col("wstart"), col("value"))
      case FnIncrease | FnRate =>
        // consecutive-sample deltas need an ordered pass WITHIN the
        // window only — partition-bounded, and the groupBy that follows
        // reuses the exchange
        val w = Window.partitionBy("wstart")
          .orderBy(col("timestamp"), col("value"))
        val stepped = base
          .withColumn("prev", lag(col("value"), 1).over(w))
          .groupBy("wstart")
          .agg(
            sum(when(col("prev").isNull, lit(0.0))
              .when(col("value") >= col("prev"), col("value") - col("prev"))
              .otherwise(col("value"))).as("inc"),
            min("timestamp").as("t0"), max("timestamp").as("t1"),
            count(lit(1)).as("n"))
          .where(col("n") >= 2)
        if (kind == FnIncrease)
          stepped.select(col("wstart"), col("inc").as("value"))
        else
          // rate needs a positive observed span (two DISTINCT timestamps)
          // — IEEE inf from a zero span would poison downstream aggregates
          stepped.where(col("t1") > col("t0")).select(col("wstart"),
            (col("inc") / ((col("t1") - col("t0")) / lit(1000.0))).as("value"))
    }
    out.select(col("wstart").as("timestamp"), col("value"))
  }
}
