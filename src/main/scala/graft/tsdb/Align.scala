package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal alignment of two series by linear interpolation — the Spark
  * rendering of the reference's `VectorToVectorNode`
  * (tachyon_core/src/execution/node/vector_to_vector.rs:35-64,98-407):
  *
  *  - output timestamps = union of both inputs' timestamps;
  *  - a side missing at a timestamp is linearly interpolated between its
  *    two neighbors; at stream edges the nearest value is carried;
  *  - when `roundInterpolated` (integer-typed operands in the reference),
  *    the interpolated value is `.round()`ed before use
  *    (vector_to_vector.rs:53-60 — the "TODO: Allow floats" quirk).
  *
  * Implementation: full-outer join on timestamp, then prev/next non-null
  * neighbor via two window passes. `interpolatedBucketed` is the engine
  * default (TsdbEngine.binary): every per-row window is partitioned by a
  * time bucket so the align parallelizes across the cluster, and only the
  * one-row-per-bucket boundary summary sees a global-order window.
  * `interpolated` is the reference-exact single-window formulation, kept
  * as the semantic contract and the property-test oracle for the bucketed
  * path.
  */
object Align {

  /** l, r: DataFrames with columns (timestamp: Long, value: Double).
    * Duplicate timestamps within one side must be resolved upstream.
    * Returns (timestamp, lv, rv) with both sides defined on the union.
    */
  def interpolated(l: DataFrame, r: DataFrame, roundInterpolated: Boolean): DataFrame = {
    val lv = l.select(col("timestamp"), col("value").as("lv_raw"))
    val rv = r.select(col("timestamp"), col("value").as("rv_raw"))
    val joined = lv.join(rv, Seq("timestamp"), "full_outer")

    // Both neighbor lookups use *running* frames (unbounded-preceding..
    // current): the "next" side runs over a descending sort. Spark
    // evaluates running frames in O(n), whereas an unbounded-FOLLOWING
    // frame is re-evaluated per row (O(n^2)) — on a 15k-row union that
    // was a 20s-vs-0.5s difference.
    val asc = Window.orderBy(col("timestamp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.orderBy(col("timestamp").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withNeighbors = joined
      .withColumn("plv", last(col("lv_raw"), ignoreNulls = true).over(asc))
      .withColumn("plt", last(when(col("lv_raw").isNotNull, col("timestamp")),
        ignoreNulls = true).over(asc))
      .withColumn("prv", last(col("rv_raw"), ignoreNulls = true).over(asc))
      .withColumn("prt", last(when(col("rv_raw").isNotNull, col("timestamp")),
        ignoreNulls = true).over(asc))
      .withColumn("nlv", last(col("lv_raw"), ignoreNulls = true).over(desc))
      .withColumn("nlt", last(when(col("lv_raw").isNotNull, col("timestamp")),
        ignoreNulls = true).over(desc))
      .withColumn("nrv", last(col("rv_raw"), ignoreNulls = true).over(desc))
      .withColumn("nrt", last(when(col("rv_raw").isNotNull, col("timestamp")),
        ignoreNulls = true).over(desc))

    def side(raw: String, pv: String, pt: String, nv: String, nt: String, out: String) = {
      val c = col(raw)
      val slopeVal = col(pv) + (col(nv) - col(pv)) *
        (col("timestamp") - col(pt)).cast("double") / (col(nt) - col(pt)).cast("double")
      val interp = when(col(pv).isNull, col(nv))  // before first sample: carry
        .when(col(nv).isNull, col(pv))            // after last sample: carry
        .otherwise(slopeVal)
      val filled =
        if (roundInterpolated) round(interp).cast("double")
        else interp
      when(c.isNotNull, c).otherwise(filled).as(out)
    }

    withNeighbors.select(col("timestamp"),
      side("lv_raw", "plv", "plt", "nlv", "nlt", "lv"),
      side("rv_raw", "prv", "prt", "nrv", "nrt", "rv"))
  }

  /** Scale path: identical semantics to `interpolated`, but all row-level
    * windows are PARTITIONED BY time bucket, so the align parallelizes
    * across the cluster. Cross-bucket neighbor visibility comes from a
    * per-bucket summary (one row per bucket — first/last non-null value
    * and timestamp per side) whose cumulative carry is computed with a
    * window over that tiny table and broadcast-joined back. The only
    * global-order work is over #buckets rows, not #samples.
    */
  def interpolatedBucketed(
      l: DataFrame, r: DataFrame, roundInterpolated: Boolean,
      bucketMs: Long): DataFrame = {
    // The timestamp-union is built as UNION + one per-(bucket, ts)
    // aggregate instead of a full-outer join: each side holds at most
    // one sample per timestamp (the operator's documented contract), so
    // max() of the side's null-padded column IS that side's value at the
    // timestamp — row-for-row the FOJ result. The win is exchange count
    // (guide §2.4): the union is repartitioned ONCE by hash(bucket),
    // which satisfies the (bucket, ts) merge aggregate, the per-bucket
    // summary aggregate AND the bucket-partitioned neighbor windows —
    // one full-data exchange where the FOJ shape paid four (two join
    // sides keyed on ts, then summary and windows re-keyed on bucket;
    // a full-outer SMJ also reports Unknown partitioning, so nothing
    // downstream could reuse its exchange). Parallelism is bounded by
    // the bucket count — the same bound the window stage always had,
    // and the engine sizes buckets off spark.sql.shuffle.partitions.
    val lT = l.schema("value").dataType
    val rT = r.schema("value").dataType
    val u = l.select(col("timestamp"), col("value").as("lv_raw"),
        lit(null).cast(rT).as("rv_raw"))
      .unionAll(r.select(col("timestamp"), lit(null).cast(lT).as("lv_raw"),
        col("value").as("rv_raw")))
      .withColumn("bucket", col("timestamp") - pmod(col("timestamp"), lit(bucketMs)))
    val joined = u.repartition(col("bucket"))
      .groupBy(col("bucket"), col("timestamp"))
      .agg(max(col("lv_raw")).as("lv_raw"), max(col("rv_raw")).as("rv_raw"))

    // Per-bucket, per-side boundary summary.
    def lastNonNull(c: String, t: String) = Seq(
      max_by(col(c), when(col(c).isNotNull, col("timestamp"))).as(s"last_$c"),
      max(when(col(c).isNotNull, col("timestamp"))).as(s"last_$t"),
      min_by(col(c), when(col(c).isNotNull, col("timestamp"))).as(s"first_$c"),
      min(when(col(c).isNotNull, col("timestamp"))).as(s"first_$t"))
    val summary = joined.groupBy("bucket")
      .agg(lastNonNull("lv_raw", "lt").head,
        (lastNonNull("lv_raw", "lt").tail ++ lastNonNull("rv_raw", "rt")): _*)

    // Carry-in: the last non-null at any earlier bucket; carry-out: the
    // first non-null at any later bucket. Windows over #buckets rows.
    val prevW = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val nextW = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = summary
      .withColumn("in_lv", last(col("last_lv_raw"), ignoreNulls = true).over(prevW))
      .withColumn("in_lt", last(col("last_lt"), ignoreNulls = true).over(prevW))
      .withColumn("in_rv", last(col("last_rv_raw"), ignoreNulls = true).over(prevW))
      .withColumn("in_rt", last(col("last_rt"), ignoreNulls = true).over(prevW))
      .withColumn("out_lv", last(col("first_lv_raw"), ignoreNulls = true).over(nextW))
      .withColumn("out_lt", last(col("first_lt"), ignoreNulls = true).over(nextW))
      .withColumn("out_rv", last(col("first_rv_raw"), ignoreNulls = true).over(nextW))
      .withColumn("out_rt", last(col("first_rt"), ignoreNulls = true).over(nextW))
      .select("bucket", "in_lv", "in_lt", "in_rv", "in_rt",
        "out_lv", "out_lt", "out_rv", "out_rt")

    val withCarry = joined.join(broadcast(carries), Seq("bucket"), "left")

    val asc = Window.partitionBy("bucket").orderBy(col("timestamp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.partitionBy("bucket").orderBy(col("timestamp").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def neighbor(c: String, w: org.apache.spark.sql.expressions.WindowSpec,
        carryV: String, carryT: String, outV: String, outT: String) = {
      val v = coalesce(last(col(c), ignoreNulls = true).over(w), col(carryV))
      val t = coalesce(last(when(col(c).isNotNull, col("timestamp")),
        ignoreNulls = true).over(w), col(carryT))
      (v.as(outV), t.as(outT))
    }

    val (plv, plt) = neighbor("lv_raw", asc, "in_lv", "in_lt", "plv", "plt")
    val (prv, prt) = neighbor("rv_raw", asc, "in_rv", "in_rt", "prv", "prt")
    val (nlv, nlt) = neighbor("lv_raw", desc, "out_lv", "out_lt", "nlv", "nlt")
    val (nrv, nrt) = neighbor("rv_raw", desc, "out_rv", "out_rt", "nrv", "nrt")

    val withNeighbors = withCarry.select(
      col("timestamp"), col("lv_raw"), col("rv_raw"),
      plv, plt, prv, prt, nlv, nlt, nrv, nrt)

    def side(raw: String, pv: String, pt: String, nv: String, nt: String, out: String) = {
      val c = col(raw)
      val slopeVal = col(pv) + (col(nv) - col(pv)) *
        (col("timestamp") - col(pt)).cast("double") / (col(nt) - col(pt)).cast("double")
      val interp = when(col(pv).isNull, col(nv))
        .when(col(nv).isNull, col(pv))
        .otherwise(slopeVal)
      val filled =
        if (roundInterpolated) round(interp).cast("double")
        else interp
      when(c.isNotNull, c).otherwise(filled).as(out)
    }

    withNeighbors.select(col("timestamp"),
      side("lv_raw", "plv", "plt", "nlv", "nlt", "lv"),
      side("rv_raw", "prv", "prt", "nrv", "nrt", "rv"))
  }
}
