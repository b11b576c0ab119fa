package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tsdb.{StatsAggregate, TsdbFixtures}
import graft.tsdb.TsdbFixtures.spark

/** Stats-pushdown equivalence: aggregate-from-stats must equal the plain
  * row-scan aggregate on every query range — the Spark port of the
  * reference's scan-hint-vs-row-scan tests
  * (tachyon_core/src/storage/file.rs:941-1046).
  */
class StatsSpec extends AnyFunSuite {

  private val bucketMs = 10L
  // 30 samples at ts 0..29, values = ts * 2 (+ a second stream as noise)
  private val data = TsdbFixtures.longDf(
    (0L until 30L).map(t => ("m", Map.empty[String, String], t, t * 2.0)) ++
      (0L until 30L).map(t => ("other", Map.empty[String, String], t, 999.0)))
  private val stats = StatsAggregate.buildStats(data, bucketMs)

  private def direct(startMs: Long, endMs: Long): (Long, Double, Double, Double) = {
    val rows = (startMs to endMs).filter(t => t >= 0 && t < 30).map(_ * 2.0)
    (rows.size.toLong, rows.sum, rows.min, rows.max)
  }

  private def viaStats(startMs: Long, endMs: Long): Row =
    StatsAggregate.aggregate(data, stats, "m", startMs, endMs, bucketMs).head()

  // ranges mirroring file.rs:941-1046: full, partial head/tail, single
  // bucket, bucket-aligned, unaligned both ends
  for ((s, e) <- Seq((0L, 29L), (5L, 28L), (0L, 9L), (2L, 9L), (10L, 19L),
      (3L, 27L), (9L, 10L), (0L, 100L))) {
    test(s"stats aggregate equals row scan on [$s,$e]") {
      val (n, sum, mn, mx) = direct(s, e)
      val r = viaStats(s, e)
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("value_sum") - sum) < 1e-9)
      assert(r.getAs[Double]("min_value") == mn)
      assert(r.getAs[Double]("max_value") == mx)
      assert(math.abs(r.getAs[Double]("avg_value") - sum / n) < 1e-9)
    }
  }

  // ---- per-window downsample from stats (StatsAggregate.downsample) ----

  private def directWindows(startMs: Long, endMs: Long, w: Long)
      : Map[Long, (Long, Double, Double, Double)] = {
    (startMs to endMs).filter(t => t >= 0 && t < 30)
      .groupBy(t => t - ((t - startMs) % w))
      .map { case (ws, ts) =>
        val vs = ts.map(_ * 2.0)
        ws -> (vs.size.toLong, vs.sum, vs.min, vs.max)
      }
  }

  private def viaDownsample(startMs: Long, endMs: Long, w: Long,
      raw: org.apache.spark.sql.DataFrame = data): Map[Long, Row] =
    StatsAggregate.downsample(raw, stats, "m", startMs, endMs, bucketMs, w)
      .collect().map(r => r.getAs[Long]("window_start") -> r).toMap

  // windows aligned (=bucket), multiple of bucket, straddling buckets
  // (15 over 10), unaligned start, range edges past the data
  for ((s, e, w) <- Seq((0L, 29L, 10L), (0L, 29L, 20L), (0L, 29L, 15L),
      (3L, 27L, 10L), (3L, 28L, 7L), (0L, 100L, 30L), (5L, 9L, 10L))) {
    test(s"stats downsample equals row scan on [$s,$e] w=$w") {
      val want = directWindows(s, e, w)
      val got = viaDownsample(s, e, w)
      assert(got.keySet == want.keySet)
      for ((ws, (n, sum, mn, mx)) <- want) {
        val r = got(ws)
        assert(r.getAs[Long]("n") == n, s"n at $ws")
        assert(math.abs(r.getAs[Double]("value_sum") - sum) < 1e-9, s"sum at $ws")
        assert(r.getAs[Double]("min_value") == mn, s"min at $ws")
        assert(r.getAs[Double]("max_value") == mx, s"max at $ws")
        assert(math.abs(r.getAs[Double]("avg_value") - sum / n) < 1e-9, s"avg at $ws")
      }
    }
  }

  test("covered aligned windows are answered WITHOUT reading raw rows") {
    // poison every raw value; stats stay real — equality with the clean
    // expectation proves no raw row participated
    val poisoned = data.withColumn("value", lit(1e9))
    val got = viaDownsample(0L, 29L, 10L, raw = poisoned)
    val want = directWindows(0L, 29L, 10L)
    for ((ws, (n, sum, _, _)) <- want)
      assert(got(ws).getAs[Long]("n") == n &&
        math.abs(got(ws).getAs[Double]("value_sum") - sum) < 1e-9)
  }

  test("engine serves eligible *_over_time from stats, falls back for matchers") {
    import graft.tsdb.{StreamCatalog, StreamDef, TsdbEngine, VType}
    val cat = new StreamCatalog(Seq(StreamDef("m", Map.empty, VType.F64),
      StreamDef("other", Map.empty, VType.F64)))
    val poisoned = data.withColumn("value", lit(1e9))
    val e = new TsdbEngine(spark, poisoned, cat, Some((stats, bucketMs)))
    // fully covered + aligned → answered from the (clean) stats sidecar
    val fromStats = TsdbFixtures.vectorOf(e.query("sum_over_time(m[10ms])", 0, 29)).toMap
    assert(fromStats === Map(0L -> 90.0, 10L -> 290.0, 20L -> 490.0))
    // last_over_time is not stats-expressible → raw scan (sees the poison)
    val lasts = TsdbFixtures.vectorOf(e.query("last_over_time(m[10ms])", 0, 29)).toMap
    assert(lasts.values.forall(_ == 1e9))
    // a label matcher disqualifies stats (per-name rows only) → raw scan
    val matched = TsdbFixtures.vectorOf(e.query("sum_over_time(m{a=\"b\"}[10ms])", 0, 29))
    assert(matched.isEmpty) // no stream carries that label → empty, not stats-served
  }

  test("graft_dot reaches SQL through the function registry") {
    // getOrCreate would return the shared fixture session (extensions are
    // bound at session build), so register into the live registry the
    // same way GraftExtensions does.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => graft.functions.DotProduct(exprs(0), exprs(1)),
      "built-in")
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
    // the extensions class itself builds its injection list cleanly
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("shingle-hash and intersect kernels reach SQL") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingle_hash60",
      exprs => graft.functions.ShingleHash60(exprs(0), 3),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect_count",
      exprs => graft.functions.SortedLongIntersectCount(exprs(0), exprs(1)),
      "built-in")
    val n = spark.sql(
      """SELECT graft_sorted_intersect_count(
        |  graft_shingle_hash60('a b c d'),
        |  graft_shingle_hash60('a b c e')) AS n""".stripMargin)
      .head().getInt(0)
    // shingles: {a b c, b c d} vs {a b c, b c e} share exactly one
    assert(n == 1)
  }

  test("winnow kernel reaches SQL and matches its tail rule") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_hash60",
      exprs => graft.functions.WinnowHash60(exprs(0), 2, 2),
      "built-in")
    // 'a b': one 2-gram < w -> tail rule emits its single fingerprint;
    // 'a b c': two grams = exactly one w-window -> one fingerprint
    val r = spark.sql(
      "SELECT graft_winnow_hash60('a b'), graft_winnow_hash60('a b c')")
      .head()
    assert(r.getSeq[Long](0).size == 1 && r.getSeq[Long](1).size == 1)
  }
}
