package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeRank
import graft.tsdb.TsdbFixtures.spark

/** RangeRank's two-pass global ranking must equal Spark's own
  * single-partition window, bucket for bucket, on awkward sizes (n not
  * divisible by k, n < partitions, k > n).
  */
class RangeRankSpec extends AnyFunSuite {
  import spark.implicits._

  private def fixture(n: Int) = {
    // keys deliberately unsorted and non-unique on the primary column;
    // (v, id) is the unique total order
    (0 until n).map(i => ((i * 37) % 11, i.toLong)).toDF("v", "id")
  }

  test("globalRowNumber equals the global-window row_number") {
    for (n <- Seq(1, 7, 100)) {
      val df = fixture(n)
      val expect = df
        .withColumn("rn", row_number().over(Window.orderBy($"v", $"id")))
        .select($"id", $"rn").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = RangeRank.globalRowNumber(df, Seq($"v", $"id"), numPartitions = 4)
        .select($"id", $"grank", $"gcount").collect()
      assert(got.length == n)
      got.foreach { r =>
        assert(r.getLong(1) == expect(r.getLong(0)).toLong, s"id ${r.getLong(0)}")
        assert(r.getLong(2) == n.toLong)
      }
    }
  }

  test("globalCumSum equals the global-window exclusive prefix sum") {
    for (n <- Seq(1, 7, 100); parts <- Seq(1, 4, 13)) {
      val df = fixture(n).withColumn("w", ($"id" % 5) + 1)
      val expect = df.withColumn("c",
        coalesce(sum($"w").over(Window.orderBy($"v", $"id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select($"id", $"c").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = RangeRank.globalCumSum(df, Seq($"v", $"id"), "w", parts)
        .select($"id", $"gcum").collect()
      assert(got.length == n)
      got.foreach(r => assert(r.getLong(1) == expect(r.getLong(0)),
        s"n=$n parts=$parts id=${r.getLong(0)}"))
    }
  }

  test("groupedCumSum equals the per-group window exclusive prefix sum") {
    // few groups + many partitions is the exact low-cardinality regime
    // the operator exists for: a group MUST span partitions and still
    // accumulate correctly across them
    for (n <- Seq(1, 7, 100); parts <- Seq(1, 4, 13)) {
      val df = fixture(n)
        .withColumn("g", $"id" % 3) // 3 groups
        .withColumn("w", ($"id" % 5) + 1)
      val expect = df.withColumn("c",
        coalesce(sum($"w").over(Window.partitionBy($"g").orderBy($"v", $"id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select($"id", $"c").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = RangeRank.groupedCumSum(df, Seq("g"), Seq($"v", $"id"), "w", parts)
        .select($"id", $"gcum").collect()
      assert(got.length == n)
      got.foreach(r => assert(r.getLong(1) == expect(r.getLong(0)),
        s"n=$n parts=$parts id=${r.getLong(0)}"))
    }
  }

  test("groupedCumSum: null weights count as zero, single group works") {
    val df = Seq((1L, "a", Some(3L)), (2L, "a", None), (3L, "a", Some(4L)))
      .toDF("id", "g", "w")
    val got = RangeRank.groupedCumSum(df, Seq("g"), Seq($"id"), "w", 4)
      .select($"id", $"gcum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (2L, 3L), (3L, 3L)))
  }

  test("Packing.pack: bins cut at capacity, straddling docs keep start bin") {
    val df = Seq((1L, 3L), (2L, 4L), (3L, 6L), (4L, 2L))
      .toDF("id", "w") // prefix sums: 0, 3, 7, 13
    val got = graft.operators.Packing.pack(df, Seq($"id"), "w", capacity = 5L)
      .select($"id", $"gcum", $"bin", $"bin_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, 0L, 0L),   // fills 0..2 of bin 0
      (2L, 3L, 0L, 3L),   // starts at 3, straddles into bin 1
      (3L, 7L, 1L, 2L),   // starts inside bin 1, straddles into bin 2
      (4L, 13L, 2L, 3L)))
  }

  test("Packing.packSpans: straddling docs emit one span per covered block") {
    val df = Seq((1L, 3L), (2L, 4L), (3L, 6L), (4L, 2L), (5L, 0L))
      .toDF("id", "w") // prefix sums: 0, 3, 7, 13; zero-weight doc dropped
    val got = graft.operators.Packing
      .packSpans(df, Seq($"id"), "w", capacity = 5L)
      .select($"id", $"bin", $"span_start", $"span_len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, 0L, 3L),            // tokens 0..2 of bin 0
      (2L, 0L, 0L, 2L), (2L, 1L, 2L, 2L), // straddles 0|1 at token 5
      (3L, 1L, 0L, 3L), (3L, 2L, 3L, 3L), // straddles 1|2 at token 10
      (4L, 2L, 0L, 2L)))           // fits inside bin 2
    // reconstruction invariants: per-doc spans cover the doc exactly,
    // and every block except the last holds exactly `capacity` tokens
    val byDoc = got.groupBy(_._1).view.mapValues(_.toList.map(_._4).sum).toMap
    assert(byDoc == Map(1L -> 3L, 2L -> 4L, 3L -> 6L, 4L -> 2L))
    val byBin = got.groupBy(_._2).view.mapValues(_.toList.map(_._4).sum).toMap
    assert(byBin == Map(0L -> 5L, 1L -> 5L, 2L -> 5L))
    graft.engine.Caches.release()
  }

  test("ntileFromRank + percentRankFromRank equal the window functions") {
    for (n <- Seq(1, 7, 10, 23); k <- Seq(1, 3, 4, 30)) {
      val df = fixture(n)
      val w = Window.orderBy($"v", $"id")
      val expect = df.select($"id",
          ntile(k).over(w).as("nt"),
          percent_rank().over(w).as("pr"))
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
      val got = RangeRank.globalRowNumber(df, Seq($"v", $"id"), numPartitions = 3)
        .select($"id",
          RangeRank.ntileFromRank($"grank", $"gcount", k).cast("int").as("nt"),
          RangeRank.percentRankFromRank($"grank", $"gcount").as("pr"))
        .collect()
      got.foreach { r =>
        val (nt, pr) = expect(r.getLong(0))
        assert(r.getInt(1) == nt, s"n=$n k=$k id=${r.getLong(0)}")
        assert(math.abs(r.getDouble(2) - pr) < 1e-12, s"n=$n k=$k id=${r.getLong(0)}")
      }
    }
  }
}
