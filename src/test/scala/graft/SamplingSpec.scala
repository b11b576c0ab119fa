package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling
import graft.tsdb.TsdbFixtures.spark

/** The deterministic-sampling contracts the gates can't pin directly:
  * layout independence (same result on any partition count) and the
  * statistical shape of the temperature mix.
  */
class SamplingSpec extends AnyFunSuite {
  import spark.implicits._

  test("shuffleOrder is a permutation, reproducible across layouts") {
    val ids = (0 until 500).map(_.toLong)
    val a = Sampling.shuffleOrder(ids.toDF("id").repartition(3), $"id", 7L)
      .select($"id", $"pos").collect().map(r => r.getLong(0) -> r.getLong(1))
    val b = Sampling.shuffleOrder(ids.toDF("id").repartition(17), $"id", 7L)
      .select($"id", $"pos").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(a.map(_._2).sorted.toSeq == (1L to 500L)) // a true permutation
    assert(a.toMap == b.toMap) // layout-independent
    // not the identity order (the hash actually shuffles)
    assert(a.toMap.toSeq.sortBy(_._1).map(_._2) != (1L to 500L))
    graft.engine.Caches.release()
  }

  test("clusterCap: per-cluster cap, tail passthrough, layout-independent") {
    // cells 0/1/2 sized 50/10/3 — cap 10 trims 0, keeps 1 whole (at the
    // cap boundary), passes 2 through
    val rows = ((0 until 50).map(i => (i.toLong, 0)) ++
      (50 until 60).map(i => (i.toLong, 1)) ++
      (60 until 63).map(i => (i.toLong, 2)))
    def run(parts: Int) =
      Sampling.clusterCap(
          rows.toDF("id", "cell").repartition(parts), $"id", "cell", 10)
        .select($"id", $"cell").collect().map(r => r.getLong(0) -> r.getInt(1))
    val a = run(3)
    assert(a.count(_._2 == 0) === 10)
    assert(a.filter(_._2 == 1).map(_._1).sorted.toSeq === (50L until 60L))
    assert(a.filter(_._2 == 2).map(_._1).sorted.toSeq === (60L until 63L))
    // the kept cell-0 subset is hash-chosen, not the first ids
    assert(a.filter(_._2 == 0).map(_._1).sorted.toSeq != (0L until 10L))
    assert(a.toSet === run(11).toSet) // layout-independent
    graft.engine.Caches.release()
  }

  test("shuffleOrder re-deals under a different seed") {
    val ids = (0 until 500).map(_.toLong).toDF("id")
    val a = Sampling.shuffleOrder(ids, $"id", 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.shuffleOrder(ids, $"id", 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a != b)
    graft.engine.Caches.release()
  }

  test("temperatureMix: tau=1 keeps the natural shares, tau<1 flattens") {
    // 1800 rows in dom "big", 200 in dom "small"
    val df = ((0 until 1800).map(i => (i.toLong, "big")) ++
      (1800 until 2000).map(i => (i.toLong, "small"))).toDF("id", "dom")
    def shares(tau: Double) = Sampling
      .temperatureMix(df, $"dom", $"id", tau, targetFraction = 0.4)
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nat = shares(1.0)
    // tau=1: every domain keeps ~ the target fraction (hash-bucket noise)
    assert(math.abs(nat("big") / 1800.0 - 0.4) < 0.05)
    assert(math.abs(nat("small") / 200.0 - 0.4) < 0.08)
    val flat = shares(0.5)
    // tau=0.5: the small domain's retention RATE must exceed the big
    // one's — that is the whole point of the temperature
    assert(flat("small") / 200.0 > flat("big") / 1800.0)
    // and the small domain keeps more than its natural-share sample
    assert(flat("small") > nat("small"))
  }

  test("unimax: water-filling saturates small domains, splits the rest evenly") {
    // domains: a=100 rows, b=100, c=800; budget 600, maxEpochs 2
    // caps (2n): a=200, b=200, c=1600. Sorted asc: a, b, c.
    //  a: 200*3=600 <= 600           -> saturated (quota 200, rate 2.0)
    //  b: 200*2=400 <= 600-200=400   -> saturated (quota 200, rate 2.0)
    //  c: 1600*1 <= 600-400=200? no  -> theta = 200, rate 200/800 = 0.25
    val rows = (0 until 100).map(i => (s"a$i", "a")) ++
      (0 until 100).map(i => (s"b$i", "b")) ++
      (0 until 800).map(i => (s"c$i", "c"))
    val df = rows.toDF("id", "dom")
    val out = Sampling.unimax(df, $"dom", $"id", budgetRows = 600L,
      maxEpochs = 2.0).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byDom = out.groupBy(_._2).view.mapValues(_.length).toMap
    // a and b replicate to exactly 2 epochs each (integral rate: exact)
    assert(byDom("a") == 200 && byDom("b") == 200)
    // every a-row appears with epochs 1 and 2
    assert(out.filter(_._2 == "a").groupBy(_._1).forall(_._2.map(_._3).sorted
      .sameElements(Seq(1L, 2L))))
    // c samples at ~0.25 to hash resolution, single epoch
    assert(math.abs(byDom("c") - 200) <= 20)
    assert(out.filter(_._2 == "c").forall(_._3 == 1L))
    // layout independence: same realized corpus on a different split
    val again = Sampling.unimax(df.repartition(13), $"dom", $"id", 600L, 2.0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSet == again.toSet)
  }

  test("unimax/temperatureMix: a null domain emits its quota (null-safe join)") {
    // null-domain rows consume budget in the water-fill; the join back
    // must be null-safe or they silently vanish and under-fill
    val df = ((0 until 40).map(i => (s"x$i", "x")) ++
      (0 until 40).map(i => (s"n$i", null: String))).toDF("id", "dom")
    val uni = Sampling.unimax(df, $"dom", $"id", budgetRows = 160L,
      maxEpochs = 2.0).collect()
    // both domains saturate at 2 epochs: 160 rows total, 80 of them null
    assert(uni.length == 160)
    assert(uni.count(_.isNullAt(1)) == 80)
    val mix = Sampling.temperatureMix(df, $"dom", $"id", tau = 1.0,
      targetFraction = 1.0).collect()
    assert(mix.length == 80 && mix.count(_.isNullAt(1)) == 40)
  }

  test("unimax: an oversized budget caps every domain at maxEpochs") {
    val df = ((0 until 30).map(i => (s"x$i", "x")) ++
      (0 until 10).map(i => (s"y$i", "y"))).toDF("id", "dom")
    val out = Sampling.unimax(df, $"dom", $"id", budgetRows = 100000L,
      maxEpochs = 3.0).collect()
    assert(out.length == 120) // 3 * (30 + 10): nothing exceeds the cap
    intercept[IllegalArgumentException] {
      Sampling.unimax(df, $"dom", $"id", 0L, 2.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.unimax(df, $"dom", $"id", 10L, 0.0)
    }
  }

  test("temperatureMix clamps oversubscribed domains at keep-everything") {
    // tiny domain + strong flattening: its raw rate exceeds 1
    val df = ((0 until 1990).map(i => (i.toLong, "big")) ++
      (1990 until 2000).map(i => (i.toLong, "tiny"))).toDF("id", "dom")
    val kept = Sampling.temperatureMix(df, $"dom", $"id", tau = 0.1,
        targetFraction = 0.5)
      .where($"dom" === "tiny").count()
    assert(kept == 10L) // every tiny-domain row survives
  }
}
