package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.tsdb.{StreamCatalog, StreamDef, TsdbEngine, TsdbFixtures, VType}
import graft.tsdb.TsdbFixtures.spark

/** Property-based tests for the algebraic specs called out in SURVEY §5:
  * the coercion lattice (pure) and the interpolation alignment
  * (Spark-backed, small case counts to keep runtime sane).
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampler (no scalatestplus bridge in the offline
    * dependency cache): n seeded samples per property.
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  // ---- coercion lattice (lib.rs:63-73): pure, exhaustive ----

  val types = Seq(VType.I64, VType.U64, VType.F64)

  test("lattice: commutative, idempotent, F64-absorbing, U64-neutral") {
    for (a <- types; b <- types) {
      assert(VType.combine(a, b) == VType.combine(b, a))
      assert(VType.combine(a, a) == a)
      assert(VType.combine(a, VType.F64) == VType.F64)
      assert(VType.combine(a, VType.U64) == a)
    }
    for (a <- types; b <- types; c <- types)
      assert(VType.combine(VType.combine(a, b), c) ==
        VType.combine(a, VType.combine(b, c)))
  }

  // ---- interpolation alignment invariants ----

  private val seriesGen: Gen[List[(Long, Double)]] = for {
    n <- Gen.choose(1, 8)
    ts <- Gen.listOfN(n, Gen.choose(0L, 60L)).map(_.distinct.sorted)
    vs <- Gen.listOfN(ts.size, Gen.choose(0L, 100L).map(_.toDouble))
  } yield ts.zip(vs)

  private def engineFor(a: List[(Long, Double)], b: List[(Long, Double)]): TsdbEngine = {
    val rows = a.map { case (t, v) => ("a", Map.empty[String, String], t, v) } ++
      b.map { case (t, v) => ("b", Map.empty[String, String], t, v) }
    new TsdbEngine(spark, TsdbFixtures.longDf(rows), new StreamCatalog(Seq(
      StreamDef("a", Map.empty, VType.U64), StreamDef("b", Map.empty, VType.U64))))
  }

  /** Reference interpolation (vector_to_vector.rs:35-64) in plain Scala. */
  private def refInterp(s: List[(Long, Double)], t: Long): Double = {
    s.find(_._1 == t).map(_._2).getOrElse {
      val before = s.filter(_._1 < t)
      val after = s.filter(_._1 > t)
      if (before.isEmpty) after.head._2
      else if (after.isEmpty) before.last._2
      else {
        val (t1, v1) = before.last
        val (t2, v2) = after.head
        math.round(v1 + (v2 - v1) * (t - t1).toDouble / (t2 - t1).toDouble).toDouble
      }
    }
  }

  test("align: output = union of timestamps; values match reference math") {
    for ((a, b) <- samples(seriesGen, 8).zip(samples(seriesGen.map(_.reverse.map(identity)), 8).map(_.sortBy(_._1)))) {
      if (a.nonEmpty && b.nonEmpty) {
        val got = TsdbFixtures.vectorOf(engineFor(a, b).query("a + b", 0, 100)).toMap
        val union = (a.map(_._1) ++ b.map(_._1)).distinct.sorted
        assert(got.keySet == union.toSet)
        union.foreach { t =>
          assert(got(t) == refInterp(a, t) + refInterp(b, t),
            s"at t=$t: a=$a b=$b")
        }
      }
    }
  }

  // ---- as-of join invariant vs a plain-Scala reference ----

  test("asof backward join equals reference lookup") {
    import org.apache.spark.sql.functions._
    for ((l, r) <- samples(seriesGen, 5).zip(samples(seriesGen.map(_.map { case (t, v) => (t + 1, v) }), 5))) {
      if (l.nonEmpty && r.nonEmpty) {
        import spark.implicits._
        val left = l.map { case (t, v) => (1L, t, v) }.toDF("k", "ts", "v")
        val right = r.map { case (t, v) => (1L, t, v) }.toDF("k", "ts", "rv")
        val got = graft.operators.AsOfJoin.backward(left, right, "k", "ts", "rv")
          .select($"ts", $"asof_rv").collect()
          .map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Double]))
          .toMap
        l.foreach { case (t, _) =>
          val expect = r.filter(_._1 <= t).sortBy(_._1).lastOption.map(_._2)
          assert(got(t) == expect, s"at t=$t: l=$l r=$r")
        }
      }
    }
  }

  // ---- bucketed align ≡ exact align on random series ----

  test("interpolatedBucketed equals global interpolated") {
    for ((a, b) <- samples(seriesGen, 6).zip(samples(seriesGen.map(_.map {
        case (t, v) => (t + 3, v) }), 6))) {
      if (a.nonEmpty && b.nonEmpty) {
        val mk = (s: List[(Long, Double)]) => TsdbFixtures.longDf(
          s.map { case (t, v) => ("x", Map.empty[String, String], t, v) })
          .select(org.apache.spark.sql.functions.col("timestamp"),
            org.apache.spark.sql.functions.col("value"))
        val exact = graft.tsdb.Align.interpolated(mk(a), mk(b), roundInterpolated = true)
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
        val bucketed = graft.tsdb.Align.interpolatedBucketed(
          mk(a), mk(b), roundInterpolated = true, bucketMs = 7L)
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
        assert(bucketed.toSeq == exact.toSeq, s"a=$a b=$b")
      }
    }
  }

  // ---- minhash determinism under repartitioning ----

  test("minhash pairs stable under input partitioning") {
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong, s"tok${i % 7} " * 10 + s"word$i a b c d e f g"))
    val df1 = docs.toDF("doc_id", "text").repartition(1)
    val df8 = docs.toDF("doc_id", "text").repartition(8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      graft.dedup.Dedup.minhashPairs(df, "doc_id", "text", threshold = 0.3)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(df1) == pairs(df8))
  }
}
