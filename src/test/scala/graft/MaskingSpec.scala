package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Masking
import graft.tsdb.TsdbFixtures.spark

/** Masking.spanCorrupt invariants: sentinel substitution restores the
  * document exactly, density is span per full block, spans stay inside
  * their block, and the pair set is layout-independent.
  */
class MaskingSpec extends AnyFunSuite {
  import spark.implicits._

  private val B = 16
  private val S = 3

  private def corrupt(docs: Seq[(Long, Seq[String])], parts: Int = 1) = {
    val df0 = docs.toDF("id", "toks")
    val df = if (parts > 1) df0.repartition(parts) else df0
    Masking.spanCorrupt(df, "id", "toks", block = B, span = S)
      .select("id", "masked_input", "targets", "n_masked")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
      .sortBy(_._1)
  }

  // docs of every length 0..40 (covers empty, sub-span, sub-block,
  // exact-block, multi-block, and every tail-length class mod 16)
  private val docs: Seq[(Long, Seq[String])] =
    (0L to 40L).map(i => i -> (1 to i.toInt).map(t => s"w$t"))

  private def sentinel(t: String) = t.startsWith("<extra_id_")

  /** targets "<extra_id_k> a b c <extra_id_j> d e f" -> k -> Seq(a,b,c) */
  private def parseTargets(tgt: String): Seq[(String, Seq[String])] = {
    if (tgt.isEmpty) return Nil
    val toks = tgt.split(" ").toSeq
    assert(sentinel(toks.head), s"targets must start with a sentinel: $tgt")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    toks.foreach { t =>
      if (sentinel(t)) out += ((t, Seq.empty))
      else { val (s0, run) = out.last; out(out.size - 1) = (s0, run :+ t) }
    }
    out.toSeq
  }

  test("sentinel substitution restores every document exactly") {
    corrupt(docs).foreach { case (id, inp, tgt, _) =>
      val byS = parseTargets(tgt).toMap
      val restored =
        (if (inp.isEmpty) Seq.empty[String] else inp.split(" ").toSeq)
          .flatMap(t => if (sentinel(t)) byS(t) else Seq(t))
      assert(restored == (1 to id.toInt).map(t => s"w$t"), s"doc $id")
    }
  }

  test("density: span tokens masked per block of >= span tokens") {
    corrupt(docs).foreach { case (id, _, tgt, nMasked) =>
      val n = id.toInt
      val maskedBlocks = (0 until (n + B - 1) / B)
        .count(k => math.min(B, n - k * B) >= S)
      assert(nMasked == S * maskedBlocks, s"doc $id")
      val runs = parseTargets(tgt)
      assert(runs.size == maskedBlocks && runs.forall(_._2.size == S),
        s"doc $id: every masked run must be exactly $S tokens")
    }
  }

  test("each span is consecutive and stays inside its numbered block") {
    corrupt(docs).foreach { case (id, _, tgt, _) =>
      parseTargets(tgt).foreach { case (s0, run) =>
        val k = s0.stripPrefix("<extra_id_").stripSuffix(">").toInt
        val idx = run.map(_.stripPrefix("w").toInt)
        assert(idx == (idx.head until idx.head + S),
          s"doc $id block $k: span not consecutive: $run")
        assert((idx.head - 1) / B == k && (idx.last - 1) / B == k,
          s"doc $id: span $run escapes block $k")
      }
    }
  }

  test("layout-independent: identical pairs on any partitioning") {
    assert(corrupt(docs) sameElements corrupt(docs, parts = 7))
  }

  test("degenerate inputs: empty doc and all-tail doc") {
    val out = corrupt(Seq(0L -> Seq.empty[String], 1L -> Seq("a", "b")))
    assert(out(0) == ((0L, "", "", 0)))
    assert(out(1) == ((1L, "a b", "", 0)), "2-token doc is one sub-span tail")
  }
}
