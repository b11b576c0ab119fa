package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain
import graft.tsdb.TsdbFixtures.spark

/** Distributed BPE training must match a sequential reference —
  * position-wise pair counting, lexicographic tie-break, leftmost
  * non-overlapping merge application — on the textbook corpus and on
  * an overlap-heavy word, and behave sanely on real corpus counts.
  */
class BpeTrainSpec extends AnyFunSuite {
  import spark.implicits._

  private val textbook =
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  private def refApply(syms: List[String], a: String, b: String): List[String] = {
    val out = mutable.ListBuffer.empty[String]
    var carry = ""
    for (s <- syms) {
      if (carry == a && s == b) { out += (a + b); carry = "" }
      else { if (carry.nonEmpty) out += carry; carry = s }
    }
    if (carry.nonEmpty) out += carry
    out.toList
  }

  private def refFit(words: Seq[(String, Long)], k: Int)
      : (Seq[(String, String, Long)], Map[String, List[String]]) = {
    var t = words.map { case (w, n) => (w, w.split("").toList, n) }
    val ms = Seq.newBuilder[(String, String, Long)]
    var stop = false
    for (_ <- 0 until k if !stop) {
      val counts = mutable.Map.empty[(String, String), Long]
      for ((_, syms, n) <- t; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        ms += ((a, b, c))
        t = t.map { case (w, s, n) => (w, refApply(s, a, b), n) }
      }
    }
    (ms.result(), t.map { case (w, s, _) => w -> s }.toMap)
  }

  test("fit and encodeWords match the reference on the textbook corpus") {
    val words = textbook.toDF("word", "n")
    val got = BpeTrain.fit(words, 6).map(m => (m.a, m.b, m.count))
    val (want, wantSyms) = refFit(textbook, 6)
    assert(got == want, s"merges diverge:\n got $got\nwant $want")
    // the classic first merges: (e,s) 9 then (es,t) 9
    assert(got.take(2) == Seq(("e", "s", 9L), ("es", "t", 9L)))
    val enc = BpeTrain.encodeWords(words, BpeTrain.fit(words, 6))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(enc == wantSyms)
  }

  test("overlapping pairs merge leftmost-first, non-overlapping") {
    val words = Seq(("aaaa", 1L)).toDF("word", "n")
    val m = BpeTrain.fit(words, 2).map(x => (x.a, x.b, x.count))
    // round 1: (a,a) counted at 3 positions; apply -> [aa, aa]
    // round 2: (aa,aa) once
    assert(m == Seq(("a", "a", 3L), ("aa", "aa", 1L)))
    val enc = BpeTrain.encodeWords(words, BpeTrain.fit(words, 2))
      .collect().head.getSeq[String](1)
    assert(enc == Seq("aaaa"))
  }

  test("real corpus counts: max merge count is non-increasing; OOV chars survive") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(graft.functions.TextFunctions.tokens(org.apache.spark.sql
        .functions.col("text")).as("toks"))
    val wc = BpeTrain.wordCounts(docs, "toks")
    val merges = BpeTrain.fit(wc, 5)
    assert(merges.size == 5)
    assert(merges.map(_.count) == merges.map(_.count).sorted.reverse,
      s"max pair count must not increase: ${merges.map(_.count)}")
    // an unseen word falls back to characters (no merge applies)
    val enc = BpeTrain.encodeWords(Seq(("zzqqzz", 1L)).toDF("word", "n"), merges)
      .collect().head.getSeq[String](1)
    assert(enc == Seq("z", "z", "q", "q", "z", "z"))
  }
}
