package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation
import graft.tsdb.TsdbFixtures.spark

/** Contract of the public one-call curation pipeline: stage knobs do
  * what they claim on a corpus with one planted near-dup pair and one
  * low-quality doc. (The pp01 gate verifies the full composition
  * against a recursive-CTE DuckDB oracle; this pins the API's knob
  * semantics.)
  */
class CurationSpec extends AnyFunSuite {
  import spark.implicits._

  // 20 good docs (0..19), one near-copy of doc 0 (id 100), one
  // low-quality short/digit-heavy doc (id 200)
  private def corpus = {
    // digit-free long-token docs so the default 0.55 quality gate
    // passes; every token carries the doc letter so distinct docs share
    // no shingles at all
    val good = (0 until 20).map { i =>
      val toks = (0 until 220).map { j =>
        "tok" + ('a' + i).toChar + "abcdef" + ('a' + j % 26).toChar
      }
      (i.toLong, toks.mkString(" "))
    }
    val nearDup = (100L, good.head._2 + " tail")
    val junk = (200L, "12 34 56")
    (good :+ nearDup :+ junk).toDF("doc_id", "text")
  }

  private def ids(opts: Curation.Opts): Set[Long] =
    Curation.curate(corpus, "doc_id", "text", opts)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("defaults: near-dup keeps the min id, junk is quality-gated out") {
    val kept = ids(Curation.Opts(sampleFraction = 1.0))
    assert(!kept.contains(200L), "low-quality doc survived the gate")
    assert(kept.contains(0L) && !kept.contains(100L),
      "keep-one should retain the cluster minimum only")
    assert((0 until 20).forall(i => kept.contains(i.toLong)))
  }

  test("qualityMin=0 admits junk; dedup threshold=1.01 disables keep-one") {
    val all = ids(Curation.Opts(qualityMin = 0.0, jaccardThreshold = 1.01,
      sampleFraction = 1.0))
    assert(all == corpus.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("idCol literally named \"id\" does not collide with components' output") {
    val byId = corpus.withColumnRenamed("doc_id", "id")
    val kept = Curation.curate(byId, "id", "text",
        Curation.Opts(sampleFraction = 1.0))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == ids(Curation.Opts(sampleFraction = 1.0)))
  }

  test("sampleFraction subsets the full-sample result deterministically") {
    val full = ids(Curation.Opts(sampleFraction = 1.0))
    val half = ids(Curation.Opts(sampleFraction = 0.5))
    assert(half.subsetOf(full))
    assert(half == ids(Curation.Opts(sampleFraction = 0.5)), "not deterministic")
  }

  test("packing output carries contiguous bins under the token budget") {
    val out = Curation.curate(corpus, "doc_id", "text",
      Curation.Opts(sampleFraction = 1.0, binTokens = 100L))
    val rows = out.select("doc_id", "n_tokens", "gcum", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // gcum is the exclusive prefix sum in doc_id order; bin = gcum / budget
    var acc = 0L
    rows.foreach { case (id, n, gcum, bin) =>
      assert(gcum == acc, s"doc $id gcum")
      assert(bin == gcum / 100L, s"doc $id bin")
      acc += n
    }
  }

  test("pre-paid whole-corpus pairs ≡ recomputing them on survivors") {
    // bridge doc: A(0) ~ B(300) ~ C(301) chain where only B fails the
    // (raised) quality gate — the restricted pair graph must SPLIT the
    // cluster so A and C BOTH survive keep-one, exactly as a PPJoin
    // over the survivors alone would conclude. Geometry: B = A's first
    // 111 tokens (109 of A's 218 shingles -> jac(A,B) = 109/218 = 0.5
    // exactly); C = those same 111 tokens + 109 fresh ones
    // (jac(B,C) = 0.5; jac(A,C) = 109/327 ≈ 0.33 — no direct edge).
    // Quality: 220-token docs score 1.0, the 111-token bridge 0.7775,
    // so qualityMin = 0.9 gates exactly B.
    def tok(tag: String, j: Int) = s"tok$tag" + "abcdef" + (100 + j)
    val shared = (0 until 111).map(tok("s", _))
    val a = (shared ++ (0 until 109).map(tok("a", _))).mkString(" ")
    val b = shared.mkString(" ")
    val c = (shared ++ (0 until 109).map(tok("c", _))).mkString(" ")
    val docs = Seq((0L, a), (300L, b), (301L, c)).toDF("doc_id", "text")
    val opts = Curation.Opts(qualityMin = 0.9, sampleFraction = 1.0)
    val fullPairs = graft.dedup.Dedup.jaccardPairs(
      docs, "doc_id", "text", nGram = opts.nGram,
      threshold = opts.jaccardThreshold)
    // the premise: with B present the full graph is one A-B-C chain
    assert(fullPairs.count() == 2L,
      s"expected the two bridge edges, got ${fullPairs.collect().toSeq}")
    def keptIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val viaPairs = keptIds(Curation.curate(docs, "doc_id", "text", opts,
      pairs = Some(Curation.PrepaidPairs(fullPairs,
        opts.jaccardThreshold, opts.nGram))))
    val recomputed = keptIds(Curation.curate(docs, "doc_id", "text", opts))
    assert(viaPairs == recomputed)
    assert(viaPairs == Set(0L, 301L),
      "bridge removal must split the cluster: A and C both survive")
    // a pair table tagged with DIFFERENT parameters fails loudly
    // instead of silently skewing clusters
    val e = intercept[IllegalArgumentException](
      Curation.curate(docs, "doc_id", "text", opts,
        pairs = Some(Curation.PrepaidPairs(fullPairs, 0.8, opts.nGram))))
    assert(e.getMessage.contains("threshold"), e.getMessage)
  }
}
