package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NgramLm
import graft.tsdb.TsdbFixtures.spark

/** The bigram LM must reproduce hand-computed add-k probabilities,
  * including the out-of-vocabulary paths (unseen bigram with seen
  * context; wholly unseen context) the self-scoring gate cannot reach.
  */
class NgramLmSpec extends AnyFunSuite {
  import spark.implicits._

  // training corpus: "a b" x3, "a c" x1, "b a" x1  -> V = {a,b,c} = 3
  // contexts: c1(a) = 4, c1(b) = 1
  private val train = Seq(
    (1L, Seq("a", "b")), (2L, Seq("a", "b")), (3L, Seq("a", "b")),
    (4L, Seq("a", "c")), (5L, Seq("b", "a"))).toDF("doc_id", "toks")

  test("perplexity matches hand-computed add-1 smoothing incl. OOV") {
    val m = NgramLm.fit(train, "toks")
    assert(m.v == 3)
    val score = Seq(
      (10L, Seq("a", "b", "x")), // seen bigram + OOV continuation
      (11L, Seq("x", "a"))       // wholly unseen context
    ).toDF("doc_id", "toks")
    val got = NgramLm.perplexity(score, "doc_id", "toks", m)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("ppl"))).toMap
    // doc 10: P(b|a) = (3+1)/(4+3) = 4/7; P(x|b) = (0+1)/(1+3) = 1/4
    val ppl10 = math.exp(-(math.log(4.0 / 7) + math.log(1.0 / 4)) / 2)
    // doc 11: P(a|x) = (0+1)/(0+3) = 1/3
    val ppl11 = math.exp(-math.log(1.0 / 3))
    assert(got(10L)._1 == 2 && math.abs(got(10L)._2 - ppl10) < 1e-12)
    assert(got(11L)._1 == 1 && math.abs(got(11L)._2 - ppl11) < 1e-12)
    graft.engine.Caches.release()
  }

  test("an in-distribution doc scores lower perplexity than a shuffled one") {
    val docs = (0 until 60).map { i =>
      (i.toLong, ("the quick brown fox jumps over the lazy dog and " * 3).trim
        .split(" ").toSeq)
    }.toDF("doc_id", "toks")
    val m = NgramLm.fit(docs, "toks")
    val probe = Seq(
      (100L, "the quick brown fox jumps".split(" ").toSeq),
      (101L, "dog quick the jumps brown".split(" ").toSeq))
      .toDF("doc_id", "toks")
    val p = NgramLm.perplexity(probe, "doc_id", "toks", m)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ppl")).toMap
    assert(p(100L) < p(101L),
      s"fluent order must beat shuffled order: $p")
    graft.engine.Caches.release()
  }
}
