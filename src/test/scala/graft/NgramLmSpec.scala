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

  test("stupid backoff takes all three branches with hand-computed scores") {
    // training: "a b c" x2, "b c d" x1
    // trigram counts: (a,b,c)=2, (b,c,d)=1; bigrams: (a,b)=2 (b,c)=3 (c,d)=1
    // unigrams: a=2 b=3 c=3 d=1; N = 9
    val train = Seq(
      (1L, Seq("a", "b", "c")), (2L, Seq("a", "b", "c")),
      (3L, Seq("b", "c", "d"))).toDF("doc_id", "toks")
    val m = NgramLm.fitTrigram(train, "toks")
    assert(m.n == 9)
    val probe = Seq(
      (10L, Seq("a", "b", "c")), // seen trigram: 2 / c(a,b)=2 -> 1.0
      (11L, Seq("a", "b", "d")), // unseen tri, seen bigram? (b,d) unseen
                                 //  -> 0.4 * 0.4 * (c(d)=1)/9
      (12L, Seq("c", "a", "b")), // unseen tri, (a,b) seen -> 0.4 * 2/2
      (13L, Seq("a", "b", "zz")) // OOV -> 0.4 * 0.4 * max(0,1)/9
    ).toDF("doc_id", "toks")
    val got = NgramLm.stupidBackoff(probe, "doc_id", "toks", m)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("mean_log_s")).toMap
    assert(math.abs(got(10L) - math.log(1.0)) < 1e-12)
    assert(math.abs(got(11L) - math.log(0.16 * 1.0 / 9)) < 1e-12)
    assert(math.abs(got(12L) - math.log(0.4 * 1.0)) < 1e-12)
    assert(math.abs(got(13L) - math.log(0.16 * 1.0 / 9)) < 1e-12)
    graft.engine.Caches.release()
  }

  test("fitTrigram on an empty corpus yields n = 0 and scoring refuses") {
    val empty = Seq.empty[(Long, Seq[String])].toDF("doc_id", "toks")
    val m = NgramLm.fitTrigram(empty, "toks") // must not NPE on SUM-of-nothing
    assert(m.n == 0)
    intercept[IllegalArgumentException] {
      NgramLm.stupidBackoff(empty, "doc_id", "toks", m)
    }
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
