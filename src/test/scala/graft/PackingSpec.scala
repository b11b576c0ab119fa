package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing
import graft.tsdb.TsdbFixtures.spark

/** The content-materialization invariant: slicing every span's token
  * range back out of its document and concatenating the slices in
  * stream order reconstructs the packed token stream EXACTLY — the
  * whole point of a training-file writer.
  */
class PackingSpec extends AnyFunSuite {
  import spark.implicits._

  private val toksFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    t => split(t, " ")

  test("span content concatenated in stream order rebuilds the token stream") {
    // ragged docs, capacity 5 → plenty of straddling spans
    val docs = (0 until 30)
      .map(i => (i.toLong, (0 until (i % 7 + 1)).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .repartition(4)
    val spans = Packing.packSpans(
      docs.select(col("doc_id"), col("n_tokens")),
      Seq(col("doc_id")), "n_tokens", capacity = 5L)
    val content = Packing.spanContent(spans, docs, "doc_id", "text", toksFn)
      .orderBy(col("bin"), col("doc_id"))
      .select(col("bin"), col("span_len"), col("content"))
      .collect()
    // every span's content has exactly span_len tokens...
    content.foreach { r =>
      assert(r.getString(2).split(" ").length.toLong == r.getLong(1),
        s"span ${r.toSeq}")
    }
    // ...bins fill to capacity except the last...
    val byBin = content.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).sum).toMap
    val lastBin = byBin.keys.max
    byBin.foreach { case (bin, tot) =>
      if (bin < lastBin) assert(tot == 5L, s"bin $bin holds $tot tokens")
      else assert(tot >= 1L && tot <= 5L)
    }
    // ...and the concatenation IS the stream: docs laid end-to-end in
    // pack order
    val stream = content.map(_.getString(2)).mkString(" ")
    val expected = docs.orderBy("doc_id").select("text")
      .as[String].collect().mkString(" ")
    assert(stream == expected)
  }

  test("packReport classifies fragments and accounts every token once") {
    // docs 3,7,4 tokens, capacity 5:
    //  bin 0: doc0 whole (3) + doc1 head (2)       -> full
    //  bin 1: doc1 mid (5)                          -> full
    //  bin 2: doc2 whole (4) + doc1 tail... order is doc_id: doc1's
    // spans are head(2)@bin0, mid(5)@bin1, tail... recompute: gcum
    // doc0=0, doc1=3, doc2=10. doc1 spans bins 0..1 (3+7=10 exclusive):
    // bin0 [0,5): tokens 0-1 (start 0? span_start = max(0, 0*5-3)=0,
    // len = min(7,5-3)-0 = 2 -> head; bin1 [5,10): start 2 len 5 ->
    // tail (2+5=7=n). doc2 g=10: bin2 whole (4).
    val t = Seq((0L, 3L), (1L, 7L), (2L, 4L)).toDF("doc_id", "n_tokens")
    val rep = Packing.packReport(t, Seq(col("doc_id")), "n_tokens", 5L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    assert(rep.toSeq == Seq(
      (0L, 2L, 1L, 1L, 0L, 0L, 5L, 1.0),   // doc0 whole + doc1 head
      (1L, 1L, 0L, 0L, 1L, 0L, 5L, 1.0),   // doc1 tail fills the block
      (2L, 1L, 1L, 0L, 0L, 0L, 4L, 0.8)))  // doc2 whole, final partial
    // a long doc produces mid fragments
    val long = Seq((0L, 13L)).toDF("doc_id", "n_tokens")
    val rep2 = Packing.packReport(long, Seq(col("doc_id")), "n_tokens", 5L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(rep2.toSeq == Seq((0L, 0L, 1L, 0L, 0L), (1L, 0L, 0L, 0L, 1L),
      (2L, 0L, 0L, 1L, 0L))) // head, mid, tail
    // token conservation: filled sums to the corpus token count
    assert(rep.map(_._7).sum == 14L)
  }

  test("a span id absent from docs fails loudly instead of vanishing") {
    val docs = Seq((0L, "a b c"), (1L, "d e"))
      .toDF("doc_id", "text")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val spans = Packing.packSpans(
      docs.select(col("doc_id"), col("n_tokens")),
      Seq(col("doc_id")), "n_tokens", capacity = 4L)
    val holey = docs.where(col("doc_id") =!= 1L)
    val e = intercept[Exception] {
      Packing.spanContent(spans, holey, "doc_id", "text", toksFn).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("absent from docs")), e.toString)
  }

  test("property: reconstruction holds for random corpora and capacities") {
    // seeded random corpora: varying doc counts, ragged lengths
    // (including 1-token docs), several capacities — the concrete
    // tests' invariant must hold for all of them
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 5 + rng.nextInt(40)
      val cap = 2L + rng.nextInt(9)
      val docs = (0 until n)
        .map { i =>
          val len = 1 + rng.nextInt(12)
          (i.toLong, (0 until len).map(j => s"x${trial}_${i}_$j").mkString(" "))
        }
        .toDF("doc_id", "text")
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .repartition(3)
      val spans = Packing.packSpans(
        docs.select(col("doc_id"), col("n_tokens")),
        Seq(col("doc_id")), "n_tokens", cap)
      val content = Packing.spanContent(spans, docs, "doc_id", "text", toksFn)
        .orderBy(col("bin"), col("doc_id"))
        .select(col("content")).as[String].collect()
      val expected = docs.orderBy("doc_id").select("text")
        .as[String].collect().mkString(" ")
      assert(content.mkString(" ") == expected,
        s"trial $trial (n=$n cap=$cap)")
    }
  }

  test("a document spanning many blocks is sliced without loss or overlap") {
    val docs = Seq((1L, (0 until 23).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("n_tokens", lit(23L))
    val spans = Packing.packSpans(
      docs.select(col("doc_id"), col("n_tokens")),
      Seq(col("doc_id")), "n_tokens", capacity = 5L)
    val content = Packing.spanContent(spans, docs, "doc_id", "text", toksFn)
      .orderBy("bin").select(col("content")).as[String].collect()
    assert(content.length == 5) // 23 tokens over capacity-5 blocks
    assert(content.mkString(" ") == (0 until 23).map(i => s"t$i").mkString(" "))
  }
}
