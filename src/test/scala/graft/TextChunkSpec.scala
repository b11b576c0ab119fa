package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions.tokenChunks
import graft.tsdb.TsdbFixtures.spark

/** tokenChunks boundary semantics: full coverage, no pure-suffix final
  * chunk, single chunk for short docs, none for empty ones.
  */
class TextChunkSpec extends AnyFunSuite {
  import spark.implicits._

  private def chunksOf(n: Int, chunkSize: Int, stride: Int): Seq[Seq[Int]] = {
    val toks = (1 to n).map(_.toString)
    Seq(toks.mkString(" ")).toDF("text")
      .select(tokenChunks(split(col("text"), " "), chunkSize, stride).as("c"))
      .head().getSeq[String](0)
      .map(_.split(" ").filter(_.nonEmpty).map(_.toInt).toSeq)
  }

  test("every token covered; last chunk is never a suffix of the previous") {
    for (n <- Seq(1, 10, 40, 41, 50, 51, 89, 90, 91, 130); (cs, st) <- Seq((50, 40), (50, 50), (8, 3))) {
      val cs_ = chunksOf(n, cs, st)
      val covered = cs_.flatten.toSet
      assert(covered == (1 to n).toSet, s"n=$n cs=$cs st=$st coverage")
      cs_.sliding(2).foreach {
        case Seq(a, b) =>
          assert(!a.containsSlice(b) || b.size > a.size - (a.indexOfSlice(b)),
            s"n=$n cs=$cs st=$st: chunk $b is a pure suffix of $a")
          assert(b.last > a.last, s"n=$n cs=$cs st=$st: no new tokens in $b")
        case _ => ()
      }
    }
  }

  test("short and empty docs") {
    assert(chunksOf(3, 50, 40) == Seq(Seq(1, 2, 3)))
    val empty = Seq("").toDF("text")
      .select(tokenChunks(array().cast("array<string>"), 50, 40).as("c"))
      .head().getSeq[String](0)
    assert(empty.isEmpty)
  }

  private def one(in: String, f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column): String =
    Seq(in).toDF("t").select(f(col("t"))).head().getString(0)

  test("dedupLinesWithin keeps first occurrences; idempotent; empty-line aware") {
    import graft.functions.TextFunctions.dedupLinesWithin
    assert(one("a\nb\na\nc\nb", dedupLinesWithin) == "a\nb\nc")
    assert(one("a\nb\nc", dedupLinesWithin) == "a\nb\nc") // idempotent form
    assert(one("x\n\ny\n\nx", dedupLinesWithin) == "x\n\ny") // "" is a line
    assert(one("", dedupLinesWithin) == "")
  }

  test("stripHtml drops tags, decodes entities one level, collapses space") {
    import graft.functions.TextFunctions.stripHtml
    assert(one("<p>a  b</p>\n<div>c</div>", stripHtml) == "a b c")
    assert(one("x &amp; y &lt;z&gt; &quot;w&quot; &#39;v&#39;", stripHtml)
      == "x & y <z> \"w\" 'v'")
    // double-encoded decodes ONE level (amp applied last)
    assert(one("&amp;lt;", stripHtml) == "&lt;")
    assert(one("<br/>", stripHtml) == "")
  }

  test("normalizeText: lowercase, fixed accent fold, whitespace collapse") {
    import graft.functions.TextFunctions.normalizeText
    assert(one("  Héllo\t\tWörld \n", normalizeText) == "hello world")
    assert(one("Çà ÉTÉ naïve œuvre", normalizeText) == "ca ete naive ouvre")
    // the fold table is fixed: unmapped scripts pass through unchanged
    assert(one("Straße 北京", normalizeText) == "straße 北京")
    // idempotent (a normalized key re-normalizes to itself)
    assert(one(one("  MiXeD   caSe  ", normalizeText), normalizeText)
      == "mixed case")
  }
}
