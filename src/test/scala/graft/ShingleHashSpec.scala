package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Graft
import graft.functions.{ShingleHash, TextFunctions}

/** The native ShingleHash60 kernel must be bit-identical to the
  * declarative composition it replaces (whose DuckDB mirror is the
  * driver-gate oracle).
  */
class ShingleHashSpec extends AnyFunSuite {
  private lazy val spark = Graft.session("shinglehash-spec")
  import spark.implicits._

  private val edge = Seq(
    "",                       // no tokens
    "one",                    // < n tokens
    "one two",                // < n tokens
    "one two three",          // exactly one shingle
    "a b a b a b a b",        // repeated shingles (distinct matters)
    "  leading   and\ttrailing \n whitespace  ",
    "unicode éè tokens 你好 here ok",
    "xy vertical\ftab\rforms",
    "a a a a a a a a a a")

  test("kernel equals declarative composition on edge cases and corpus") {
    val docsEdge = edge.zipWithIndex.map(_.swap).toDF("id", "text")
    val corpus = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"doc_id".as("id"), $"text")
    for (df <- Seq(docsEdge, corpus); n <- Seq(2, 3)) {
      val both = df.select(
        ShingleHash.shingleHashes60($"text", n).as("native"),
        TextFunctions.shingleHashes(
          TextFunctions.wordShingles(TextFunctions.tokens($"text"), n)).as("decl"))
      assert(both.where(not($"native" <=> $"decl")).isEmpty,
        s"n=$n mismatch")
    }
  }

  test("byte stats match a reference computation") {
    val cases = Seq("", "a", "aaaa", "ab é 你好", "abcABC123 \t\n")
    val df = cases.zipWithIndex.map(_.swap).toDF("id", "text")
      .select($"id", graft.functions.ByteStatsFn.byteStats(
        encode($"text", "UTF-8")).as("bs"))
      .orderBy("id")
    val got = df.collect().map(r => r.getStruct(1))
    cases.zip(got).foreach { case (s, row) =>
      val bytes = s.getBytes("UTF-8").map(_ & 0xff)
      val hist = bytes.groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
      assert(row.getLong(0) == bytes.length)
      assert(row.getInt(1) == hist.size)
      assert(row.getLong(2) == hist.values.map(c => c * c).sum)
      val expTop = if (hist.isEmpty) -1
        else hist.toSeq.sortBy { case (b, c) => (-c, b) }.head._1
      assert(row.getInt(3) == expTop, s"top byte of '$s'")
    }
  }

  test("null text yields null") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c"))).toDF("id", "text")
    val out = df.select(ShingleHash.shingleHashes60($"text", 3).as("hs"))
      .collect().map(r => Option(r.get(0)))
    assert(out(0).isEmpty && out(1).nonEmpty)
  }
}
