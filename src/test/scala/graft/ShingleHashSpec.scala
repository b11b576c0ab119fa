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

  test("null text yields null") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c"))).toDF("id", "text")
    val out = df.select(ShingleHash.shingleHashes60($"text", 3).as("hs"))
      .collect().map(r => Option(r.get(0)))
    assert(out(0).isEmpty && out(1).nonEmpty)
  }
}
