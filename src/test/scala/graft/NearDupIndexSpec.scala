package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{Dedup, NearDupIndex}
import graft.tsdb.TsdbFixtures.spark

/** The persisted index is semantically invisible: probing a stored
  * index must return exactly what the direct cross-corpus computation
  * returns, regardless of whether the index was built in one shot or
  * grown by appends, and probes must shingle with the width the index
  * was BUILT with, not a default.
  */
class NearDupIndexSpec extends AnyFunSuite {
  import spark.implicits._

  // Corpus with planted near-dups of every 5th doc; probe batch holds
  // near-copies of corpus docs 0/10/20 plus two novel docs.
  private def corpus: DataFrame =
    (0 until 40).map { i =>
      (i.toLong, (0 until 40).map(j => s"c${(i * 7 + j) % 13}_$j").mkString(" "))
    }.toDF("doc_id", "text")

  private def probe: DataFrame =
    Seq(0, 10, 20).map { i =>
      (i + 5000L, (0 until 40).map(j =>
        if (j == 15) "EDITED" else s"c${(i * 7 + j) % 13}_$j").mkString(" "))
    }.toDF("doc_id", "text").unionAll(
      Seq((9000L, "entirely novel text one two three"),
        (9001L, "another unrelated document body here")).toDF("doc_id", "text"))

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("probe_id"), col("corpus_id"), round(col("jac"), 9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def tmp(): String =
    Files.createTempDirectory("graft_ndidx").toString

  test("probe of a built index equals the direct cross-corpus pairs") {
    val path = tmp()
    NearDupIndex.build(corpus, "doc_id", "text", path)
    val viaIndex = pairs(
      NearDupIndex.probePairs(probe, "doc_id", "text", path, threshold = 0.5))
    val direct = pairs(Dedup.minhashPairsAcrossFromShingles(
      Dedup.shingleBase(probe, "doc_id", "text"),
      Dedup.shingleBase(corpus, "doc_id", "text"), threshold = 0.5))
    assert(viaIndex == direct)
    assert(viaIndex.nonEmpty) // the planted near-copies must be found
    graft.engine.Caches.release()
  }

  test("build half + append half probes identically to build all") {
    val all = tmp(); val grown = tmp()
    NearDupIndex.build(corpus, "doc_id", "text", all)
    NearDupIndex.build(corpus.where($"doc_id" % 2 === 0), "doc_id", "text", grown)
    NearDupIndex.append(corpus.where($"doc_id" % 2 === 1), "doc_id", "text", grown)
    val a = pairs(NearDupIndex.probePairs(probe, "doc_id", "text", all, 0.5))
    val g = pairs(NearDupIndex.probePairs(probe, "doc_id", "text", grown, 0.5))
    assert(a == g && a.nonEmpty)
    graft.engine.Caches.release()
  }

  test("probe shingles with the index's nGram, not the default") {
    val path = tmp()
    NearDupIndex.build(corpus, "doc_id", "text", path, nGram = 2)
    assert(NearDupIndex.meta(spark, path) == NearDupIndex.Meta(4, 4, 2))
    val viaIndex = pairs(
      NearDupIndex.probePairs(probe, "doc_id", "text", path, threshold = 0.5))
    val direct = pairs(Dedup.minhashPairsAcrossFromShingles(
      Dedup.shingleBase(probe, "doc_id", "text", nGram = 2),
      Dedup.shingleBase(corpus, "doc_id", "text", nGram = 2), threshold = 0.5))
    assert(viaIndex == direct && viaIndex.nonEmpty)
    graft.engine.Caches.release()
  }

  test("dedupAgainst drops exactly the matched probe docs") {
    val path = tmp()
    NearDupIndex.build(corpus, "doc_id", "text", path)
    val matched = NearDupIndex
      .probePairs(probe, "doc_id", "text", path, threshold = 0.5)
      .select("probe_id").distinct().as[Long].collect().toSet
    val survivors = NearDupIndex
      .dedupAgainst(probe, "doc_id", "text", path, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val probeIds = probe.select("doc_id").as[Long].collect().toSet
    assert(survivors == probeIds -- matched)
    assert(survivors.contains(9000L) && survivors.contains(9001L))
    graft.engine.Caches.release()
  }
}
