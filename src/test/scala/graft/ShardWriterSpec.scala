package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ShardWriter
import graft.tsdb.TsdbFixtures.spark

/** The sharded training-file writer's contract: the written corpus,
  * read back in (shard, offset) order, equals the input in training
  * order row-for-row — and the shard boundaries are a function of the
  * data only, never of the writer's file-split configuration.
  */
class ShardWriterSpec extends AnyFunSuite {
  import spark.implicits._

  // ragged doc lengths so shard boundaries never align with input
  // partition boundaries by accident
  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, (i * 37 % 11 + 1).toLong))
      .toDF("doc_id", "n_tokens")
      .repartition(5)

  private def tmp(): String =
    Files.createTempDirectory("shardwriter_spec").toString

  test("read-back in (shard, offset) order equals training order") {
    val df = corpus(101)
    val back = ShardWriter
      .writeSharded(df, Seq(col("doc_id")), nShards = 7, tmp())
      .select($"doc_id", $"n_tokens", $"shard", $"offset")
      .collect()
    val expect = df.orderBy("doc_id").select($"doc_id", $"n_tokens")
      .collect()
    assert(back.length == expect.length)
    back.zip(expect).zipWithIndex.foreach { case ((b, e), i) =>
      assert(b.getLong(0) == e.getLong(0), s"row $i doc_id")
      assert(b.getLong(1) == e.getLong(1), s"row $i n_tokens")
      assert(b.getLong(3) == i.toLong, s"row $i offset")
    }
    // shards are contiguous in offset, non-decreasing, balanced ±1
    val byShard = back.groupBy(_.getInt(2)).view.mapValues(_.length).toMap
    assert(byShard.keySet == (0 until 7).toSet)
    assert(byShard.values.max - byShard.values.min <= 1)
    assert(back.map(_.getInt(2)).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("shard assignment is independent of maxRecordsPerFile") {
    val df = corpus(64)
    val a = ShardWriter
      .writeSharded(df, Seq(col("doc_id")), nShards = 4, tmp())
      .select($"doc_id", $"shard", $"offset").collect()
    val prev = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "7")
    try {
      val dir = tmp()
      val b = ShardWriter
        .writeSharded(df, Seq(col("doc_id")), nShards = 4, dir)
        .select($"doc_id", $"shard", $"offset").collect()
      assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
      // the config DID split files (several per shard dir), yet the
      // read-back is identical — order rides the offset column
      val files = Files.walk(java.nio.file.Paths.get(dir)).iterator()
      val parquets = scala.jdk.CollectionConverters
        .IteratorHasAsScala(files).asScala
        .count(_.toString.endsWith(".parquet"))
      assert(parquets > 4, s"expected >4 parquet files, got $parquets")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.files.maxRecordsPerFile", v)
        case None => spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      }
    }
  }

  test("jsonl shards round-trip identically to parquet shards") {
    val df = corpus(40)
    val viaParquet = ShardWriter
      .writeSharded(df, Seq(col("doc_id")), 4, tmp())
      .select($"doc_id", $"n_tokens", $"shard", $"offset")
      .collect().map(_.toSeq).toSeq
    val dir = tmp()
    val viaJson = ShardWriter
      .writeSharded(df, Seq(col("doc_id")), 4, dir, format = "json")
      .select($"doc_id", $"n_tokens", $"shard", $"offset")
      .collect().map(_.toSeq).toSeq
    assert(viaParquet == viaJson)
    // and the payload really is JSON Lines a non-Spark loader can read
    import scala.jdk.CollectionConverters._
    val part = scala.util.Using.resource(
      Files.walk(java.nio.file.Paths.get(dir)))(
      _.iterator().asScala.filter(p =>
        p.toString.contains("shard=") && p.toString.endsWith(".json")).toList)
    assert(part.nonEmpty, "expected json data files under shard dirs")
    val firstLine = Files.readAllLines(part.head).get(0)
    assert(firstLine.startsWith("{") && firstLine.contains("\"doc_id\""),
      firstLine)
  }

  test("empty input returns an empty read-back, not a crash") {
    val empty = corpus(10).where(col("doc_id") < 0)
    for (fmt <- Seq("parquet", "json")) {
      val back = ShardWriter
        .writeSharded(empty, Seq(col("doc_id")), 4, tmp(), format = fmt)
      assert(back.count() == 0L, fmt)
      assert(back.columns.toSet ==
        Set("doc_id", "n_tokens", "offset", "shard"), fmt)
    }
  }

  test("reserved address columns are rejected, not clobbered") {
    val withOffset = corpus(5).withColumn("offset", lit(99L))
    val e = intercept[IllegalArgumentException] {
      ShardWriter.shardAssign(withOffset, Seq(col("doc_id")), 2)
    }
    assert(e.getMessage.contains("offset"), e.getMessage)
  }

  test("single shard and more-shards-than-rows edge cases") {
    val df = corpus(3)
    val one = ShardWriter.writeSharded(df, Seq(col("doc_id")), 1, tmp())
      .select($"shard").distinct().as[Int].collect()
    assert(one.toSeq == Seq(0))
    val many = ShardWriter.writeSharded(df, Seq(col("doc_id")), 8, tmp())
      .select($"doc_id", $"shard", $"offset").collect()
    // 3 rows across 8 shard slots: offsets 0,1,2 → shards 0,2,5
    assert(many.map(_.getInt(1)).toSeq == Seq(0, 2, 5))
    assert(many.map(_.getLong(2)).toSeq == Seq(0L, 1L, 2L))
  }
}
