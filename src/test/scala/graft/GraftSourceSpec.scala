package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual, StringContains}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftSource
import graft.sources.GraftSource.GraftFile
import graft.tsdb.{GraftDb, VType}
import graft.tsdb.TsdbFixtures.spark

/** The DSv2 `graft` format: plain-SQL access to a GraftDb store with
  * directory-level (name, bucket) pruning, column pruning down to the
  * parquet row groups, and full residual filter evaluation.
  */
class GraftSourceSpec extends AnyFunSuite {

  import spark.implicits._

  private val H = 3600 * 1000L

  /** Store with two streams (one f64 with labels, one u64 exercising the
    * lvalue sidecar) across three hourly buckets.
    */
  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft_dsv2").toString
    val db = new GraftDb(spark, dir)
    db.createStream("cpu{host=\"a\"}", VType.F64)
    db.createStream("reqs", VType.U64)
    val cpu = db.inserter("cpu")
    Seq(0L -> 1.5, (H + 1000L) -> 2.5, (2 * H + 2000L) -> 3.5)
      .foreach { case (t, v) => cpu.insert(t, v) }
    cpu.flush()
    val reqs = db.inserter("reqs")
    reqs.insert(500L, 10L)
    reqs.insert(2 * H + 500L, (1L << 60) + 7L) // above 2^53: lvalue exact
    reqs.flush()
    dir
  }

  private def graftDf = spark.read.format("graft").load(root)

  test("round-trips both streams with labels and the lvalue sidecar") {
    val rows = graftDf
      .select("name", "labels", "timestamp", "value", "lvalue")
      .orderBy("name", "timestamp")
      .collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("cpu", "cpu", "cpu", "reqs", "reqs"))
    assert(rows(0).getMap[String, String](1) == Map("host" -> "a"))
    assert(rows(0).getLong(2) == 0L && rows(0).getDouble(3) == 1.5)
    assert(rows(0).isNullAt(4)) // f64 stream: no lvalue
    assert(rows(3).getMap[String, String](1) == Map.empty)
    assert(rows(3).getLong(4) == 10L)
    assert(rows(4).getLong(4) == (1L << 60) + 7L) // exact past 2^53
  }

  test("matches the plain parquet view of the store") {
    val plain = spark.read.parquet(s"$root/data")
      .select("name", "timestamp", "value", "lvalue")
    val v2 = graftDf.select("name", "timestamp", "value", "lvalue")
    assert(v2.exceptAll(plain).isEmpty && plain.exceptAll(v2).isEmpty)
  }

  test("prunes directories from name and timestamp filters") {
    val files = Seq(
      GraftFile("/d/name=cpu/bucket=0/p0", "cpu", 0L, 10L),
      GraftFile("/d/name=cpu/bucket=3600000/p1", "cpu", H, 10L),
      GraftFile("/d/name=reqs/bucket=0/p2", "reqs", 0L, 10L),
      GraftFile("/d/name=reqs/bucket=7200000/p3", "reqs", 2 * H, 10L))
    def paths(fs: Seq[GraftFile]) = fs.map(_.path.last).toSet

    assert(paths(GraftSource.prune(files,
      Seq(EqualTo("name", "cpu")), H)) == Set('0', '1'))
    assert(paths(GraftSource.prune(files,
      Seq(In("name", Array("reqs"))), H)) == Set('2', '3'))
    // [H, 2H): only the middle bucket of cpu plus nothing of reqs
    assert(paths(GraftSource.prune(files,
      Seq(EqualTo("name", "cpu"), GreaterThanOrEqual("timestamp", H),
        LessThan("timestamp", 2 * H)), H)) == Set('1'))
    // boundary: ts <= H-1 keeps ONLY bucket 0 (bucket H starts at H)
    assert(paths(GraftSource.prune(files,
      Seq(LessThanOrEqual("timestamp", H - 1)), H)) == Set('0', '2'))
    // ts >= 2H prunes buckets ending at or before 2H
    assert(paths(GraftSource.prune(files,
      Seq(GreaterThanOrEqual("timestamp", 2 * H)), H)) == Set('3'))
    // contradictory name conjuncts -> nothing
    assert(GraftSource.prune(files,
      Seq(EqualTo("name", "cpu"), EqualTo("name", "reqs")), H).isEmpty)
    // unknown shapes are ignored, not mis-applied
    assert(GraftSource.prune(files,
      Seq(IsNotNull("value"), StringContains("name", "cp")), H) == files)
  }

  test("a pruned scan opens only the matching files (plan-audited)") {
    val q = graftDf
      .where(col("name") === "cpu" && col("timestamp") >= H &&
        col("timestamp") < 2 * H)
      .select("timestamp", "value")
    // 5 (name,bucket) dirs exist; pruning must leave exactly 1 file
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("files=1"), s"expected files=1 in:\n$desc")
    assert(desc.contains("PushedFilters=["), desc)
    assert(q.as[(Long, Double)].collect().toSeq == Seq((H + 1000L) -> 2.5))
  }

  test("residual evaluation stays exact inside a kept bucket") {
    // both reqs rows pass pruning for this range probe of one bucket,
    // but only one passes the row-level filter
    val q = graftDf.where(col("name") === "reqs" && col("timestamp") === 500L)
    assert(q.select("lvalue").as[Long].collect().toSeq == Seq(10L))
  }

  test("count(*) and name-only scans take the footer fast path") {
    assert(graftDf.count() == 5L)
    assert(graftDf.groupBy("name").count().as[(String, Long)].collect().toSet ==
      Set("cpu" -> 3L, "reqs" -> 2L))
  }

  test("aggregates through SQL over the registered view") {
    graftDf.createOrReplaceTempView("graft_store")
    val r = spark.sql(
      """SELECT name, SUM(value) AS s FROM graft_store
        |WHERE timestamp < 3600000 GROUP BY name ORDER BY name""".stripMargin)
      .as[(String, Double)].collect().toSeq
    assert(r == Seq("cpu" -> 1.5, "reqs" -> 10.0))
  }
}
