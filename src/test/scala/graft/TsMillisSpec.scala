package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tsdb.TsdbFixtures.spark

/** Pins the physical-type dispatch of `Graft.tsMillis`: the driver has
  * regenerated the events table with a different parquet timestamp
  * encoding once already (TIMESTAMP(NANOS)-as-Long → native
  * TIMESTAMP(MICROS), which silently broke all 32 events-backed gates
  * until the projection dispatched on the type). This spec writes one
  * fixture per encoding the generator could plausibly emit and asserts
  * the identical epoch-ms projection, so the next schema flip is a red
  * unit test instead of 32 red gates.
  */
class TsMillisSpec extends AnyFunSuite {

  import spark.implicits._

  // sub-millisecond nanos residue on purpose: ms projection must floor
  private val ms = Seq(0L, 1L, 999L, 1704067200123L, 4102444800999L)

  private def dir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"tsmillis_$tag")
    d.toFile.deleteOnExit()
    s"$d/events.parquet"
  }

  private def roundTrip(path: String): Seq[Long] = {
    val df = spark.read.parquet(path)
    df.select(graft.engine.Graft.tsMillis(df).as("ms"))
      .as[Long].collect().toSeq.sorted
  }

  test("epoch-nanos Long column (TIMESTAMP(NANOS) under nanosAsLong)") {
    val p = dir("nanos")
    ms.map(m => m * 1000000L + 456L).toDF("ts").write.parquet(p)
    assert(roundTrip(p) == ms)
  }

  test("native TIMESTAMP (micros, LTZ)") {
    val p = dir("micros")
    ms.toDF("m").select(timestamp_millis(col("m")).as("ts")).write.parquet(p)
    assert(roundTrip(p) == ms)
  }

  test("native TIMESTAMP_NTZ") {
    val p = dir("ntz")
    ms.toDF("m")
      .select(timestamp_millis(col("m")).cast("timestamp_ntz").as("ts"))
      .write.parquet(p)
    assert(roundTrip(p) == ms)
  }

  test("legacy INT96 timestamps") {
    val p = dir("int96")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try ms.toDF("m").select(timestamp_millis(col("m")).as("ts")).write.parquet(p)
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    assert(roundTrip(p) == ms)
  }
}
