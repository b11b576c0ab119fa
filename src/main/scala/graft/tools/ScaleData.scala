package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a larger scale factor from an existing testdata dir by
  * replicating every table R times with key offsets — the harness behind
  * SCALE_CHECK.md (the 17 MB testdata cannot expose a nonlinear blowup,
  * so scaling exponents are measured on a locally-built 10x corpus).
  *
  * Replication preserves the DISTRIBUTIONAL invariants the operators are
  * sensitive to, rather than naively copying rows:
  *   - every key column gets a per-replica offset (no accidental joins
  *     or duplicate keys across replicas);
  *   - document text is re-tokenized per replica (every token suffixed
  *     `_rN`), so replicas are DISJOINT in shingle space and near-dup
  *     density per corpus stays constant — naive copies would plant
  *     10-member exact-dup clusters everywhere and measure a data
  *     artifact, not the implementation;
  *   - embeddings get deterministic per-replica noise far above the
  *     0.995 cosine dedup threshold, for the same reason;
  *   - event timestamps shift by a whole-series span per replica, so
  *     each series grows 10x in distinct timestamps (the align/window
  *     axis) instead of stacking 10 samples on every instant.
  *
  * Usage: runMain graft.tools.ScaleData <srcDir> <destDir> <replicas>
  */
object ScaleData {

  private val KeyOffset = 10000000L // multiple of every planted modulus

  private def replicate(src: DataFrame, replicas: Int)(
      f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until replicas).map(r => f(src, r)).reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleData <srcDir> <destDir> <replicas>")
    val Array(srcDir, destDir, repStr) = args
    val replicas = repStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    graft.engine.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(t: String, df: DataFrame, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$destDir/$t.parquet")

    // tiny dims: carried over unchanged (they stay broadcast-sized at
    // any SF in TPC-H too)
    Seq("region", "nation").foreach(t => write(t, read(t), 1))

    write("supplier", replicate(read("supplier"), replicas)((d, r) =>
      d.withColumn("s_suppkey", col("s_suppkey") + r * KeyOffset)), 4)
    write("customer", replicate(read("customer"), replicas)((d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + r * KeyOffset)), 8)
    write("part", replicate(read("part"), replicas)((d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + r * KeyOffset)), 8)
    write("orders", replicate(read("orders"), replicas)((d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + r * KeyOffset)
        .withColumn("o_custkey", col("o_custkey") + r * KeyOffset)), 16)
    write("lineitem", replicate(read("lineitem"), replicas)((d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + r * KeyOffset)
        .withColumn("l_partkey", col("l_partkey") + r * KeyOffset)
        .withColumn("l_suppkey", col("l_suppkey") + r * KeyOffset)), 32)

    // events: shift each replica by the whole span (rounded to the ms
    // unit the engine derives — Graft.tsMillis), so every series gets
    // R x the distinct timestamps. Work in the engine's epoch-ms frame
    // so the shift is physical-type-agnostic (nanos Long vs timestamp),
    // and write ts back as a timestamp — the shape current testdata has.
    // NOTE: this quantizes EVERY replica (r=0 included) to ms; fine
    // here because all engine consumers quotient to ms anyway, but a
    // raw-ts comparison of scaled vs source data would see the drop.
    val evRaw = read("events")
    val ev = evRaw.withColumn("ts_ms", graft.engine.Graft.tsMillis(evRaw))
    val Array(tsMin, tsMax) = ev.agg(min("ts_ms"), max("ts_ms")).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val span = tsMax - tsMin + 1L
    write("events", replicate(ev, replicas)((d, r) =>
      d.withColumn("event_id", col("event_id") + r * 1000000000L)
        .withColumn("ts", timestamp_millis(col("ts_ms") + lit(r * span)))
        .drop("ts_ms")), 32)

    // documents: disjoint shingle space per replica (every token gets a
    // replica suffix); n_chars tracks the rewritten text
    write("documents", replicate(read("documents"), replicas) { (d, r) =>
      val text =
        if (r == 0) col("text")
        else array_join(
          transform(split(col("text"), " "), t => concat(t, lit(s"_r$r"))),
          " ")
      d.withColumn("doc_id", col("doc_id") + r * KeyOffset)
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, 32)

    // embeddings: deterministic per-replica noise, amplitude ~2x the
    // unit-vector norm — far outside the 0.995 cosine dedup threshold
    write("embeddings", replicate(read("embeddings"), replicas) { (d, r) =>
      val vec =
        if (r == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          (x + sin((col("vec_id") % 997 + 1) * (i + 1) * r) * 0.3f)
            .cast("float"))
      d.withColumn("vec_id", col("vec_id") + r * KeyOffset)
        .withColumn("embedding", vec)
    }, 8)

    println(s"[scaledata] wrote ${replicas}x of $srcDir to $destDir")
    spark.stop()
  }
}
