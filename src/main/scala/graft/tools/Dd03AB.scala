package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dedup.Dedup

/** A/B harness for dd03's banded self-join shape at scale:
  *   v1  the production shape (simhashPairsFromShingles as-is)
  *   v2  same join over a MATERIALIZED banded table (isolates the
  *       explode recompute / exchange-reuse question)
  *   v3  groupBy-bucket + within-bucket pair enumeration (one shuffle
  *       of the banded rows, no join; pairs from collect_list buckets)
  * Each variant's pair count is printed so completeness regressions are
  * impossible to miss. Usage: runMain graft.tools.Dd03AB <sfDir> [reps]
  */
object Dd03AB {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1x30")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = d.select(col("doc_id"), col("text")).unionAll(
      d.where(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" graft dup marker")).as("text")))
    val sh = Dedup.shingleBase(corpus, "doc_id", "text", nGram = 3)
      .persist(StorageLevel.MEMORY_AND_DISK)
    sh.count()
    val fp = sh.select(col("id"),
        graft.functions.ShingleHash.simhash60(col("hs")).as("fp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = fp.count()
    val cw = Dedup.autoComboWidth(n, 6)

    def timeMin(f: => Long): (Long, Double) = {
      var cnt = 0L
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); cnt = f; (System.nanoTime() - t0) / 1e9
      }.min
      (cnt, t)
    }

    // v1: production shape end-to-end on cached shingles
    val (n1, t1) = timeMin(
      Dedup.simhashPairsFromShingles(sh, 6).count())

    // v2: join over a materialized banded table
    val banded = Dedup.simhashBanded(fp, 6, cw)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nBand = banded.count()
    val (n2, t2) = timeMin {
      val l = banded.select(col("seg_idx"), col("seg_val"),
        col("id").as("id_a"), col("fp").as("fp_a"))
      val r = banded.select(col("seg_idx"), col("seg_val"),
        col("id").as("id_b"), col("fp").as("fp_b"))
      l.join(r, Seq("seg_idx", "seg_val"))
        .where(col("id_a") < col("id_b"))
        .where(bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= 6)
        .select("id_a", "id_b").distinct().count()
    }

    // v3: one shuffle, buckets, within-bucket pair enumeration
    val (n3, t3) = timeMin {
      val buckets = Dedup.simhashBanded(fp, 6, cw)
        .groupBy("seg_idx", "seg_val")
        .agg(collect_list(struct(col("id"), col("fp"))).as("xs"))
        .where(size(col("xs")) > 1)
      buckets
        .select(explode(expr(
          """flatten(transform(xs, (a, i) ->
            |  filter(transform(slice(xs, i + 2, size(xs) - i - 1), b ->
            |    struct(least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
            |           bit_count(a.fp ^ b.fp) AS hd)),
            |    p -> p.hd <= 6)))""".stripMargin)).as("p"))
        .select(col("p.id_a"), col("p.id_b")).distinct().count()
    }

    println(s"""{"sf":"$sfDir","n_docs":$n,"combo_width":$cw,""" +
      s""""n_band_rows":$nBand,""" +
      s""""v1_pairs":$n1,"v1_sec":$t1,""" +
      s""""v2_pairs":$n2,"v2_sec":$t2,""" +
      s""""v3_pairs":$n3,"v3_sec":$t3}""")
    spark.stop()
  }
}
