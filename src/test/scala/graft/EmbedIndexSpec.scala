package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.{EmbedIndex, Knn}
import graft.tsdb.TsdbFixtures.spark

/** The persisted embedding index is semantically invisible (probe of a
  * stored index == direct within-cell cosine pairs), appends assign
  * with the stored quantizer, search over the stored table equals
  * brute force at full probe width, and ingestBatch is idempotent
  * under replay — mirroring NearDupIndexSpec / StreamIndexDedupSpec
  * for the embedding side.
  */
class EmbedIndexSpec extends AnyFunSuite {
  import spark.implicits._

  private val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))

  // exact copies of every 10th vector, ids offset — the planted probes
  private def copies(offset: Long, mod: Int = 10): DataFrame =
    emb.where(col("vec_id") % mod === 0)
      .select((col("vec_id") + offset).as("vec_id"), col("vec"))

  // negations: cosine -1 to their source, far from everything else
  private def novel(offset: Long, mod: Int = 10): DataFrame =
    emb.where(col("vec_id") % mod === 3)
      .select((col("vec_id") + offset).as("vec_id"),
        transform(col("vec"), x => -x).as("vec"))

  private def tmp(): String =
    Files.createTempDirectory("graft_embidx").toString

  private def ids(df: DataFrame, c: String = "vec_id"): Set[Long] =
    df.select(c).as[Long].collect().toSet

  test("probe of a stored index finds exactly the planted copies") {
    val path = tmp()
    EmbedIndex.build(emb, "vec_id", "vec", path)
    val probe = copies(1000000).unionAll(novel(3000000))
    val got = EmbedIndex.probePairs(probe, "vec_id", "vec", path)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
    val want = ids(copies(1000000)).map(i => (i, i - 1000000))
    assert(got == want, s"got $got")
    val kept = EmbedIndex.dedupAgainst(probe, "vec_id", "vec", path)
    assert(ids(kept) == ids(novel(3000000)))
  }

  test("append assigns with the stored quantizer; probe then matches it") {
    val path = tmp()
    EmbedIndex.build(emb.where(col("vec_id") < 50), "vec_id", "vec", path)
    EmbedIndex.append(emb.where(col("vec_id") >= 50), "vec_id", "vec", path)
    // a copy of an appended vector is found in the grown index
    val probe = emb.where(col("vec_id") === 70)
      .select((col("vec_id") + 1000000).as("vec_id"), col("vec"))
    val got = EmbedIndex.probePairs(probe, "vec_id", "vec", path)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1000070L, 70L)))
  }

  test("search over the stored table equals brute force at full width") {
    val path = tmp()
    EmbedIndex.build(emb, "vec_id", "vec", path, k = 8, iters = 2)
    val q = emb.where(col("vec_id") === 7).select("vec").head().getSeq[Double](0)
    val brute = Knn.bruteTopK(emb, "vec_id", "vec", q, 10)
      .select("vec_id").as[Long].collect().toSeq
    val stored = EmbedIndex.search(spark, path, q, nProbe = 8, topK = 10)
      .select("id").as[Long].collect().toSeq
    assert(stored == brute)
  }

  test("multi-probe widens recall monotonically to brute force at full width") {
    val path = tmp()
    EmbedIndex.build(emb, "vec_id", "vec", path, k = 8, iters = 2)
    val probe = emb.select((col("vec_id") + 1000000).as("vec_id"), col("vec"))
    def pairsAt(nProbe: Int): Set[(Long, Long)] =
      EmbedIndex.probePairs(probe, "vec_id", "vec", path,
          threshold = 0.2, nProbe = nProbe)
        .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
    val p1 = pairsAt(1); val p2 = pairsAt(2); val p8 = pairsAt(8)
    assert(p1.subsetOf(p2) && p2.subsetOf(p8), "recall must be monotone")
    // full width == local brute force over the collected vectors
    val vs = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val brute = (for {
      (pi, pv) <- vs.toSeq; (ci, cv) <- vs.toSeq
      if cos(pv, cv) >= 0.2
    } yield (pi + 1000000, ci)).toSet
    assert(p8 == brute, s"full-width probe must equal brute force " +
      s"(missing ${(brute -- p8).size}, extra ${(p8 -- brute).size})")
    // at this blocky threshold, single-probe genuinely misses some
    assert(p1.size < p8.size, "the widened threshold should straddle cells")
  }

  test("cellStats counts occupancy and needsRebuild trips on a swollen cell") {
    val path = tmp()
    EmbedIndex.build(emb, "vec_id", "vec", path)
    val r0 = EmbedIndex.cellStats(spark, path).head()
    assert(r0.getLong(1) == emb.count(), "rows must cover the corpus")
    assert(!EmbedIndex.needsRebuild(spark, path),
      "a freshly autoK-built index must not need rebuilding")
    // a drifted delta: 1200 near-identical vectors pile into one cell
    val one = emb.where(col("vec_id") === 0).select("vec").head()
      .getSeq[Double](0)
    val drift = spark.range(1200).select(
      (col("id") + 7000000).as("vec_id"),
      typedLit(one).as("vec"))
    EmbedIndex.append(drift, "vec_id", "vec", path)
    assert(EmbedIndex.needsRebuild(spark, path),
      "1200 co-assigned rows exceed 8x the 128-row target")
  }

  test("ingestBatch: keep-one, index drop, append, replay contributes nothing") {
    val path = tmp()
    EmbedIndex.build(emb, "vec_id", "vec", path)
    // 2000000+i: copy of corpus vec i -> dropped; two copies of novel
    // (negated) vec -> min id kept; one plain novel -> kept
    val nv = novel(3000000, mod = 20)
    val batch = copies(2000000, mod = 20)
      .unionAll(nv)
      .unionAll(nv.select((col("vec_id") + 1000).as("vec_id"), col("vec")))
    var delivered = Set.empty[Long]
    val kept = EmbedIndex.ingestBatch(batch, "vec_id", "vec", path,
      beforeAppend = df => delivered = ids(df))
    assert(ids(kept) == ids(nv), s"got ${ids(kept)}")
    assert(delivered == ids(nv))
    // replay: survivors are in the index now -> nothing contributes
    val replay = EmbedIndex.ingestBatch(batch, "vec_id", "vec", path)
    assert(ids(replay).isEmpty, s"replay kept ${ids(replay)}")
    // and a later copy of a batch survivor is dropped too
    val next = EmbedIndex.ingestBatch(
      nv.select((col("vec_id") + 5000000).as("vec_id"), col("vec")),
      "vec_id", "vec", path)
    assert(ids(next).isEmpty)
  }
}
