package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.tsdb.TsdbFixtures.spark

/** Completeness of the scale-safe candidate generators: pigeonhole
  * fingerprint banding (simhash) and PPJoin prefix filtering (jaccard)
  * must find exactly the pairs a naive all-pairs join finds — including
  * pairs that content-heuristic blocking (language / source / first
  * token) would have missed.
  */
class DedupSpec extends AnyFunSuite {
  import spark.implicits._

  // Near-dup pairs that deliberately DIFFER in their first token: an
  // equality block on the first token would never compare them.
  private def corpus: DataFrame = {
    val base = (0 until 30).map { i =>
      (i.toLong, s"alpha$i " + (0 until 40).map(j => s"w${(i * 7 + j) % 11}_$j").mkString(" "))
    }
    val dups = (0 until 30 by 5).map { i =>
      // different first token, one interior token edited
      (i + 1000L, s"beta$i " + (0 until 40).map(j =>
        if (j == 20) "EDITED" else s"w${(i * 7 + j) % 11}_$j").mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  private def fingerprints(df: DataFrame): Map[Long, Long] = {
    val sh = Dedup.shingleBase(df, "doc_id", "text")
    val votes = (0 until Dedup.SimhashBits).map { i =>
      sum(shiftright(col("h"), i).bitwiseAND(1) * 2 - 1).as(s"v$i")
    }
    val fpExpr = (0 until Dedup.SimhashBits)
      .map(i => when(col(s"v$i") >= 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)
    sh.select(col("id"), explode(col("hs")).as("h"))
      .groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"), fpExpr.as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("segmentBounds covers all bits with near-equal widths") {
    for (bits <- Seq(60, 64, 32); nSeg <- 1 to 8) {
      val segs = Dedup.segmentBounds(bits, nSeg)
      assert(segs.size == nSeg)
      assert(segs.map(_._2).sum == bits)
      assert(segs.map(_._2).max - segs.map(_._2).min <= 1)
      // contiguous, starting at 0
      assert(segs.head._1 == 0)
      segs.sliding(2).foreach {
        case Seq((o1, w1), (o2, _)) => assert(o2 == o1 + w1)
        case _ =>
      }
    }
  }

  test("simhash banding finds exactly the all-pairs hamming matches") {
    val maxHamming = 6
    val got = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fp = fingerprints(corpus)
    val ids = fp.keys.toSeq.sorted
    val expect = (for {
      a <- ids; b <- ids if a < b
      if java.lang.Long.bitCount(fp(a) ^ fp(b)) <= maxHamming
    } yield (a, b)).toSet
    assert(got == expect)
    // the planted cross-first-token near-dups ARE found
    assert(expect.exists { case (a, b) => b - a == 1000 },
      "fixture should contain at least one planted near-dup pair")
    assert((0 until 30 by 5).forall(i =>
      !fp.contains(i.toLong) || !fp.contains(i + 1000L) ||
        java.lang.Long.bitCount(fp(i.toLong) ^ fp(i + 1000L)) > maxHamming ||
        got.contains((i.toLong, i + 1000L))))
  }

  test("simhash comboWidth variants produce identical pairs") {
    val sh = Dedup.shingleBase(corpus, "doc_id", "text")
    def pairs(c: Int) =
      Dedup.simhashPairsFromShingles(sh, maxHamming = 6, comboWidth = c)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairs(1)
    assert(one == pairs(2) && one == pairs(3))
    // comboWidth <= 0 self-sizes from the corpus count; the generator is
    // complete at every width, so the pair set must be identical too
    assert(one == pairs(0))
  }

  test("autoComboWidth follows the key-width >= log2(n) scale rule") {
    // small corpora keep the floor default
    assert(Dedup.autoComboWidth(500L, 6) == 2)
    // n=1e9 needs ~30-bit keys: comboWidth*60/(6+comboWidth) >= 29.9
    val c = Dedup.autoComboWidth(1000000000L, 6)
    assert(c >= 3, s"n=1e9 picked comboWidth=$c")
    assert(c.toDouble * Dedup.SimhashBits / (6 + c) >=
      math.log(1e9) / math.log(2.0))
    // the cap binds when even 1-bit segments cannot reach log2(n)
    assert(Dedup.autoComboWidth(Long.MaxValue, 6) == Dedup.SimhashBits - 6)
  }

  test("embedding near-dup: metadata opt-in equals the IVF default path") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planted = e.select(col("vec_id"), col("embedding"), col("label"))
      .unionAll(e.where(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 1000000).as("vec_id"),
          col("embedding"), col("label")))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaIvf = pairSet(
      Dedup.embeddingPairsIvf(planted, "vec_id", "embedding", k = 16))
    val viaLabel = pairSet(
      Dedup.embeddingPairs(planted, "vec_id", "embedding", Seq("label")))
    assert(viaIvf.nonEmpty, "planted copies not found")
    assert(viaIvf == viaLabel)
  }

  test("components: ids keep their type (string corpus)") {
    val pairs = Seq(("docB", "docA"), ("docB", "docC"), ("x", "y"))
      .toDF("id_a", "id_b")
    val got = Dedup.components(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("docA" -> "docA", "docB" -> "docA", "docC" -> "docA",
      "x" -> "x", "y" -> "x"))
  }

  test("components: non-convergence fails loudly (or warns when asked)") {
    // a 9-hop chain cannot converge in 3 rounds
    val pairs = (1 until 10).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.components(pairs, maxIters = 3).collect()
    }
    // opt-out returns the partial labels instead
    assert(Dedup.components(pairs, maxIters = 3,
      failOnNonConvergence = false).count() == 10)
    // and the same graph converges exactly at the diameter
    val got = Dedup.components(pairs, maxIters = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1 to 10).map(i => i.toLong -> 1L).toMap)
  }

  test("components: transitive closure with min-id representative") {
    // chain 1-2-3 (no direct 1-3 pair!), separate cluster 10-11,
    // isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (21L, 20L))
      .toDF("id_a", "id_b")
    val got = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("components: long chain converges within the diameter") {
    val n = 12
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val got = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1 to n).map(i => i.toLong -> 1L).toMap)
  }

  test("components: reliable checkpointDir mode equals localCheckpoint mode") {
    // chain + separate cluster, enough rounds to checkpoint repeatedly
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val expected = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft_ccp").toString
    val reliable = Dedup.components(pairs, checkpointDir = Some(ckptDir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == expected)
    // the reliable mode actually wrote checkpoint data to shared storage
    import scala.jdk.CollectionConverters._
    val wrote = scala.util.Using.resource(
      java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir)))(
      _.iterator().asScala.count(java.nio.file.Files.isRegularFile(_)))
    assert(wrote > 0, "reliable mode should write to the checkpoint dir")
  }

  test("components: reliable checkpoint survives block loss, local cannot") {
    // Simulated executor restart: drop EVERY persisted block in the
    // block manager. localCheckpoint truncates lineage, so its result
    // is unrecoverable by design once the blocks are gone — while the
    // reliable checkpointDir mode re-reads shared storage. This is the
    // operational difference the `checkpointDir` knob buys on a real
    // cluster, demonstrated rather than asserted-by-comment.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    def dropAllBlocks(): Unit = spark.sparkContext.getPersistentRDDs
      .values.foreach(_.unpersist(blocking = true))

    val local = Dedup.components(pairs)
    assert(local.count() == 6)
    dropAllBlocks()
    val e = intercept[Exception] { local.collect() }
    val trace = {
      val sw = new java.io.StringWriter()
      e.printStackTrace(new java.io.PrintWriter(sw))
      sw.toString.toLowerCase
    }
    assert(trace.contains("checkpoint"),
      s"expected a lost-checkpoint-block failure, got: ${e.getMessage}")

    val dir = java.nio.file.Files
      .createTempDirectory("graft_ccp_reliable").toString
    val reliable = Dedup.components(pairs, checkpointDir = Some(dir))
    assert(reliable.count() == 6)
    dropAllBlocks()
    val got = reliable.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("cross-corpus minhash equals the self-join restricted to cross pairs") {
    val sh = Dedup.shingleBase(corpus, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probe = sh.where(col("id") >= 1000L)
    val base = sh.where(col("id") < 1000L)
    val across = Dedup.minhashPairsAcrossFromShingles(probe, base, threshold = 0.5)
      .select(col("probe_id"), col("corpus_id"), round(col("jac"), 9).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // self-join pairs are emitted as (id_a < id_b), so cross pairs appear
    // with the corpus id first
    val self = Dedup.minhashPairsFromShingles(sh, threshold = 0.5)
      .where(col("id_a") < 1000L && col("id_b") >= 1000L)
      .select(col("id_b"), col("id_a"), round(col("jac"), 9).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    sh.unpersist()
    assert(across.nonEmpty, "planted near-dups produced no cross pairs")
    assert(across == self)
  }

  test("dedupLines drops shared lines, keeps order, survives empty docs") {
    // 12 docs share "common"; doc 50 is ONLY boilerplate; doc 51 has a
    // repeated line within one doc (distinct-doc count must treat that
    // as one doc, so it survives minDocs=12)
    val docs = (0 until 12).map(i => (i.toLong, s"common\nuniq $i\ncommon2")) ++
      Seq((50L, "common\ncommon2"), (51L, "twice\ntwice\nuniq 51"))
    val out = Dedup.dedupLines(docs.toDF("doc_id", "text"), "doc_id", "text",
        minDocs = 12)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    for (i <- 0 until 12)
      assert(out(i.toLong) == ((3L, 1L, s"uniq $i")), s"doc $i")
    // doc 50 loses everything: zero kept lines, empty rebuilt text
    assert(out(50L) == ((2L, 0L, "")))
    // doc 51's duplicate-within-one-doc line is NOT corpus boilerplate,
    // and reassembly preserves original line order
    assert(out(51L) == ((3L, 3L, "twice\ntwice\nuniq 51")))
  }

  test("minhash/simhash kernels equal their declarative formulations") {
    val sh = Dedup.shingleBase(corpus, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kSig = sh.select(col("id"),
        graft.functions.ShingleHash.minhashSig60(col("hs"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val dSig = sh.select(col("id"),
        graft.functions.TextFunctions.minhashSig(col("hs"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(kSig == dSig)
    val kFp = sh.select(col("id"),
        graft.functions.ShingleHash.simhash60(col("hs")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sh.unpersist()
    assert(kFp == fingerprints(corpus))
  }

  test("banding commutes with row filters (the shared-pass contract)") {
    // bandedKeys(sh.where(p)) must equal bandedKeys(sh).where(p) — the
    // property that lets one persisted banded table serve self-join and
    // cross-corpus queries via filtered views
    val sh = Dedup.shingleBase(corpus, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val filteredFirst = rows(Dedup.bandedKeys(sh.where(col("id") >= 1000L)))
    val bandedFirst = rows(Dedup.bandedKeys(sh).where(col("id") >= 1000L))
    sh.unpersist()
    assert(filteredFirst.nonEmpty)
    assert(filteredFirst == bandedFirst)
  }

  test("bandedKeys drops empty-shingle rows (no universal-collision blowup)") {
    // MinhashSig60 gives every empty `hs` the identical MaxValue-filled
    // signature — without the row-local filter all such rows collide in
    // EVERY band, C(n,2) candidate pairs from rows that can never match
    val base = Seq(
      (1L, Seq(11L, 22L, 33L)),
      (2L, Seq.empty[Long]),
      (3L, Seq.empty[Long])).toDF("id", "hs")
    val banded = Dedup.bandedKeys(base)
    assert(banded.select("id").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L))
  }

  test("winnowing guarantees a shared fingerprint for spans >= w+k-1") {
    val k = 8; val w = 4
    // a shared span of exactly w+k-1 = 11 tokens embedded at different
    // offsets inside otherwise-disjoint documents
    val span = (0 until 11).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, (0 until 30).map(i => s"a$i").mkString(" ") + " " + span),
      (2L, span + " " + (0 until 25).map(i => s"b$i").mkString(" ")),
      // no shared span: must share nothing
      (3L, (0 until 40).map(i => s"c$i").mkString(" ")),
      // 9 tokens: >= k but fewer than w grams — the tail rule emits the
      // single min-gram fingerprint (a doc under k tokens emits none)
      (4L, (0 until 9).map(i => s"d$i").mkString(" ")))
    val fp = Dedup.winnowFingerprints(docs.toDF("doc_id", "text"),
      "doc_id", "text", k, w)
    val byDoc = fp.collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "guaranteed shared span produced no shared fingerprint")
    assert((byDoc(1L) & byDoc(3L)).isEmpty && (byDoc(2L) & byDoc(3L)).isEmpty)
    assert(byDoc(4L).size == 1, "tail rule should emit exactly one fp")
  }

  test("jaccard prefix filter finds exactly the all-pairs matches") {
    val t = 0.5
    val got = Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = t)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = Dedup.shingleBase(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val expect = (for {
      a <- ids; b <- ids if a < b
      jac = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
      if jac >= t
    } yield (a, b)).toSet
    assert(got == expect)
    assert(expect.exists { case (a, b) => b - a == 1000 },
      "fixture should contain at least one planted near-dup pair")
  }

  // The position filter's bound (min(|A|-pa, |B|-pb) >= t/(1+t)·(|A|+|B|))
  // sits on floating-point arithmetic: exercise it across thresholds on
  // random small-vocab corpora (dense overlap, many boundary pairs) and
  // require exact equality with the all-pairs answer every time.
  test("full PPJoin (prefix+position+size) equals all-pairs across thresholds") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 3) {
      val docs = (0 until 24).map { i =>
        val len = 5 + rnd.nextInt(12)
        (i.toLong, (0 until len).map(_ => s"t${rnd.nextInt(7)}").mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val sets = Dedup.shingleBase(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val ids = sets.keys.toSeq.sorted
      for (t <- Seq(0.3, 0.5, 0.7, 0.8)) {
        val got = Dedup.jaccardPairs(df, "doc_id", "text", threshold = t)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val expect = (for {
          a <- ids; b <- ids if a < b
          u = sets(a).union(sets(b)).size if u > 0
          jac = sets(a).intersect(sets(b)).size.toDouble / u
          if jac >= t
        } yield (a, b)).toSet
        assert(got == expect, s"trial $trial t=$t")
      }
    }
  }
}
