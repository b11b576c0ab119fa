package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming NEAR-duplicate suppression — the ingest-time analogue of
  * `Dedup.minhashPairs`: each arriving document's MinHash signature is
  * LSH-banded, and a document that collides with an earlier-kept
  * document in any band (and whose signatures agree on enough
  * components) is reported as a near-duplicate of it, before it ever
  * lands in the corpus store.
  *
  * Execution shape: signatures are row-local column math over the
  * `ShingleHash60` kernel (per-arriving-row cost, amortized across the
  * micro-batch), band keys explode to (band_idx, band_key) rows, and
  * the stateful step is `flatMapGroupsWithState` keyed on the band
  * bucket. State per bucket holds (id, signature) of KEPT documents
  * only — k longs per representative, never text — so state is bounded
  * by distinct near-dup classes colliding in the bucket, the same
  * data-bound quantity that bounds the batch operator's candidate join.
  *
  * Semantics (documented, test-pinned): first-seen-wins, arrival order
  * = (batch order, then id within a batch — micro-batch row order is
  * partition-dependent, so ties are broken deterministically by id). A
  * suppressed document is still admitted as a representative in bands
  * where it matched nothing, so later arrivals may report a match to a
  * near-duplicate of the original rather than the original itself —
  * the transitive closure (batch `Dedup.components`) is the authority
  * on cluster identity; the streaming operator's job is suppression at
  * ingest. Endless-ingest deployments would add event-time state
  * eviction (timeout), mirroring `StreamDedup.exactWithinWatermark`.
  */
// Top-level (not object-nested): Catalyst's generated deserializer
// constructs these reflectively and cannot thread an outer instance.
private[streaming] case class BandRow(
    bandIdx: Int, bandKey: String, id: Long, sig: Seq[Long])
private[streaming] case class NearMatch(
    id: Long, matchedId: Long, bandIdx: Int, nAgree: Int)

object StreamNearDedup {

  /** `raw`: streaming (idCol LONG, textCol STRING). Returns the match
    * stream (id, matched_id, band_idx, n_agree): one row per (document,
    * band) where the document hit an earlier representative; documents
    * with no output rows are unique-so-far. `minAgree` is the number of
    * signature components (of `bands * rowsPerBand`) that must agree —
    * estimated Jaccard = n_agree / k.
    */
  def minhashMatches(raw: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4, minAgree: Int = 10,
      nGram: Int = 3): DataFrame = {
    import graft.functions.TextFunctions.bandKeys
    val k = bands * rowsPerBand
    val spark = raw.sparkSession
    import spark.implicits._
    // shingle-less docs can't be compared; pre-filter on the cheap
    // token-count kernel (hs nonempty ⟺ tokens >= nGram) so the
    // shingle-hash kernel is not evaluated a second time by a filter
    // pushed below the projection (same fix as Dedup.shingleBase)
    val sigs = raw
      .where(graft.functions.TextKernels.tokenCount(col(textCol)) >= nGram)
      .select(
        col(idCol).cast("long").as("id"),
        graft.functions.ShingleHash.shingleHashes60(col(textCol), nGram).as("hs"))
      // compiled signature kernel (equal to TextFunctions.minhashSig —
      // DedupSpec pins it; the empty-array case is filtered above)
      .select(col("id"),
        graft.functions.ShingleHash.minhashSig60(col("hs"), k).as("sig"))
      .select(col("id"), col("sig"),
        posexplode(bandKeys(col("sig"), bands, rowsPerBand))
          .as(Seq("band_idx", "band_key")))
      .as[(Long, Seq[Long], Int, String)]
      .map { case (id, sig, bi, bk) => BandRow(bi, bk, id, sig) }
    sigs.groupByKey(r => (r.bandIdx, r.bandKey))
      .flatMapGroupsWithState[Seq[(Long, Seq[Long])], NearMatch](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Seq[(Long, Seq[Long])]]) =>
          var reps = state.getOption.getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[NearMatch]
          // deterministic within-batch order: id ascending
          rows.toSeq.sortBy(r => r.id).foreach { r =>
            val hit = reps.iterator.map { case (rid, rsig) =>
              (rid, rsig.iterator.zip(r.sig.iterator).count { case (a, b) => a == b })
            }.find(_._2 >= minAgree)
            hit match {
              case Some((rid, n)) => out += NearMatch(r.id, rid, r.bandIdx, n)
              case None => reps = reps :+ (r.id -> r.sig)
            }
          }
          state.update(reps)
          out.iterator
      }
      .toDF()
      .select(col("id"), col("matchedId").as("matched_id"),
        col("bandIdx").as("band_idx"), col("nAgree").as("n_agree"))
  }
}
