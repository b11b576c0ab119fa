package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: payloads are opaque `BINARY` columns with a typed metadata
  * struct; decode / feature-extraction runs per-partition so one decoder
  * instance is initialized per task, never per row.
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * environment) behind `Decoder`; the Spark-side plumbing — schema,
  * batched per-partition iteration, partitioning advice, deterministic
  * fake features for tests — is real.
  */
object Multimodal {

  /** Typed metadata carried alongside the payload. */
  case class MediaMeta(
      format: String,    // e.g. "jpeg", "wav", "mp4"
      width: Int,        // pixels (or 0 for audio)
      height: Int,
      nBytes: Long)

  case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(id: Long, dim: Int, features: Array[Float])

  /** Decoder seam. `real` is the production hook — wire an actual codec
    * (JNI/FFI) here; it is deliberately unimplemented in this container.
    * `stub` produces deterministic features from the payload bytes so the
    * distributed plumbing is testable end-to-end.
    */
  trait Decoder extends Serializable {
    def features(payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float]
  }

  /** Production decoder — intentionally unimplemented here. */
  object RealDecoder extends Decoder {
    def features(payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float] =
      ??? // real codec (libjpeg/ffmpeg/...) not available in this environment
  }

  /** Deterministic fake: a rolling-hash projection of the bytes into
    * `dim` float buckets — stable across runs/partitionings.
    */
  object StubDecoder extends Decoder {
    def features(payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) {
        h = 31 * h + payload(i)
        acc(((h % dim).toInt + dim) % dim) += ((h >>> 32).toInt % 1024) / 1024.0f
        i += 1
      }
      acc
    }
  }

  /** Wrap raw binary payloads into the standard media schema. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(format).as("format"),
        lit(0).as("width"),
        lit(0).as("height"),
        octet_length(col(payloadCol)).cast("long").as("nBytes")).as("meta"))

  /** Per-partition feature extraction. The decoder is resolved once per
    * partition (the expensive codec init happens per task, not per row);
    * rows stream through without materializing the partition.
    *
    * At scale: repartition upstream so partitions are payload-size
    * balanced (`repartitionByRange` on nBytes percentile buckets beats
    * hash on id when payload sizes are heavy-tailed).
    */
  def extractFeatures(
      media: Dataset[MediaRow], dim: Int,
      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-task decoder setup would happen here (codec contexts, etc.)
      rows.map(r => MediaFeatures(r.id, dim, decoder.features(r.payload, r.meta, dim)))
    }
  }

  /** Frame sampling for video-like payloads: keep every `stride`-th
    * chunk of `chunkBytes`. Pure column ops — no UDF.
    */
  def sampleChunks(df: DataFrame, payloadCol: String,
      chunkBytes: Int, stride: Int): DataFrame = {
    val nChunks = ceil(octet_length(col(payloadCol)).cast("double") / chunkBytes).cast("int")
    df.withColumn("sampled_chunks",
      transform(
        sequence(lit(0), greatest(nChunks - 1, lit(0)), lit(stride)),
        i => substring(col(payloadCol), (i * chunkBytes + 1).cast("int"), lit(chunkBytes))))
  }

  def withMediaStats(media: DataFrame): DataFrame =
    media.select(
      col("id"),
      col("meta.format").as("format"),
      col("meta.nBytes").as("n_bytes"),
      md5(col("payload")).as("digest"))

  /** Byte-distribution features (histogram-derived, integer-exact) per
    * payload — the pre-codec content-type/corruption signal; see
    * [[graft.functions.ByteStats]].
    */
  def byteStats(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("byte_stats",
      graft.functions.ByteStatsFn.byteStats(col(payloadCol)))
}
