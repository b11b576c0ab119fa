package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: payloads are opaque `BINARY` columns with a typed metadata
  * struct; decode / feature-extraction runs per-partition so one decoder
  * instance is initialized per task, never per row.
  *
  * The codec seam is the `Decoder` trait: `RealDecoder` decodes for
  * real through the JDK's own codecs (ImageIO bmp/png/jpeg/gif,
  * AudioSystem PCM16 WAV — no native deps) plus one real NON-JDK codec
  * (the built-in [[Qoi]] decoder, proving the seam's bit-for-bit
  * contract on a genuinely compressed format) plus the built-in
  * [[Flac]] and [[Webp]] (VP8L) decoders, throwing for formats still
  * past reach (mp4 SAMPLE decode → a JNI/FFI extension point with the
  * same contract, MultimodalContractSpec — mp4 CONTAINER metadata is
  * already real, see [[Mp4]] and [[Containers]]); `stub` produces
  * deterministic features from the payload bytes so the distributed
  * plumbing — schema, batched per-partition iteration, partitioning
  * advice — is testable without any codec at all.
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

  /** Decoder seam. `RealDecoder` is the production hook (JDK-native
    * codecs; extend with JNI/FFI for formats beyond them); `stub`
    * produces deterministic features from the payload bytes so the
    * distributed plumbing is testable without any codec at all.
    */
  trait Decoder extends Serializable {
    def features(payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float]
  }

  /** Production decoder over the JDK's own codecs — no native deps:
    * `javax.imageio.ImageIO` for bmp/png/jpeg/gif (every JRE ships
    * these plugins) and `javax.sound.sampled.AudioSystem` for PCM16
    * WAV. Satisfies [[UncompressedDecoder]]'s contract bit-for-bit on
    * its BMP/WAV goldens (MultimodalContractSpec pins it): identical
    * per-pixel luminance fold `acc((y*w+x) % dim) += (r+g+b)/(3*255)`
    * in identical top-down row order, identical sample normalization
    * `s/32768`. Lossless formats (bmp, png, gif) of the same pixel
    * content therefore produce identical features; lossy jpeg produces
    * whatever pixels its decode yields. `qoi` decodes through the
    * built-in [[Qoi]] codec — the non-JDK proof of the seam's
    * lossless-equality contract — or, when `GRAFT_NATIVE_LIB` names a
    * compiled [[NativeCodec]] library, through the NATIVE decoder
    * across the JNI seam (NativeSeamSpec pins the two bit-identical;
    * absent the flag, behavior is unchanged). `wav` likewise routes
    * to the native PCM16 decode when the flag is set, as do `flac`
    * ([[Flac]]) and `webp` ([[Webp]], VP8L lossless). Formats still
    * past reach (mp4 sample decode) throw toward the same extension
    * point.
    */
  object RealDecoder extends Decoder {
    // Resolved once per JVM, lazily (None when GRAFT_NATIVE_LIB is
    // unset). Executors resolve their own copy from their own env —
    // the deploy shape a native codec needs anyway: the .so must
    // exist on every host, and the flag marks where it is. The
    // override is the TEST seam: sys.env is immutable in-JVM, so the
    // contract spec injects its self-built handle here.
    @volatile private[graft] var handleOverride: Option[NativeCodecHandle] =
      None
    @transient private lazy val fromEnv: Option[NativeCodecHandle] =
      NativeCodec.fromEnv()
    private def native: Option[NativeCodecHandle] =
      handleOverride.orElse(fromEnv)

    def features(payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      meta.format match {
        case "bmp" | "png" | "jpeg" | "jpg" | "gif" =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          require(img != null, s"undecodable ${meta.format} payload")
          val w = img.getWidth
          val h = img.getHeight
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y) // ARGB, alpha ignored
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              acc((y * w + x) % dim) += (r + g + b) / (3.0f * 255.0f)
              x += 1
            }
            y += 1
          }
        case "wav" =>
          // samples come from the native PCM16 walk when the seam is
          // enabled, from AudioSystem otherwise — same s/32768 fold
          // either way, so features are bit-identical (NativeSeamSpec)
          val samples: Array[Short] = native match {
            case Some(nh) => nh.decodeWavPcm16(payload)
            case None =>
              import javax.sound.sampled.{AudioFormat, AudioSystem}
              val in = AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(payload))
              try {
                val fmt = in.getFormat
                require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
                    fmt.getSampleSizeInBits == 16,
                  s"contract covers PCM16 WAV, got $fmt")
                val bytes = in.readAllBytes()
                val be = fmt.isBigEndian
                val out = new Array[Short](bytes.length / 2)
                var i = 0
                while (i < out.length) {
                  out(i) =
                    if (be) ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
                    else ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
                  i += 1
                }
                out
              } finally in.close()
          }
          var i = 0
          while (i < samples.length) {
            acc(i % dim) += samples(i) / 32768.0f
            i += 1
          }
        case "qoi" =>
          // the seam's first real NON-JDK codec: a complete decoder for
          // the public QOI spec ([[Qoi]]), folded with the identical
          // per-pixel luminance rule — MultimodalContractSpec pins
          // QOI-vs-BMP feature equality bit-for-bit on shared pixels,
          // the exact contract a JNI/FFI codec must satisfy. With the
          // seam enabled the pixels come from the NATIVE decoder
          // (bit-identical to Qoi.decode per NativeSeamSpec).
          // px is top-down row-major, so j IS y*w+x — the same bucket
          // index the ImageIO branch computes
          val (px, pxOff) = native match {
            case Some(nh) => (nh.decodeQoi(payload), 2) // [w, h, px...]
            case None => (Qoi.decode(payload)._3, 0)
          }
          var j = 0
          while (j < px.length - pxOff) {
            val rgb = px(j + pxOff)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            acc(j % dim) += (r + g + b) / (3.0f * 255.0f)
            j += 1
          }
        case "webp" =>
          // the second image codec family (round 15): VP8L lossless
          // pixels from the native walk when the seam is enabled, from
          // the built-in [[Webp]] decoder otherwise — ARGB either way,
          // folded with the identical per-pixel luminance rule, so
          // features are bit-identical across the ABI (NativeSeamSpec)
          // AND to a BMP of the same pixels (MultimodalContractSpec)
          val (wpx, off) = native match {
            case Some(nh) => (nh.decodeWebpArgb(payload), 2) // [w, h, px...]
            case None => (Webp.decode(payload)._3, 0)
          }
          var j = 0
          while (j < wpx.length - off) {
            val rgb = wpx(j + off)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            acc(j % dim) += (r + g + b) / (3.0f * 255.0f)
            j += 1
          }
        case "flac" =>
          // the second audio codec family (round 15): samples come
          // from the native FLAC walk when the seam is enabled, from
          // the built-in [[Flac]] decoder otherwise — interleaved s16
          // either way, folded with the identical s/32768 rule, so
          // features are bit-identical across the ABI (NativeSeamSpec)
          // AND to a WAV of the same PCM (MultimodalContractSpec)
          val samples: Array[Short] = native match {
            case Some(nh) => nh.decodeFlacPcm16(payload)
            case None => Flac.decode(payload)
          }
          var i = 0
          while (i < samples.length) {
            acc(i % dim) += samples(i) / 32768.0f
            i += 1
          }
        case f =>
          throw new IllegalArgumentException(
            s"RealDecoder covers bmp/png/jpeg/jpg/gif via ImageIO, wav " +
              s"via AudioSystem, qoi/flac/webp via the built-in " +
              s"Qoi/Flac/Webp decoders; got " +
              s"'$f' — extend the seam with a JNI/FFI codec (mp4 " +
              "CONTAINER metadata — duration/tracks/dims — is pure-JVM " +
              "already: graft.multimodal.Mp4.meta)")
      }
      acc
    }
  }

  /** The EXECUTABLE contract a real codec must satisfy, provable without
    * any codec library: uncompressed formats (BI_RGB BMP, PCM16 WAV)
    * are parseable with plain byte arithmetic, so this decoder extracts
    * the actual samples and folds them into `dim` buckets —
    * `acc(i % dim) += normalized sample i` (pixel luminance in [0,1],
    * audio amplitude in [-1,1)). A JNI/FFI `RealDecoder` wired to
    * libjpeg/ffmpeg must reproduce these features bit-for-bit on the
    * same uncompressed inputs — that is the seam's contract, and
    * MultimodalContractSpec pins it against hand-computed goldens.
    */
  object UncompressedDecoder extends Decoder {
    private def u16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], i: Int): Int =
      u16(b, i) | (u16(b, i + 2) << 16)

    def features(payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      meta.format match {
        case "bmp" =>
          // BITMAPFILEHEADER (14B) + BITMAPINFOHEADER: pixel-array
          // offset at 10, width at 18, height at 22 (positive =
          // bottom-up), bpp at 28; rows padded to 4-byte multiples.
          require(payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M',
            "not a BMP payload")
          require(u16(payload, 28) == 24, "contract covers 24bpp BI_RGB only")
          val off = u32(payload, 10)
          val w = u32(payload, 18)
          // biHeight is SIGNED: positive = rows stored bottom-up,
          // negative = top-down (common from Windows tooling) — both
          // are valid files and must yield identical features
          val hRaw = u32(payload, 22)
          val topDown = hRaw < 0
          val h = math.abs(hRaw)
          val rowBytes = ((w * 3 + 3) / 4) * 4
          require(off + h.toLong * rowBytes <= payload.length,
            "truncated BMP payload")
          var y = 0
          while (y < h) {
            // row y counted from the TOP of the image
            val base = off + (if (topDown) y else h - 1 - y) * rowBytes
            var x = 0
            while (x < w) {
              val b = payload(base + x * 3) & 0xff
              val g = payload(base + x * 3 + 1) & 0xff
              val r = payload(base + x * 3 + 2) & 0xff
              acc((y * w + x) % dim) += (r + g + b) / (3.0f * 255.0f)
              x += 1
            }
            y += 1
          }
        case "wav" =>
          // RIFF/WAVE with PCM16 samples: walk the chunk list to "data".
          require(payload.length >= 12 && payload(0) == 'R' && payload(8) == 'W',
            "not a RIFF/WAVE payload")
          var p = 12
          var done = false
          while (!done && p + 8 <= payload.length) {
            val id = new String(payload, p, 4, "US-ASCII")
            val sz = u32(payload, p + 4)
            // a corrupt size field must fail loudly, not spin the
            // executor (sz <= -8 would make the skip a no-op) or read
            // past the buffer
            require(sz >= 0 && p + 8 + sz.toLong <= payload.length,
              s"corrupt or truncated WAV chunk '$id' (size $sz)")
            if (id == "data") {
              var i = 0
              val n = sz / 2
              while (i < n) {
                val s = u16(payload, p + 8 + i * 2).toShort
                acc(i % dim) += s / 32768.0f
                i += 1
              }
              done = true
            } else p += 8 + sz + (sz & 1)
          }
          require(done, "no data chunk in WAV payload")
        case f =>
          throw new IllegalArgumentException(
            s"UncompressedDecoder covers bmp/wav, got '$f' — wire RealDecoder")
      }
      acc
    }
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
