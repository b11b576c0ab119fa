package graft.multimodal

import org.apache.spark.sql.Dataset

/** ISO BMFF (MP4) container metadata walk — pure-JVM byte parsing, NO
  * sample decode: the container-format step on the codec seam after
  * [[Qoi]] (the reference has no multimodal surface; this implements
  * the public ISO/IEC 14496-12 box grammar from its spec, the way Qoi
  * implements the public QOI spec).
  *
  * What a training-data pipeline needs from a video payload BEFORE any
  * decoder runs: is it a well-formed container, how long is it, how
  * many tracks of which kind, what are the video dimensions — all of
  * which live in `moov`'s header boxes and cost a few hundred bytes of
  * byte arithmetic per file. Box grammar: `[size:u32be][type:4cc]
  * [payload]`; size==1 → a u64 `largesize` follows the type; size==0 →
  * the box extends to the end of the enclosing scope. `mvhd`/`tkhd`/
  * `hdlr` are FullBoxes (1 version byte + 3 flag bytes first), and
  * mvhd/tkhd carry 32- or 64-bit times by version. Truncated,
  * overrunning, or undersized boxes fail LOUDLY (never spin or
  * over-read — the Qoi corrupt-stream discipline).
  *
  * Actual frame decode stays behind the JNI/FFI seam
  * ([[Multimodal.RealDecoder]] still throws for "mp4" features); this
  * walk is the metadata half a pure JVM can do for real.
  */
object Mp4 {

  /** One track: its handler 4cc ("vide", "soun", ...) and, for video,
    * the tkhd presentation dimensions (16.16 fixed point, integer
    * part).
    */
  final case class Track(handler: String, width: Int, height: Int)

  final case class Meta(
      brand: String,        // ftyp major_brand ("" when ftyp is absent)
      timescale: Long,      // mvhd ticks per second
      durationTicks: Long,  // mvhd duration in ticks
      durationSec: Double,  // ticks / timescale (NaN on timescale 0)
      tracks: Seq[Track])

  /** Flat per-payload row for the DataFrame surface ([[extract]]). */
  final case class Mp4Meta(id: Long, brand: String, timescale: Long,
      duration_ticks: Long, duration_sec: Double, n_tracks: Int,
      handlers: String, video_width: Int, video_height: Int)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def fourCC(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** A parsed box: type plus the PAYLOAD span (header excluded). */
  private final case class Box(tpe: String, start: Int, end: Int)

  /** Walk the sibling boxes of one scope `[from, to)`. Loud on every
    * malformation: truncated headers, sizes smaller than their own
    * header, boxes overrunning the scope.
    */
  private def walk(b: Array[Byte], from: Int, to: Int): List[Box] = {
    val out = List.newBuilder[Box]
    var i = from
    while (i < to) {
      require(i + 8 <= to, s"truncated box header at offset $i")
      val size32 = be32(b, i)
      val tpe = fourCC(b, i + 4)
      var hdr = 8
      val size: Long =
        if (size32 == 1L) {
          require(i + 16 <= to, s"truncated largesize in box '$tpe' at $i")
          hdr = 16
          be64(b, i + 8)
        } else if (size32 == 0L) (to - i).toLong // to end of scope
        else size32
      require(size >= hdr,
        s"box '$tpe' at $i declares size $size smaller than its header")
      require(size <= to - i,
        s"box '$tpe' at $i (size $size) overruns its scope end $to")
      out += Box(tpe, i + hdr, i + size.toInt)
      i += size.toInt
    }
    out.result()
  }

  private def need(cond: Boolean, what: => String): Unit =
    require(cond, s"truncated $what")

  /** Parse one MP4 payload's container metadata. Requires a `moov` box
    * (a streaming-truncated file whose moov was at the tail fails
    * loudly — metadata genuinely is not there) with an `mvhd`;
    * everything else is optional.
    */
  def meta(bytes: Array[Byte]): Meta = {
    val top = walk(bytes, 0, bytes.length)
    val brand = top.find(_.tpe == "ftyp").map { f =>
      need(f.end - f.start >= 4, "ftyp major_brand")
      fourCC(bytes, f.start)
    }.getOrElse("")
    val moov = top.find(_.tpe == "moov").getOrElse(throw
      new IllegalArgumentException(
        "no moov box: not a complete MP4 (or the tail holding a " +
          "moov-at-end layout was truncated)"))
    val inMoov = walk(bytes, moov.start, moov.end)
    val mvhd = inMoov.find(_.tpe == "mvhd").getOrElse(throw
      new IllegalArgumentException("moov without mvhd"))
    need(mvhd.end - mvhd.start >= 4, "mvhd FullBox header")
    val (timescale, duration) = (bytes(mvhd.start) & 0xff) match {
      case 0 =>
        need(mvhd.end - mvhd.start >= 20, "mvhd v0 body")
        (be32(bytes, mvhd.start + 12), be32(bytes, mvhd.start + 16))
      case 1 =>
        need(mvhd.end - mvhd.start >= 32, "mvhd v1 body")
        (be32(bytes, mvhd.start + 20), be64(bytes, mvhd.start + 24))
      case v => throw new IllegalArgumentException(s"unknown mvhd version $v")
    }
    val tracks = inMoov.filter(_.tpe == "trak").map { t =>
      val inTrak = walk(bytes, t.start, t.end)
      val (w, h) = inTrak.find(_.tpe == "tkhd").map { k =>
        need(k.end - k.start >= 4, "tkhd FullBox header")
        // width/height are the LAST two fields (16.16 fixed), 72 bytes
        // after the FullBox header in v0 (20 times/id/duration + 8
        // reserved + 8 layer..volume + 36 matrix), 84 in v1 (64-bit
        // creation/modification/duration add 12)
        val off = (bytes(k.start) & 0xff) match {
          case 0 => 72
          case 1 => 84
          case v => throw new IllegalArgumentException(s"unknown tkhd version $v")
        }
        need(k.end - k.start >= 4 + off + 8, "tkhd body")
        ((be32(bytes, k.start + 4 + off) >>> 16).toInt,
          (be32(bytes, k.start + 4 + off + 4) >>> 16).toInt)
      }.getOrElse((0, 0))
      val handler = inTrak.find(_.tpe == "mdia").flatMap { m =>
        walk(bytes, m.start, m.end).find(_.tpe == "hdlr").map { hd =>
          // FullBox(4) + pre_defined(4) + handler_type(4cc)
          need(hd.end - hd.start >= 12, "hdlr body")
          fourCC(bytes, hd.start + 8)
        }
      }.getOrElse("")
      Track(handler, w, h)
    }
    Meta(brand, timescale, duration,
      if (timescale > 0) duration.toDouble / timescale else Double.NaN,
      tracks)
  }

  /** Per-track SAMPLE-TABLE statistics — the per-sample size/timing/
    * keyframe signal a video-curation pipeline needs (bitrate,
    * keyframe rate, sample-count sanity) WITHOUT any codec: everything
    * here is container math over `stbl`'s stsz (sizes, fixed or
    * per-sample), stts (decode deltas), stss (sync samples — absent
    * means every sample is sync, the spec's rule) and `mdhd`'s media
    * timescale. stts and stsz must agree on the sample count (loud
    * otherwise); only version-0 tables are in scope (the dominant
    * layout), loud on others.
    */
  final case class TrackSamples(handler: String, mediaTimescale: Long,
      nSamples: Long, totalBytes: Long, minSize: Long, maxSize: Long,
      durationTicks: Long, nSync: Long)

  def sampleStats(bytes: Array[Byte]): List[TrackSamples] = {
    val top = walk(bytes, 0, bytes.length)
    val moov = top.find(_.tpe == "moov").getOrElse(throw
      new IllegalArgumentException("no moov box: not a complete MP4"))
    walk(bytes, moov.start, moov.end).filter(_.tpe == "trak").flatMap { t =>
      val inTrak = walk(bytes, t.start, t.end)
      inTrak.find(_.tpe == "mdia").flatMap { m =>
        val inMdia = walk(bytes, m.start, m.end)
        val handler = inMdia.find(_.tpe == "hdlr").map { hd =>
          need(hd.end - hd.start >= 12, "hdlr body")
          fourCC(bytes, hd.start + 8)
        }.getOrElse("")
        val timescale = inMdia.find(_.tpe == "mdhd").map { md =>
          need(md.end - md.start >= 16, "mdhd body")
          (bytes(md.start) & 0xff) match {
            case 0 => be32(bytes, md.start + 12)
            case 1 =>
              need(md.end - md.start >= 24, "mdhd v1 body")
              be32(bytes, md.start + 20)
            case v =>
              throw new IllegalArgumentException(s"unknown mdhd version $v")
          }
        }.getOrElse(0L)
        inMdia.find(_.tpe == "minf").flatMap { mi =>
          walk(bytes, mi.start, mi.end).find(_.tpe == "stbl").map { sb =>
            val inStbl = walk(bytes, sb.start, sb.end)
            def fullV0(b: Box, what: String): Int = {
              need(b.end - b.start >= 8, s"$what body")
              if ((bytes(b.start) & 0xff) != 0)
                throw new IllegalArgumentException(
                  s"only version-0 $what tables are in scope")
              b.start + 4
            }
            val stsz = inStbl.find(_.tpe == "stsz").getOrElse(throw
              new IllegalArgumentException("stbl without stsz"))
            val szP = fullV0(stsz, "stsz")
            val fixedSize = be32(bytes, szP)
            val nSamples = be32(bytes, szP + 4)
            val (total, minSz, maxSz) =
              if (fixedSize != 0) (fixedSize * nSamples, fixedSize, fixedSize)
              else {
                need(stsz.end >= szP + 8 + 4 * nSamples, "stsz size array")
                var tot = 0L
                var mn = Long.MaxValue
                var mx = 0L
                var i = 0L
                while (i < nSamples) {
                  val s = be32(bytes, (szP + 8 + 4 * i).toInt)
                  tot += s
                  if (s < mn) mn = s
                  if (s > mx) mx = s
                  i += 1
                }
                (tot, if (nSamples == 0) 0L else mn, mx)
              }
            val stts = inStbl.find(_.tpe == "stts").getOrElse(throw
              new IllegalArgumentException("stbl without stts"))
            val ttP = fullV0(stts, "stts")
            val nEntries = be32(bytes, ttP)
            need(stts.end >= ttP + 4 + 8 * nEntries, "stts entry array")
            var dur = 0L
            var cnt = 0L
            var e = 0L
            while (e < nEntries) {
              val c = be32(bytes, (ttP + 4 + 8 * e).toInt)
              val d = be32(bytes, (ttP + 4 + 8 * e + 4).toInt)
              cnt += c
              dur += c * d
              e += 1
            }
            if (cnt != nSamples)
              throw new IllegalArgumentException(
                s"stts sample count $cnt disagrees with stsz $nSamples")
            val nSync = inStbl.find(_.tpe == "stss").map { ss =>
              val p = fullV0(ss, "stss")
              val n = be32(bytes, p)
              need(ss.end >= p + 4 + 4 * n, "stss entry array")
              n
            }.getOrElse(nSamples) // no stss: every sample is sync
            TrackSamples(handler, timescale, nSamples, total,
              minSz, maxSz, dur, nSync)
          }
        }
      }
    }
  }

  /** [[sampleStats]]'s quarantine twin ([[tryMeta]] convention). */
  def trySampleStats(bytes: Array[Byte]): Either[String, List[TrackSamples]] =
    try Right(sampleStats(bytes)) catch {
      case e: IllegalArgumentException =>
        Left(Option(e.getMessage).getOrElse("malformed MP4"))
      case e: IndexOutOfBoundsException =>
        Left(s"truncated MP4: out-of-bounds read at ${e.getMessage}")
    }

  /** One sync (key) sample's absolute byte range in the file. */
  final case class SyncSample(sample: Long, offset: Long, size: Long)
  final case class TrackSync(handler: String, syncs: List[SyncSample])

  /** Resolve every sync sample's ABSOLUTE byte range — the chunk math
    * that turns the sample tables into actual keyframe extraction from
    * `mdat` (frame-sampling a video corpus reads exactly these ranges
    * and nothing else, the IO shape that matters at 100 TB): stss
    * names the sync samples (1-based; absent = every sample), stsc's
    * (first_chunk, samples_per_chunk) runs place samples into chunks,
    * stco/co64 gives each chunk's file offset, and the offset within a
    * chunk is the cumulative size of the chunk's earlier samples from
    * stsz. Ranges are bounds-checked against the payload — an offset
    * table pointing past the file is loud, never a wild read
    * downstream.
    */
  def syncSamples(bytes: Array[Byte]): List[TrackSync] = {
    val top = walk(bytes, 0, bytes.length)
    val moov = top.find(_.tpe == "moov").getOrElse(throw
      new IllegalArgumentException("no moov box: not a complete MP4"))
    walk(bytes, moov.start, moov.end).filter(_.tpe == "trak").flatMap { t =>
      val inTrak = walk(bytes, t.start, t.end)
      inTrak.find(_.tpe == "mdia").flatMap { m =>
        val inMdia = walk(bytes, m.start, m.end)
        val handler = inMdia.find(_.tpe == "hdlr").map { hd =>
          need(hd.end - hd.start >= 12, "hdlr body")
          fourCC(bytes, hd.start + 8)
        }.getOrElse("")
        inMdia.find(_.tpe == "minf").flatMap { mi =>
          walk(bytes, mi.start, mi.end).find(_.tpe == "stbl").map { sb =>
            val inStbl = walk(bytes, sb.start, sb.end)
            def v0(b: Box, what: String): Int = {
              need(b.end - b.start >= 8, s"$what body")
              if ((bytes(b.start) & 0xff) != 0)
                throw new IllegalArgumentException(
                  s"only version-0 $what tables are in scope")
              b.start + 4
            }
            def boxOf(tpe: String): Box = inStbl.find(_.tpe == tpe)
              .getOrElse(throw new IllegalArgumentException(
                s"stbl without $tpe (needed to resolve byte ranges)"))
            // stsz → per-sample sizes
            val stsz = boxOf("stsz")
            val szP = v0(stsz, "stsz")
            val fixedSize = be32(bytes, szP)
            val n = be32(bytes, szP + 4)
            need(n <= Int.MaxValue / 8, "stsz sample count")
            val sizes = new Array[Long](n.toInt)
            if (fixedSize != 0) java.util.Arrays.fill(sizes, fixedSize)
            else {
              need(stsz.end >= szP + 8 + 4 * n, "stsz size array")
              var i = 0
              while (i < n) {
                sizes(i) = be32(bytes, szP + 8 + 4 * i); i += 1
              }
            }
            // stsc → chunk index (1-based) per sample
            val stsc = boxOf("stsc")
            val scP = v0(stsc, "stsc")
            val nRuns = be32(bytes, scP)
            need(stsc.end >= scP + 4 + 12 * nRuns, "stsc entry array")
            // stco / co64 → chunk offsets
            val (coOffs, coN) = inStbl.find(_.tpe == "stco") match {
              case Some(co) =>
                val p = v0(co, "stco")
                val cn = be32(bytes, p)
                need(co.end >= p + 4 + 4 * cn, "stco offset array")
                (Array.tabulate(cn.toInt)(k => be32(bytes, p + 4 + 4 * k)), cn)
              case None =>
                val co = boxOf("co64")
                val p = v0(co, "co64")
                val cn = be32(bytes, p)
                need(co.end >= p + 4 + 8 * cn, "co64 offset array")
                (Array.tabulate(cn.toInt)(k => be64(bytes, p + 4 + 8 * k)), cn)
            }
            // stss → 1-based sync sample numbers (absent: all)
            val syncNos: Array[Long] = inStbl.find(_.tpe == "stss") match {
              case Some(ss) =>
                val p = v0(ss, "stss")
                val sn = be32(bytes, p)
                need(ss.end >= p + 4 + 4 * sn, "stss entry array")
                Array.tabulate(sn.toInt)(k => be32(bytes, p + 4 + 4 * k))
              case None => Array.tabulate(n.toInt)(_ + 1L)
            }
            // walk chunks once, materializing each sample's (chunk,
            // index-in-chunk); stsc runs extend to the next first_chunk
            val sampleOffset = new Array[Long](n.toInt)
            var sample = 0L
            var run = 0L
            var chunk = 1L // 1-based
            while (sample < n) {
              if (chunk > coN)
                throw new IllegalArgumentException(
                  "stsc places samples beyond the stco chunk list")
              // advance to the run governing this chunk
              while (run + 1 < nRuns &&
                  be32(bytes, (scP + 4 + 12 * (run + 1)).toInt) <= chunk)
                run += 1
              val perChunk = be32(bytes, (scP + 4 + 12 * run + 4).toInt)
              if (perChunk <= 0)
                throw new IllegalArgumentException(
                  "stsc samples_per_chunk must be positive")
              var within = 0L
              var acc = coOffs((chunk - 1).toInt)
              while (within < perChunk && sample < n) {
                sampleOffset(sample.toInt) = acc
                acc += sizes(sample.toInt)
                sample += 1
                within += 1
              }
              chunk += 1
            }
            val syncs = syncNos.toList.map { no =>
              if (no < 1 || no > n)
                throw new IllegalArgumentException(
                  s"stss names sample $no outside 1..$n")
              val i = (no - 1).toInt
              val off = sampleOffset(i)
              if (off < 0 || off + sizes(i) > bytes.length)
                throw new IllegalArgumentException(
                  s"sample $no byte range [$off, ${off + sizes(i)}) " +
                    "overruns the payload")
              SyncSample(no, off, sizes(i))
            }
            TrackSync(handler, syncs)
          }
        }
      }
    }
  }

  /** [[syncSamples]]'s quarantine twin. */
  def trySyncSamples(bytes: Array[Byte]): Either[String, List[TrackSync]] =
    try Right(syncSamples(bytes)) catch {
      case e: IllegalArgumentException =>
        Left(Option(e.getMessage).getOrElse("malformed MP4"))
      case e: IndexOutOfBoundsException =>
        Left(s"truncated MP4: out-of-bounds read at ${e.getMessage}")
    }

  /** QUARANTINE form of [[meta]] — per-payload try: a malformed or
    * truncated payload yields Left(reason) instead of aborting the
    * pass. The loud form stays the default for fixtures (the Qoi
    * corrupt-stream discipline — a fixture that fails to parse is a
    * bug); a 100 TB curation run routes through this one so a single
    * truncated upload cannot kill the job. Only parse-shaped failures
    * are caught — real errors (OOM, interrupts) still propagate.
    */
  def tryMeta(bytes: Array[Byte]): Either[String, Meta] =
    try Right(meta(bytes)) catch {
      case e: IllegalArgumentException =>
        Left(Option(e.getMessage).getOrElse("malformed MP4"))
      case e: IndexOutOfBoundsException =>
        Left(s"truncated MP4: out-of-bounds read at ${e.getMessage}")
    }

  /** [[extract]]'s quarantine twin: nullable metadata plus an `err`
    * column — malformed rows SURVIVE the pass, filterable downstream
    * (`where(col("err").isNull)` keeps the clean side; the rest routes
    * to a quarantine sink). Same row-local mapPartitions shape.
    */
  final case class Mp4MetaQ(id: Long, brand: Option[String],
      timescale: Option[Long], duration_ticks: Option[Long],
      duration_sec: Option[Double], n_tracks: Option[Int],
      handlers: Option[String], video_width: Option[Int],
      video_height: Option[Int], err: Option[String])

  /** The ONE Meta→row field mapping both extract forms share, so a
    * change to what a parsed payload surfaces cannot drift between
    * the loud and quarantine twins (review r13).
    */
  private def metaFields(
      m: Meta): (String, Long, Long, Double, Int, String, Int, Int) = {
    val vid = m.tracks.find(_.handler == "vide")
    (m.brand, m.timescale, m.durationTicks, m.durationSec, m.tracks.size,
      m.tracks.map(_.handler).mkString(","),
      vid.map(_.width).getOrElse(0), vid.map(_.height).getOrElse(0))
  }

  def extractQuarantine(
      media: Dataset[Multimodal.MediaRow]): Dataset[Mp4MetaQ] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      tryMeta(r.payload) match {
        case Right(m) =>
          val (brand, ts, dt, ds, n, hs, w, h) = metaFields(m)
          Mp4MetaQ(r.id, Some(brand), Some(ts), Some(dt), Some(ds),
            Some(n), Some(hs), Some(w), Some(h), None)
        case Left(err) => Mp4MetaQ(r.id, None, None, None, None, None,
          None, None, None, Some(err))
      }
    })
  }

  /** Distributed metadata extraction over the standard media schema —
    * the mapPartitions shape [[Multimodal.extractFeatures]] documents
    * (row-local byte walk, no codec, no shuffle). The first video
    * track's dimensions surface as columns; handlers join as one
    * comma-separated field.
    */
  def extract(media: Dataset[Multimodal.MediaRow]): Dataset[Mp4Meta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (brand, ts, dt, ds, n, hs, w, h) = metaFields(meta(r.payload))
      Mp4Meta(r.id, brand, ts, dt, ds, n, hs, w, h)
    })
  }

  /** Minimal VALID fixture builder — the byte-level twin of the spec's
    * BMP/WAV/QOI builders, in the library because the mm05 gate
    * synthesizes per-document payloads with it (construction is
    * independent of [[meta]]'s walk: this writes boxes forward, the
    * walk parses them back; the DuckDB oracle predicts the fields
    * arithmetically). `v1 = true` writes 64-bit mvhd/tkhd times so
    * both version layouts stay exercised.
    */
  def buildFixture(brand: String, timescale: Long, durationTicks: Long,
      tracks: Seq[(String, Int, Int)], v1: Boolean = false,
      sampleSizes: Seq[Seq[Long]] = Nil, sampleDelta: Long = 0,
      syncEvery: Int = 0, samplesPerChunk: Int = 0,
      sampleFill: (Int, Long, Long) => Int = (_, _, _) => 0): Array[Byte] = {
    // chunked layout: stco needs mdat's absolute position, which is
    // only known after moov is fully written — record each stco
    // offset-array position and patch the final buffer
    val stcoPatch = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val trackDataStart = new Array[Int](tracks.size)
    val o = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      o.write(((v >>> 24) & 0xff).toInt); o.write(((v >>> 16) & 0xff).toInt)
      o.write(((v >>> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
    }
    def w64(v: Long): Unit = { w32(v >>> 32); w32(v & 0xffffffffL) }
    def cc(s: String): Unit = {
      require(s.length == 4, s"4cc: $s")
      o.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    }
    def box(tpe: String)(body: => Unit): Unit = {
      val sizeAt = o.size()
      w32(0); cc(tpe)
      body
      val bytes = o.toByteArray
      val size = bytes.length - sizeAt
      bytes(sizeAt) = ((size >>> 24) & 0xff).toByte
      bytes(sizeAt + 1) = ((size >>> 16) & 0xff).toByte
      bytes(sizeAt + 2) = ((size >>> 8) & 0xff).toByte
      bytes(sizeAt + 3) = (size & 0xff).toByte
      o.reset(); o.write(bytes, 0, bytes.length)
    }
    box("ftyp") { cc(brand); w32(0); cc("isom") }
    box("moov") {
      box("mvhd") {
        w32(if (v1) 0x01000000L else 0L) // version + flags
        if (v1) { w64(0); w64(0); w32(timescale); w64(durationTicks) }
        else { w32(0); w32(0); w32(timescale); w32(durationTicks) }
        w32(0x00010000L); w32(0) // rate, volume+reserved
        (0 until 2).foreach(_ => w32(0)) // reserved
        Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
          .foreach(w32) // unity matrix
        (0 until 6).foreach(_ => w32(0)) // pre_defined
        w32(tracks.size + 1L) // next_track_ID
      }
      tracks.zipWithIndex.foreach { case ((handler, wpx, hpx), i) =>
        box("trak") {
          box("tkhd") {
            w32(if (v1) 0x01000007L else 0x00000007L) // version, enabled
            if (v1) { w64(0); w64(0); w32(i + 1L); w32(0); w64(durationTicks) }
            else { w32(0); w32(0); w32(i + 1L); w32(0); w32(durationTicks) }
            w32(0); w32(0) // reserved
            w32(0); w32(0) // layer/alternate_group, volume/reserved
            Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L,
              0x40000000L).foreach(w32)
            w32(wpx.toLong << 16); w32(hpx.toLong << 16) // 16.16 fixed
          }
          box("mdia") {
            box("hdlr") { w32(0); w32(0); cc(handler); w32(0); w32(0); w32(0) }
            // optional sample tables (round 15 — the [[sampleStats]]
            // subset: mdhd timescale + stbl{stts, stsz, stss})
            val sizes = sampleSizes.lift(i).getOrElse(Nil)
            if (sizes.nonEmpty) {
              box("mdhd") {
                w32(0); w32(0); w32(0) // v0, creation, modification
                w32(timescale); w32(sizes.length * sampleDelta)
                w32(0x55c40000L) // language 'und' + pre_defined
              }
              box("minf") {
                box("stbl") {
                  box("stts") {
                    w32(0); w32(1) // v0; one run of equal deltas
                    w32(sizes.length.toLong); w32(sampleDelta)
                  }
                  box("stsz") {
                    w32(0); w32(0) // v0; per-sample sizes
                    w32(sizes.length.toLong)
                    sizes.foreach(w32)
                  }
                  if (syncEvery > 0) box("stss") {
                    val syncs = 1 to sizes.length by syncEvery
                    w32(0); w32(syncs.size.toLong)
                    syncs.foreach(s => w32(s.toLong))
                  }
                  if (samplesPerChunk > 0) {
                    box("stsc") {
                      w32(0); w32(1) // v0; one uniform run
                      w32(1); w32(samplesPerChunk.toLong); w32(1)
                    }
                    box("stco") {
                      val nChunks =
                        (sizes.length + samplesPerChunk - 1) / samplesPerChunk
                      w32(0); w32(nChunks.toLong)
                      stcoPatch += ((o.size(), i))
                      (0 until nChunks).foreach(_ => w32(0)) // patched below
                    }
                  }
                }
              }
            }
          }
        }
      }
    }
    if (samplesPerChunk > 0) {
      // a REAL mdat: each chunked track's samples concatenated, bytes
      // from sampleFill — so byte-range consumers read actual data
      box("mdat") {
        tracks.indices.foreach { i =>
          val sizes = sampleSizes.lift(i).getOrElse(Nil)
          if (sizes.nonEmpty) {
            trackDataStart(i) = o.size()
            sizes.zipWithIndex.foreach { case (sz, si) =>
              var j = 0L
              while (j < sz) { o.write(sampleFill(i, si.toLong, j) & 0xff); j += 1 }
            }
          }
        }
      }
    } else {
      box("mdat") { w32(0xdeadbeefL) } // token payload; the walk never reads it
    }
    val out = o.toByteArray
    stcoPatch.foreach { case (pos, i) =>
      val sizes = sampleSizes(i)
      var off = trackDataStart(i).toLong
      var k = 0
      var s = 0
      while (s < sizes.length) {
        out(pos + 4 * k) = ((off >>> 24) & 0xff).toByte
        out(pos + 4 * k + 1) = ((off >>> 16) & 0xff).toByte
        out(pos + 4 * k + 2) = ((off >>> 8) & 0xff).toByte
        out(pos + 4 * k + 3) = (off & 0xff).toByte
        var c = 0
        while (c < samplesPerChunk && s < sizes.length) {
          off += sizes(s); s += 1; c += 1
        }
        k += 1
      }
    }
    out
  }
}
