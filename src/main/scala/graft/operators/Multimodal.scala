package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as partition-parallel batch
  * functions over the binary payloads.
  *
  * BMP, PNG, GIF, JPEG (baseline, progressive SOF2, arithmetic SOF9 +
  * SOF10, 12-bit extended sequential via [[Jpeg12]], lossless SOF3 via
  * [[LosslessJpeg]]), WAV (linear PCM, G.711 A-law/μ-law, IMA ADPCM)
  * decode FOR REAL (dependency-free codecs in this package); MP3
  * duration comes from a real all-frame header walk (Xing/VBRI aware),
  * MP4 exposes its full per-sample layout via
  * [[Mp4Tables]]/[[explodeVideoSamples]], and motion-JPEG video samples
  * decode to pixels via [[decodeVideoFrames]]. Formats
  * that need transform machinery the JDK lacks (MP3/AAC
  * sample decode, inter-frame video codec payloads) go through
  * [[stubDecode]] — a deterministic fake raster derived from payload bytes
  * + declared metadata, so every downstream contract (schema, batch shape,
  * partitioning, null handling) is real and tested, and a real decoder can
  * be swapped in behind the same signature.
  */
object Multimodal {

  /** Typed metadata carried next to every binary payload. */
  val MediaMetadataType: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("format", StringType, nullable = false), // png|jpeg|wav|mp4|...
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Canonical multimodal record schema: id + payload + metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", MediaMetadataType, nullable = false)))

  final case class DecodedFeatures(media_id: Long, width: Int, height: Int,
                                   n_bytes: Long, features: Array[Float])

  /** Deterministic fake decode: features are a normalized byte histogram of
    * the payload (16 bins). A real implementation would decode the raster
    * and pool pixels; contract (one row in -> one row out, null payloads
    * dropped) is identical. */
  def stubDecode(mediaId: Long, payload: Array[Byte],
                 width: Int, height: Int): DecodedFeatures = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) / 16) += 1f; i += 1 }
    val n = math.max(1, payload.length).toFloat
    DecodedFeatures(mediaId, width, height, payload.length.toLong,
      hist.map(_ / n))
  }

  /** Partition-parallel decode + feature extraction over the binary column
    * (the Scala shape of a pandas-UDF `mapInPandas` batch fn). BMP, PNG,
    * GIF, and JPEG payloads decode FOR REAL ([[RasterCodec]] /
    * [[JpegCodec]] / [[ArithJpeg]] / [[GifCodec]] — no media library
    * needed; JPEG covers baseline, progressive SOF2, AND sequential
    * arithmetic SOF9) and pool a 16-bin grayscale pixel histogram with
    * the true dimensions; payloads still needing a codec (video samples)
    * fall back to the deterministic stub over the raw bytes with the
    * declared dimensions. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedFeatures] = {
    import spark.implicits._
    media
      .where(col("payload").isNotNull)
      .select(col("media_id"), col("payload"),
        coalesce(col("meta.width"), lit(0)).as("w"),
        coalesce(col("meta.height"), lit(0)).as("h"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions(_.map { case (id, bytes, w, h) =>
        RasterCodec.decode(bytes) match {
          case Some(r) =>
            val hist = new Array[Float](16)
            var i = 0
            val n = r.width * r.height
            while (i < n) {
              // integer luma (Rec.601 weights scaled by 256)
              val base = i * r.channels
              val gray =
                if (r.channels >= 3)
                  (77 * (r.data(base) & 0xff) + 150 * (r.data(base + 1) & 0xff) +
                    29 * (r.data(base + 2) & 0xff)) >> 8
                else r.data(base) & 0xff
              hist(gray / 16) += 1f
              i += 1
            }
            DecodedFeatures(id, r.width, r.height, bytes.length.toLong,
              hist.map(_ / math.max(1, n)))
          case None => stubDecode(id, bytes, w, h)
        }
      })
  }

  /** Integer-exact raster features from the REAL decode path: per-channel
    * pixel sums + true dimensions, None for undecodable payloads. Exact
    * integers make this oracle-checkable: a synthetic image built from a
    * known formula must decode back to the formula's analytic sums. */
  final case class RasterFeatures(media_id: Long, fmt: String,
                                  width: Int, height: Int,
                                  sum_r: Long, sum_g: Long, sum_b: Long)

  def decodeRasterFeatures(spark: SparkSession, media: DataFrame): Dataset[RasterFeatures] = {
    import spark.implicits._
    media
      .where(col("payload").isNotNull)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        for {
          (fmt, _, _) <- sniffImageHeader(bytes)
          r <- RasterCodec.decode(bytes)
        } yield {
          val sums = new Array[Long](3)
          var i = 0
          val n = r.width * r.height
          while (i < n) {
            val base = i * r.channels
            var c = 0
            while (c < 3) {
              sums(c) += (r.data(base + (if (r.channels >= 3) c else 0)) & 0xff)
              c += 1
            }
            i += 1
          }
          RasterFeatures(id, fmt, r.width, r.height, sums(0), sums(1), sums(2))
        }
      })
  }

  /** Raster RESIZE features — decode, k x k box-average downsample
    * ([[RasterCodec.boxDownsample]] — integer-exact area filter), then
    * per-channel sums of the RESIZED image. The resize step every
    * image-training pipeline runs before feature extraction, with the
    * integer contract that keeps the whole decode->resize path under an
    * analytic oracle. Partition-parallel; undecodable or
    * smaller-than-one-block payloads drop. */
  final case class ResizedFeatures(media_id: Long, fmt: String,
                                   out_width: Int, out_height: Int,
                                   sum_r: Long, sum_g: Long, sum_b: Long)

  def resizeRasterFeatures(spark: SparkSession, media: DataFrame,
                           k: Int): Dataset[ResizedFeatures] = {
    import spark.implicits._
    media
      .where(col("payload").isNotNull)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        for {
          (fmt, _, _) <- sniffImageHeader(bytes)
          r <- RasterCodec.decode(bytes)
          small <- RasterCodec.boxDownsample(r, k)
        } yield {
          val sums = new Array[Long](3)
          var i = 0
          val n = small.width * small.height
          while (i < n) {
            val base = i * small.channels
            var c = 0
            while (c < 3) {
              sums(c) += (small.data(base +
                (if (small.channels >= 3) c else 0)) & 0xff)
              c += 1
            }
            i += 1
          }
          ResizedFeatures(id, fmt, small.width, small.height,
            sums(0), sums(1), sums(2))
        }
      })
  }

  /** Integer-exact PCM features from the REAL WAV decode path: per-channel
    * sample sums (first two channels) + true stream parameters, skipping
    * undecodable/non-PCM payloads. Exact integers make this
    * oracle-checkable the same way as [[RasterFeatures]]: a synthetic
    * waveform built from a formula must decode back to the formula's
    * analytic sums. */
  final case class AudioFeatures(media_id: Long, channels: Int,
                                 sample_rate: Int, n_frames: Long,
                                 duration_ms: Long,
                                 sum_ch0: Long, sum_ch1: Long)

  def decodeAudioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media
      .where(col("payload").isNotNull)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AudioCodec.decodeWav(bytes).orElse(FlacCodec.decode(bytes)).map { pcm =>
          var s0 = 0L
          var s1 = 0L
          var k = 0
          while (k < pcm.samples.length) {
            val ch = k % pcm.channels
            if (ch == 0) s0 += pcm.samples(k)
            else if (ch == 1) s1 += pcm.samples(k)
            k += 1
          }
          AudioFeatures(id, pcm.channels, pcm.sampleRate, pcm.frames.toLong,
            pcm.durationMs, s0, s1)
        }
      })
  }

  /** REAL (dependency-free) audio header decode, the WAV analog of
    * [[sniffImageHeader]]: walk the RIFF chunks without touching sample
    * data and return (format, channels, sample_rate, duration_ms) — what
    * a 100 TB ingest runs to validate payloads and populate metadata. */
  def sniffAudioHeader(p: Array[Byte]): Option[(String, Int, Int, Long)] =
    AudioCodec.sniffWav(p).map(h =>
      ("wav", h.channels, h.sampleRate, h.durationMs))
      .orElse(FlacCodec.sniffFlac(p).map { case (i, _) =>
        ("flac", i.channels, i.sampleRate, i.durationMs) })
      .orElse(OggSniff.sniffOgg(p).map(o =>
        (o.format, o.channels, o.sampleRate, o.durationMs)))
      .orElse(sniffMp3Header(p))

  /** One parsed MPEG-audio (Layer III) frame header at `off`:
    * (kbps, sample_rate, channels, samples_per_frame, frame_length_bytes).
    * Rejects the reserved version, non-L3 layers, free/bad bitrate and
    * reserved sample-rate codes — the walk in [[sniffMp3Header]] relies on
    * that rejection to stop cleanly at trailing garbage or an ID3v1 tag. */
  private def parseMp3Frame(p: Array[Byte], off: Int): Option[(Int, Int, Int, Int, Int)] = {
    if (off < 0 || off + 4 > p.length) return None
    val b2 = p(off + 1) & 0xff
    val b3 = p(off + 2) & 0xff
    val b4 = p(off + 3) & 0xff
    if ((p(off) & 0xff) != 0xff || (b2 & 0xe0) != 0xe0) return None
    val versionBits = (b2 >> 3) & 3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    val layerBits = (b2 >> 1) & 3 // 1 = Layer III
    if (versionBits == 1 || layerBits != 1) return None // reserved / not L3
    val bitrateIdx = (b3 >> 4) & 15
    val srIdx = (b3 >> 2) & 3
    if (bitrateIdx == 0 || bitrateIdx == 15 || srIdx == 3) return None
    val mpeg1 = versionBits == 3
    val kbps = (if (mpeg1)
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    else
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
      )(bitrateIdx)
    val sampleRate = (versionBits match {
      case 3 => Array(44100, 48000, 32000)
      case 2 => Array(22050, 24000, 16000)
      case _ => Array(11025, 12000, 8000)
    })(srIdx)
    val channels = if (((b4 >> 6) & 3) == 3) 1 else 2
    val spf = if (mpeg1) 1152 else 576
    val pad = (b3 >> 1) & 1
    val frameLen = spf / 8 * kbps * 1000 / sampleRate + pad
    Some((kbps, sampleRate, channels, spf, frameLen))
  }

  private def beInt(p: Array[Byte], off: Int): Long =
    (((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
      ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL))

  /** MP3 header-only sniff, VBR-correct: skip an ID3v2 tag (syncsafe
    * size), parse the first frame header, then get the frame count from a
    * Xing/Info or VBRI header if present, else WALK every frame header
    * (each frame's own bitrate gives its length — O(#frames), no entropy
    * decode). Duration = whole_frames x samples_per_frame / sample_rate,
    * exact for CBR and VBR alike; the old first-frame-bitrate estimate was
    * wrong for VBR, the common case for speech/podcast corpora. The walk
    * stops at the first non-frame byte (trailing garbage, ID3v1 'TAG') or
    * a mid-frame truncation. Returns (format, channels, sample_rate,
    * duration_ms); sample decode stays honestly stubbed. */
  def sniffMp3Header(p: Array[Byte]): Option[(String, Int, Int, Long)] = {
    if (p == null || p.length < 4) return None
    var off = 0
    if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      val size = ((p(6) & 0x7f) << 21) | ((p(7) & 0x7f) << 14) |
        ((p(8) & 0x7f) << 7) | (p(9) & 0x7f)
      off = 10 + size
      if (off < 0 || off + 4 > p.length) return None
    }
    val (_, sampleRate, channels, spf, _) =
      parseMp3Frame(p, off).getOrElse(return None)
    // Xing/Info sits after the side info of the first frame; VBRI at a
    // fixed 32-byte offset. Either carries the authoritative frame count.
    val mpeg1 = spf == 1152
    val side = if (mpeg1) { if (channels == 1) 17 else 32 }
               else       { if (channels == 1) 9  else 17 }
    val xingOff = off + 4 + side
    if (xingOff + 12 <= p.length &&
        ((p(xingOff) == 'X' && p(xingOff + 1) == 'i' &&
          p(xingOff + 2) == 'n' && p(xingOff + 3) == 'g') ||
         (p(xingOff) == 'I' && p(xingOff + 1) == 'n' &&
          p(xingOff + 2) == 'f' && p(xingOff + 3) == 'o')) &&
        (beInt(p, xingOff + 4) & 1L) != 0) {
      val frames = beInt(p, xingOff + 8) // unsigned 32-bit: no overflow x spf x 1000
      return Some(("mp3", channels, sampleRate, frames * spf * 1000L / sampleRate))
    }
    val vbriOff = off + 4 + 32
    if (vbriOff + 18 <= p.length &&
        p(vbriOff) == 'V' && p(vbriOff + 1) == 'B' &&
        p(vbriOff + 2) == 'R' && p(vbriOff + 3) == 'I') {
      val frames = beInt(p, vbriOff + 14)
      return Some(("mp3", channels, sampleRate, frames * spf * 1000L / sampleRate))
    }
    // No VBR header: walk every frame (lengths differ per frame under VBR).
    var frames = 0L
    var totalSamples = 0L
    var cur = off
    var more = true
    while (more) parseMp3Frame(p, cur) match {
      case Some((_, sr, _, fspf, len)) if sr == sampleRate && cur + len <= p.length =>
        frames += 1; totalSamples += fspf; cur += len
      case _ => more = false
    }
    Some(("mp3", channels, sampleRate, totalSamples * 1000L / sampleRate))
  }

  /** MPEG1 Layer III 44.1 kHz joint-stereo frame-sequence fixture writer:
    * one zero-payload frame per bitrate index (1..14 — 32..320 kbps), each
    * sized to its exact header-implied length. Gives specs and the m06
    * gate true VBR streams whose duration is analytic
    * (n_frames x 1152 / 44100 s) while the per-frame lengths vary; also
    * documents the byte layout [[sniffMp3Header]]'s walk depends on. */
  def encodeMp3Frames(bitrateIndices: Seq[Int], padding: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val pad = if (padding) 1 else 0
    bitrateIndices.foreach { idx =>
      require(idx >= 1 && idx <= 14, s"bitrate index out of range: $idx")
      val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
        224, 256, 320)(idx)
      val frame = new Array[Byte](144 * kbps * 1000 / 44100 + pad)
      frame(0) = 0xff.toByte
      frame(1) = 0xfb.toByte // MPEG1, Layer III, no CRC
      frame(2) = ((idx << 4) | (pad << 1)).toByte // sr idx 0 = 44100 Hz
      frame(3) = 0x40.toByte // joint stereo
      out.write(frame, 0, frame.length)
    }
    out.toByteArray
  }

  /** Minimal ISO-BMFF container skeleton: ftyp + moov(trak(tkhd) + mvhd),
    * version-0 boxes, no media samples — the metadata shape every mp4
    * muxer emits and exactly what [[sniffVideoHeader]] walks. Fixture
    * writer for the m05 gate and specs; also documents the byte layout
    * the sniff depends on. */
  def encodeMp4Header(width: Int, height: Int, timescale: Int,
                      durationTicks: Int): Array[Byte] = {
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(name.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", "isomiso2".getBytes("US-ASCII"))
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0) // version + flags
      b.putInt(1).putInt(2) // creation / modification
      b.putInt(timescale).putInt(durationTicks)
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(0).putInt(1).putInt(2).putInt(1).putInt(0).putInt(durationTicks)
      b.position(76)
      b.putInt(width << 16).putInt(height << 16) // 16.16 fixed extent
      box("tkhd", b.array())
    }
    ftyp ++ box("moov", box("trak", tkhd) ++ mvhd)
  }

  /** MP4/QuickTime header sniff, the video analog of [[sniffImageHeader]]:
    * a length-tagged box walk (ftyp validated, moov/mvhd for timescale +
    * duration, trak/tkhd for the presentation dimensions in 16.16 fixed
    * point — the video track is the one with nonzero extent; audio tracks
    * report 0x0). All offsets in Long (64-bit box sizes exist and a
    * crafted 2^31 size must fail the bounds check, not wrap it). No
    * sample data is touched — this is the metadata-validation walk a
    * 100 TB ingest runs before any codec. Returns
    * (format, width, height, duration_ms). */
  def sniffVideoHeader(p: Array[Byte]): Option[(String, Int, Int, Long)] =
    try sniffVideoHeaderImpl(p) catch {
      // a box whose declared size exceeds its actual payload (truncated
      // mvhd/tkhd) reads past the buffer: None, never a task-killing throw
      case _: ArrayIndexOutOfBoundsException => None
    }

  private def sniffVideoHeaderImpl(p: Array[Byte]): Option[(String, Int, Int, Long)] = {
    if (p == null || p.length < 16) return None
    def u8(i: Long): Int = p(i.toInt) & 0xff
    def be16(i: Long): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Long): Long = (u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Long): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Long, s: String): Boolean =
      (0 until 4).forall(k => u8(i + k) == s.charAt(k))

    // one level of boxes within [from, to); returns (type-match offset,
    // payload start, payload end) for the first box named `name`
    def findBox(from: Long, to: Long, name: String): Option[(Long, Long)] = {
      var i = from
      while (i + 8 <= to) {
        val sz32 = be32(i)
        val (header, size) =
          if (sz32 == 1) { if (i + 16 > to) return None; (16L, be64(i + 8)) }
          else (8L, sz32)
        if (size < header || i + size > to) return None
        if (tag(i + 4, name)) return Some((i + header, i + size))
        i += size
      }
      None
    }

    if (!tag(4, "ftyp")) return None
    val end = p.length.toLong
    val (moovAt, moovEnd) = findBox(0, end, "moov").getOrElse(return None)
    val (mvhdAt, _) = findBox(moovAt, moovEnd, "mvhd").getOrElse(return None)
    val v = u8(mvhdAt)
    val (timescale, duration) =
      if (v == 1) (be32(mvhdAt + 20), be64(mvhdAt + 24))
      else (be32(mvhdAt + 12), be32(mvhdAt + 16))
    if (timescale <= 0) return None
    // a crafted version-1 mvhd can carry a duration whose *1000 wraps
    // Long: bounds-check, don't wrap (same stance as the box-size checks)
    if (duration < 0 || duration > Long.MaxValue / 1000L) return None
    // scan all traks for the largest presentation extent
    var w = 0
    var h = 0
    var at = moovAt
    var guard = 0
    while (guard < 64) {
      findBox(at, moovEnd, "trak") match {
        case Some((trakAt, trakEnd)) =>
          findBox(trakAt, trakEnd, "tkhd").foreach { case (tkhdAt, _) =>
            val tv = u8(tkhdAt)
            val wOff = if (tv == 1) 88L else 76L
            val tw = be32(tkhdAt + wOff) >> 16 // 16.16 fixed
            val th = be32(tkhdAt + wOff + 4) >> 16
            if (tw.toInt > w) { w = tw.toInt; h = th.toInt }
          }
          at = trakEnd
        case None => guard = 64
      }
      guard += 1
    }
    Some(("mp4", w, h, duration * 1000L / timescale))
  }

  /** REAL (dependency-free) header decode: container format and pixel
    * dimensions read straight from the payload's header bytes — PNG IHDR,
    * JPEG SOFn, GIF logical screen descriptor, BMP info header. This is
    * the part of image decoding that needs no codec library, and it is
    * what a 100 TB ingest runs first anyway: validate payloads, reject
    * mislabeled formats, and populate metadata without decompressing a
    * single pixel. Returns (format, width, height); None when no known
    * signature matches or the header is truncated/corrupt. */
  def sniffImageHeader(p: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long = (u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (p == null) return None
    // PNG: 8-byte signature, then the IHDR chunk (len + "IHDR" + w + h)
    if (p.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
        u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a &&
        u8(7) == 0x0a) {
      if (p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
        return Some(("png", be32(16).toInt, be32(20).toInt))
      return None
    }
    // JPEG: FF D8, then marker segments until a frame header (SOFn)
    if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < p.length) {
        if (u8(i) != 0xff) return None // desynced marker stream
        // spec-legal 0xFF fill bytes may pad before any marker
        if (u8(i + 1) == 0xff) { i += 1 }
        else {
        val m = u8(i + 1)
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          i += 2 // standalone markers carry no length
        } else if ((m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 &&
            m != 0xcc) {
          // SOFn: len(2) precision(1) height(2) width(2)
          if (i + 8 < p.length)
            return Some(("jpeg", be16(i + 7), be16(i + 5)))
          return None
        } else {
          val len = be16(i + 2)
          if (len < 2) return None
          i += 2 + len
        }
        }
      }
      return None
    }
    // GIF87a / GIF89a: 6-byte signature then LE logical screen w/h
    if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a')
      return Some(("gif", le16(6), le16(8)))
    // BMP: "BM" then BITMAPINFOHEADER at offset 14 (LE w at 18, h at 22)
    if (p.length >= 26 && p(0) == 'B' && p(1) == 'M')
      return Some(("bmp", le32(18).toInt, math.abs(le32(22).toInt)))
    // TIFF: "II"+42 LE or "MM"+42 BE; dims need the IFD walk (header-only)
    if (p.length >= 8 && ((p(0) == 'I' && p(1) == 'I') ||
        (p(0) == 'M' && p(1) == 'M')))
      return TiffCodec.sniffDims(p).map { case (w, h) => ("tiff", w, h) }
    None
  }

  private val sniffUdf = udf((bytes: Array[Byte]) =>
    Option(bytes).flatMap(sniffImageHeader))

  /** Header-validate a media frame: every row gains `sniffed_format` /
    * `sniffed_width` / `sniffed_height` (null when unreadable) and
    * `header_ok` — signature readable AND consistent with the declared
    * metadata format. ONE shuffle-free projection (the sniff is genuine
    * per-row byte logic — the legitimate UDF case); nothing decompresses. */
  def withSniffedHeaders(media: DataFrame): DataFrame =
    media.withColumn("__sniff", sniffUdf(col("payload")))
      .withColumn("sniffed_format", col("__sniff._1"))
      .withColumn("sniffed_width", col("__sniff._2"))
      .withColumn("sniffed_height", col("__sniff._3"))
      .withColumn("header_ok",
        coalesce(col("__sniff._1") === col("meta.format"), lit(false)))
      .drop("__sniff")

  /** Resize plumbing: records the target size in metadata and delegates the
    * pixel work to the (stubbed) codec — payload passes through unchanged
    * here, a real decoder would re-encode. */
  def withResizeTarget(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(col("meta.media_type"), col("meta.format"),
        lit(w).as("width"), lit(h).as("height"), col("meta.duration_ms")))

  /** Frame sampling for video rows: one output row per sampled frame index,
    * evenly spaced across the declared duration. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.where(col("meta.media_type") === "video" && col("meta.duration_ms").isNotNull)
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))))
      .select(col("media_id"), col("frame_ts_ms"), col("payload"), col("meta"))

  /** Integer-exact features from the lossless-JPEG (SOF3) decode path:
    * the full-precision sample sum plus stream parameters. Lossless means
    * the sum equals the encoded formula EXACTLY — the m09 gate's oracle
    * recomputes it in SQL. */
  final case class LosslessFeatures(media_id: Long, width: Int, height: Int,
                                    components: Int, precision: Int,
                                    sum_samples: Long)

  def decodeLosslessFeatures(spark: SparkSession, media: DataFrame): Dataset[LosslessFeatures] = {
    import spark.implicits._
    media
      .where(col("payload").isNotNull)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        LosslessJpeg.decode(bytes).map { img =>
          var sum = 0L
          var k = 0
          while (k < img.samples.length) { sum += img.samples(k); k += 1 }
          LosslessFeatures(id, img.width, img.height, img.components,
            img.precision, sum)
        }
      })
  }

  /** Decoded 12-bit extended-sequential JPEG features (the high-bit-depth
    * DCT path): raw component-sample sum, analytic for DC-only fixtures. */
  final case class Jpeg12Features(media_id: Long, width: Int, height: Int,
                                  components: Int, sum_samples: Long)

  def decodeJpeg12Features(spark: SparkSession, media: DataFrame): Dataset[Jpeg12Features] = {
    import spark.implicits._
    media
      .where(col("payload").isNotNull)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Jpeg12.decode(bytes).map { img =>
          var sum = 0L
          var k = 0
          while (k < img.samples.length) { sum += img.samples(k); k += 1 }
          Jpeg12Features(id, img.width, img.height, img.components, sum)
        }
      })
  }

  /** One media sample's layout facts, relational shape (`is_sync` as 0/1
    * for oracle-friendly typing). */
  final case class VideoSample(media_id: Long, track_id: Int, sample_idx: Int,
                               dts_ms: Long, size_bytes: Long,
                               file_offset: Long, is_sync: Int)

  /** Sample-ACCURATE frame enumeration for MP4 rows, the upgrade over the
    * evenly-spaced [[sampleFrames]]: walk each payload's ISO-BMFF sample
    * tables ([[Mp4Tables.sampleTable]]) and explode to one row per media
    * sample with its decode timestamp, byte size, absolute file offset and
    * keyframe flag. A frame-sampling pipeline filters `is_sync = 1`,
    * windows on `dts_ms`, and issues ranged reads at `file_offset` —
    * without ever touching codec data. Malformed containers are skipped
    * (None → no rows), never a throw. */
  def explodeVideoSamples(spark: SparkSession, media: DataFrame): Dataset[VideoSample] = {
    import spark.implicits._
    media
      .where(col("payload").isNotNull)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Mp4Tables.sampleTable(bytes).toSeq.flatten.map { s =>
          VideoSample(id, s.trackId, s.sampleIdx, s.dtsMs, s.sizeBytes,
            s.fileOffset, if (s.isSync) 1 else 0)
        }
      })
  }

  /** One DECODED video frame: pixels, not just layout. `sum_gray` is the
    * channel-0 sample sum (analytic for DC-only JPEG frames, which is
    * what the m11 oracle states). */
  final case class VideoFrame(media_id: Long, track_id: Int, sample_idx: Int,
                              dts_ms: Long, width: Int, height: Int,
                              sum_gray: Long)

  /** REAL video sample decode for motion-JPEG tracks: walk the container's
    * sample tables ([[Mp4Tables.sampleTable]]), slice each photo-JPEG
    * sample's bytes out of the payload at its (offset, size), and decode
    * the frame through the full [[JpegCodec]] path — one row per decoded
    * frame with its decode timestamp and pixel features. This is the
    * video analogue of [[decodeRasterFeatures]]: MJPEG is the one video
    * codec whose samples are self-contained stills, so the frame step
    * composes the codecs this package already proves out; inter-frame
    * codecs (avc1/hev1…) remain honestly undecoded (their samples are
    * skipped, never faked). Samples whose byte range falls outside the
    * payload, or whose bytes fail JPEG decode, are skipped — ranged
    * corruption must not sink the partition. */
  def decodeVideoFrames(spark: SparkSession, media: DataFrame): Dataset[VideoFrame] = {
    import spark.implicits._
    media
      .where(col("payload").isNotNull)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Mp4Tables.sampleTable(bytes).toSeq.flatten.iterator
          .filter(s => s.codec == "jpeg" || s.codec == "mjpa")
          .flatMap { s =>
            val off = s.fileOffset
            val sz = s.sizeBytes
            if (off < 0 || sz <= 0 || sz > Int.MaxValue ||
                off + sz > bytes.length) None
            else {
              val frame = java.util.Arrays.copyOfRange(
                bytes, off.toInt, (off + sz).toInt)
              RasterCodec.decode(frame).map { r =>
                var sum = 0L
                var i = 0
                val n = r.width * r.height
                while (i < n) { sum += (r.data(i * r.channels) & 0xff); i += 1 }
                VideoFrame(id, s.trackId, s.sampleIdx, s.dtsMs,
                  r.width, r.height, sum)
              }
            }
          }
      })
  }
}
