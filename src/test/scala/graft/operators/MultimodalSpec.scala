package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Multimodal plumbing: binary payload + typed metadata; decode is a
  * deterministic stub, the Spark-side contracts are real. */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private def mediaDf = {
    val rows = Seq(
      Row(1L, Array[Byte](0, 1, 2, 3, 120.toByte),
        Row("image", "png", 64, 48, null)),
      Row(2L, null, Row("image", "png", 8, 8, null)),
      Row(3L, Array[Byte](5, 5, 5), Row("video", "mp4", 320, 240, 2500L)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
  }

  test("decodeFeatures: partition-parallel, null payloads dropped, " +
    "deterministic 16-bin features") {
    val out = Multimodal.decodeFeatures(spark, mediaDf).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 3L))
    val f1 = out.head
    assert(f1.n_bytes == 5 && f1.width == 64 && f1.height == 48)
    assert(f1.features.length == 16)
    assert(math.abs(f1.features.sum - 1.0f) < 1e-6) // normalized histogram
    // bytes 0-3 land in bin 0, byte 120 in bin 7
    assert(f1.features(0) == 0.8f && f1.features(7) == 0.2f)
    // deterministic across invocations
    val again = Multimodal.decodeFeatures(spark, mediaDf).collect().sortBy(_.media_id)
    assert(again.head.features.toSeq == f1.features.toSeq)
  }

  test("withResizeTarget rewrites metadata, preserves payload") {
    val resized = Multimodal.withResizeTarget(mediaDf, 32, 32)
    val m = resized.where(col("media_id") === 1)
      .select("meta.width", "meta.height").collect().head
    assert(m == Row(32, 32))
    // same field names/types (literal width/height tighten nullability)
    val dt = resized.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(dt.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.MediaMetadataType.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("sampleFrames explodes video rows into evenly spaced frame stamps") {
    val frames = Multimodal.sampleFrames(mediaDf, everyMs = 1000)
    val stamps = frames.where(col("media_id") === 3)
      .select("frame_ts_ms").collect().map(_.getLong(0)).sorted
    assert(stamps.toSeq == Seq(0L, 1000L, 2000L))
    // image rows produce no frames
    assert(frames.where(col("media_id") === 1).count() == 0)
  }

  // ---- real header decode (no codec library involved) -------------------

  /** A structurally valid minimal PNG header: signature + IHDR with the
    * given dimensions (checksum/pixels irrelevant to the sniffer, as they
    * are to real header readers). */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(26)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h).put(8.toByte).put(6.toByte)
    b.array()
  }

  /** Minimal JPEG: SOI, an APP0 segment to skip, then SOF0 with dims. */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(2 + 4 + 16 + 9)
    b.put(Array(0xff, 0xd8).map(_.toByte)) // SOI
    b.put(Array(0xff, 0xe0).map(_.toByte)).putShort(16.toShort) // APP0 len 16
    b.put(new Array[Byte](14)) // APP0 body (16 - the 2 length bytes)
    b.put(Array(0xff, 0xc0).map(_.toByte)).putShort(11.toShort) // SOF0
    b.put(8.toByte).putShort(h.toShort).putShort(w.toShort) // precision, h, w
    b.array()
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes).putShort(w.toShort).putShort(h.toShort)
    b.array()
  }

  test("sniffImageHeader reads real PNG/JPEG/GIF headers, rejects junk") {
    assert(Multimodal.sniffImageHeader(pngBytes(640, 480)) ==
      Some(("png", 640, 480)))
    assert(Multimodal.sniffImageHeader(jpegBytes(1024, 768)) ==
      Some(("jpeg", 1024, 768)))
    assert(Multimodal.sniffImageHeader(gifBytes(32, 16)) ==
      Some(("gif", 32, 16)))
    assert(Multimodal.sniffImageHeader(Array[Byte](1, 2, 3, 4)).isEmpty)
    // truncated PNG signature only
    assert(Multimodal.sniffImageHeader(pngBytes(8, 8).take(10)).isEmpty)
    // desynced JPEG marker stream
    assert(Multimodal.sniffImageHeader(
      Array(0xff, 0xd8, 0x00, 0x10).map(_.toByte)).isEmpty)
    // spec-legal 0xFF fill bytes before a marker must not desync the walk
    val jb = jpegBytes(40, 30)
    val padded = jb.take(2) ++ Array(0xff.toByte, 0xff.toByte) ++ jb.drop(2)
    assert(Multimodal.sniffImageHeader(padded) == Some(("jpeg", 40, 30)))
  }

  // minimal ISO-BMFF: ftyp + moov(mvhd v0 + trak(tkhd v0)) — the shape
  // every mp4 muxer emits, sizes computed box-by-box
  private def mp4Bytes(w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] = {
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(name.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", "isomiso2".getBytes)
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0) // version 0 + flags
      b.putInt(1) // creation
      b.putInt(2) // modification
      b.putInt(timescale)
      b.putInt(duration)
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(0).putInt(1).putInt(2).putInt(1).putInt(0).putInt(duration)
      b.position(76)
      b.putInt(w << 16).putInt(h << 16) // 16.16 fixed presentation size
      box("tkhd", b.array())
    }
    val audioTkhd = {
      val b = java.nio.ByteBuffer.allocate(84) // 0x0 extent (audio track)
      b.putInt(0).putInt(1).putInt(2).putInt(2)
      box("tkhd", b.array())
    }
    ftyp ++ box("moov", box("trak", audioTkhd) ++ box("trak", tkhd) ++ mvhd)
  }

  test("sniffVideoHeader walks ftyp/moov/mvhd/tkhd for dims + duration") {
    // duration 3000 ticks at timescale 600 = 5000 ms; video track 640x360
    assert(Multimodal.sniffVideoHeader(mp4Bytes(640, 360, 600, 3000)) ==
      Some(("mp4", 640, 360, 5000L)))
    // mvhd v0 with 90kHz timescale
    assert(Multimodal.sniffVideoHeader(mp4Bytes(1920, 1080, 90000, 45000)) ==
      Some(("mp4", 1920, 1080, 500L)))
    // the shared fixture writer (m05 gate) round-trips through the sniff
    assert(Multimodal.sniffVideoHeader(
      Multimodal.encodeMp4Header(320, 240, 600, 1200)) ==
      Some(("mp4", 320, 240, 2000L)))
    assert(Multimodal.sniffVideoHeader(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Multimodal.sniffVideoHeader(
      mp4Bytes(64, 48, 600, 600).take(30)).isEmpty) // truncated moov
  }

  test("sniffMp3Header walks every frame: CBR, VBR, padding, ID3 tags") {
    // CBR: 40 frames at 128 kbps -> exactly 40 x 1152 / 44100 s = 1044 ms
    val cbr = Multimodal.encodeMp3Frames(Seq.fill(40)(9))
    assert(Multimodal.sniffMp3Header(cbr) == Some(("mp3", 2, 44100, 1044L)))
    // VBR: 28 frames cycling every bitrate 32..320 kbps. Duration depends
    // only on the frame COUNT (28 x 1152 / 44100 s = 731 ms) — the old
    // first-frame-bitrate estimate would have said length*8/32kbps instead.
    val vbr = Multimodal.encodeMp3Frames((1 to 14) ++ (1 to 14))
    assert(Multimodal.sniffMp3Header(vbr) == Some(("mp3", 2, 44100, 731L)))
    assert(vbr.length.toLong * 8 / 32 != 731L) // naive estimate is wrong
    // padding bit adds one byte per frame without changing the duration
    val padded = Multimodal.encodeMp3Frames(Seq.fill(40)(9), padding = true)
    assert(padded.length == cbr.length + 40)
    assert(Multimodal.sniffMp3Header(padded) == Some(("mp3", 2, 44100, 1044L)))
    // same VBR stream behind a 100-byte ID3v2 tag
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 100) ++
      new Array[Byte](100)
    assert(Multimodal.sniffMp3Header(id3 ++ vbr) ==
      Some(("mp3", 2, 44100, 731L)))
    // trailing garbage (an ID3v1 tag) stops the walk, counts whole frames
    val id3v1 = "TAG".getBytes ++ new Array[Byte](125)
    assert(Multimodal.sniffMp3Header(cbr ++ id3v1) ==
      Some(("mp3", 2, 44100, 1044L)))
    // mid-frame truncation: partial last frame is not counted, no throw
    assert(Multimodal.sniffMp3Header(cbr.dropRight(100)) ==
      Some(("mp3", 2, 44100, (39L * 1152 * 1000) / 44100)))
    // mono bit, MPEG2 rates; lone truncated header -> zero whole frames
    val mono = Array(0xff, 0xf3, 0x90, 0xc0).map(_.toByte) ++ new Array[Byte](60)
    assert(Multimodal.sniffMp3Header(mono) == Some(("mp3", 1, 22050, 0L)))
    assert(Multimodal.sniffMp3Header(Array[Byte](0, 1, 2, 3)).isEmpty)
    assert(Multimodal.sniffMp3Header(cbr.take(3)).isEmpty)
    // and the audio sniff dispatches: mp3 reaches mp3
    assert(Multimodal.sniffAudioHeader(cbr).exists(_._1 == "mp3"))
  }

  test("sniffMp3Header trusts a Xing/Info or VBRI frame count when present") {
    // First frame 128 kbps stereo: Xing sits at 4 + 32 bytes of side info.
    val base = Multimodal.encodeMp3Frames(Seq(9, 9))
    def putBE(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
      a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
    }
    val xing = base.clone()
    System.arraycopy("Xing".getBytes, 0, xing, 36, 4)
    putBE(xing, 40, 1)    // flags: frames field present
    putBE(xing, 44, 1000) // 1000 frames -> 1000 x 1152 / 44100 s = 26122 ms
    assert(Multimodal.sniffMp3Header(xing) == Some(("mp3", 2, 44100, 26122L)))
    val info = base.clone()
    System.arraycopy("Info".getBytes, 0, info, 36, 4)
    putBE(info, 40, 1); putBE(info, 44, 500)
    assert(Multimodal.sniffMp3Header(info) ==
      Some(("mp3", 2, 44100, (500L * 1152 * 1000) / 44100)))
    // Xing tag present but frames flag unset -> fall back to the walk
    val noFrames = base.clone()
    System.arraycopy("Xing".getBytes, 0, noFrames, 36, 4)
    putBE(noFrames, 40, 6) // bytes+toc flags only
    assert(Multimodal.sniffMp3Header(noFrames) ==
      Some(("mp3", 2, 44100, (2L * 1152 * 1000) / 44100)))
    // VBRI (always 32 bytes past the header): frames at +14
    val vbri = base.clone()
    System.arraycopy("VBRI".getBytes, 0, vbri, 36, 4)
    putBE(vbri, 36 + 14, 250)
    assert(Multimodal.sniffMp3Header(vbri) ==
      Some(("mp3", 2, 44100, (250L * 1152 * 1000) / 44100)))
  }

  test("withSniffedHeaders validates payloads against declared metadata") {
    val rows = Seq(
      Row(1L, pngBytes(64, 48), Row("image", "png", 64, 48, null)),
      Row(2L, jpegBytes(20, 10), Row("image", "png", 20, 10, null)), // mislabeled
      Row(3L, null, Row("image", "png", 8, 8, null)),
      Row(4L, Array[Byte](9, 9, 9), Row("image", "gif", 1, 1, null)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
    val out = Multimodal.withSniffedHeaders(media)
      .select("media_id", "sniffed_format", "sniffed_width", "header_ok")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getBoolean(3))).sortBy(_._1)
    assert(out(0) == ((1L, Some("png"), Some(64), true)))
    assert(out(1) == ((2L, Some("jpeg"), Some(20), false))) // caught mislabel
    assert(out(2) == ((3L, None, None, false)))
    assert(out(3) == ((4L, None, None, false)))
    // shuffle-free: one projection, no exchange, no join
    val p = Multimodal.withSniffedHeaders(media)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"), p.take(500))
  }

  test("decodeVideoFrames: MJPEG samples decode to pixels; non-JPEG " +
       "tracks and corrupt ranges are skipped, never a throw") {
    import spark.implicits._
    // three 16x16 flat DC-only frames at grays 10/20/30 — analytic decode
    val grays = Seq(10, 20, 30)
    val frames = grays.map(g =>
      JpegCodec.encodeJpegGrayBlocks(2, 2, (_, _) => g))
    val good = Mp4Tables.encodeMp4WithSamples(Seq(Mp4Tables.payloadTrack(
      trackId = 1, timescale = 1000, delta = 40, samplesPerChunk = 2,
      fourcc = "jpeg", payloads = frames)))
    // same layout but an avc1 fourcc: samples must be skipped, not decoded
    val avc1 = Mp4Tables.encodeMp4WithSamples(Seq(Mp4Tables.payloadTrack(
      trackId = 1, timescale = 1000, delta = 40, samplesPerChunk = 2,
      fourcc = "avc1", payloads = frames)))
    // corrupt middle frame: zero out its entropy bytes → JPEG decode fails
    val sampleOffs = Mp4Tables.sampleTable(good).get.map(_.fileOffset)
    val corrupt = good.clone()
    for (i <- sampleOffs(1).toInt + 20 until (sampleOffs(1) + frames(1).length).toInt)
      corrupt(i) = 0
    val media = Seq((1L, good), (2L, avc1), (3L, corrupt),
        (4L, "junk".getBytes: Array[Byte]))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeVideoFrames(spark, media).collect()
      .sortBy(f => (f.media_id, f.sample_idx))
    val m1 = out.filter(_.media_id == 1L)
    assert(m1.length == 3)
    for ((f, j) <- m1.zipWithIndex) {
      assert(f.width == 16 && f.height == 16)
      assert(f.dts_ms == j * 40L)
      assert(f.sum_gray == 256L * grays(j), s"frame $j")
    }
    assert(out.count(_.media_id == 2L) == 0) // avc1 skipped
    // corrupt payload: the damaged frame is dropped, neighbors decode
    val m3 = out.filter(_.media_id == 3L)
    assert(m3.map(_.sample_idx).toSeq == Seq(0, 2))
    assert(out.count(_.media_id == 4L) == 0)
  }
}
