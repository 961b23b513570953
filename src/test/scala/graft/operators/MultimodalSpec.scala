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

  test("sniffMp3Header parses the first frame after an ID3v2 tag") {
    // MPEG1 Layer III, 128 kbps (idx 9), 44100 Hz (idx 0), joint stereo
    val frame = Array(0xff, 0xfb, 0x90, 0x40).map(_.toByte)
    val body = frame ++ new Array[Byte](16000 - 4) // 16 kB at 128 kbps = 1000 ms
    assert(Multimodal.sniffMp3Header(body) == Some(("mp3", 2, 44100, 1000L)))
    // same frame behind a 100-byte ID3v2 tag
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 100) ++
      new Array[Byte](100)
    assert(Multimodal.sniffMp3Header(id3 ++ body) ==
      Some(("mp3", 2, 44100, 1000L)))
    // mono bit, MPEG2 rates
    val mono = Array(0xff, 0xf3, 0x90, 0xc0).map(_.toByte) ++ new Array[Byte](60)
    assert(Multimodal.sniffMp3Header(mono).map(t => (t._1, t._2, t._3)) ==
      Some(("mp3", 1, 22050)))
    assert(Multimodal.sniffMp3Header(Array[Byte](0, 1, 2, 3)).isEmpty)
    assert(Multimodal.sniffMp3Header(frame.take(3)).isEmpty)
    // and the audio sniff dispatches: wav stays wav, mp3 reaches mp3
    assert(Multimodal.sniffAudioHeader(body).exists(_._1 == "mp3"))
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
}
