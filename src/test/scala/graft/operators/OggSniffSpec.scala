package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class OggSniffSpec extends AnyFunSuite {
  import OggSniff._

  test("Ogg CRC-32 matches a bitwise long-division reference") {
    def ref(bytes: Array[Byte]): Int = {
      var c = 0
      for (b <- bytes; i <- 7 to 0 by -1) {
        val bit = ((c >>> 31) & 1) ^ ((b >> i) & 1)
        c = (c << 1) ^ (if (bit == 1) 0x04c11db7 else 0)
      }
      c
    }
    val rnd = new scala.util.Random(11)
    for (len <- Seq(0, 1, 27, 300)) {
      val b = Array.fill(len)(rnd.nextInt(256).toByte)
      assert(oggCrc(b, 0, len) == ref(b))
    }
  }

  test("Opus: channels/rate from OpusHead, duration from terminal granule") {
    val p = encodeOggOpus(channels = 2, preskip = 312, inputRate = 48000,
      finalGranule = 960 * 75)
    val a = sniffOgg(p).get
    assert(a == OggAudio("opus", 2, 48000, (960L * 75 - 312) * 1000 / 48000))
  }

  test("Vorbis: identification header + granule/rate duration") {
    val p = encodeOggVorbis(channels = 1, rate = 44100,
      finalGranule = 44100L * 3)
    val a = sniffOgg(p).get
    assert(a == OggAudio("vorbis", 1, 44100, 3000L))
  }

  test("multi-page streams use the LAST granule; page count varies") {
    for (n <- 1 to 5) {
      val p = encodeOggOpus(1, 0, 48000, 48000L * n, dataPages = n)
      assert(sniffOgg(p).get.durationMs == 1000L * n, s"pages=$n")
    }
  }

  test("packets longer than 255 bytes lace across segments") {
    // a 600-byte tags packet forces lacing 255,255,90
    val serial = 42L
    val head = java.nio.ByteBuffer.allocate(19)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    head.put("OpusHead".getBytes).put(1.toByte).put(1.toByte)
      .putShort(0.toShort).putInt(48000).putShort(0.toShort).put(0.toByte)
    val big = Array.tabulate(600)(i => (i * 3).toByte)
    val p = page(serial, 0, 0, 0x02, head.array()) ++
      page(serial, 1, 0, 0x00, big) ++
      page(serial, 2, 96000, 0x04, Array[Byte](1, 2, 3))
    assert(sniffOgg(p).get.durationMs == 2000L)
  }

  test("CRC and structure violations reject cleanly; fuzz never throws") {
    val good = encodeOggOpus(2, 100, 48000, 48000)
    assert(sniffOgg(good).isDefined)
    // flip a payload byte in the first page: CRC must catch it
    val bad1 = good.clone(); bad1(30) = (bad1(30) ^ 1).toByte
    assert(sniffOgg(bad1).isEmpty)
    // wrong capture pattern
    val bad2 = good.clone(); bad2(0) = 'X'
    assert(sniffOgg(bad2).isEmpty)
    assert(sniffOgg(null).isEmpty)
    assert(sniffOgg("OggS but junk".getBytes).isEmpty)
    // a non-Opus/Vorbis BOS packet is not mapped
    val alien = page(7L, 0, 0, 0x02, "TheoraMaybe".getBytes)
    assert(sniffOgg(alien).isEmpty)
    for (len <- 0 until good.length) sniffOgg(good.take(len))
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 300) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      sniffOgg(b)
    }
  }

  test("sniffAudioHeader dispatches wav, flac, ogg and mp3") {
    val wav = AudioCodec.encodeWavPcm16(8000, 1,
      Array.tabulate(80)(i => (i * 100).toShort))
    assert(Multimodal.sniffAudioHeader(wav).get._1 == "wav")
    val flac = FlacCodec.encode(16000, 16, 1,
      Array.tabulate(192)(i => (i % 100) - 50))
    assert(Multimodal.sniffAudioHeader(flac).get ==
      (("flac", 1, 16000, 192 * 1000L / 16000)))
    val ogg = encodeOggOpus(1, 0, 48000, 48000)
    assert(Multimodal.sniffAudioHeader(ogg).get ==
      (("opus", 1, 48000, 1000L)))
  }
}
