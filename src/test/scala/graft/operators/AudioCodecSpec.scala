package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class AudioCodecSpec extends AnyFunSuite {

  private def wave(frames: Int, channels: Int): Array[Short] = {
    val s = new Array[Short](frames * channels)
    for (k <- 0 until frames; c <- 0 until channels)
      s(k * channels + c) = ((k * 37 + c * 1009) % 65536 - 32768).toShort
    s
  }

  test("16-bit PCM round-trip, mono and stereo, incl. negative samples") {
    for ((frames, ch) <- Seq((100, 1), (441, 2), (1, 2), (7, 3))) {
      val samples = wave(frames, ch)
      val bytes = AudioCodec.encodeWavPcm16(44100, ch, samples)
      val pcm = AudioCodec.decodeWav(bytes)
      assert(pcm.isDefined, s"$frames frames x$ch")
      assert(pcm.get.channels == ch && pcm.get.sampleRate == 44100 &&
        pcm.get.bitsPerSample == 16)
      assert(pcm.get.frames == frames)
      assert(pcm.get.samples.toSeq == samples.map(_.toInt).toSeq)
    }
  }

  test("sniffWav reads the header without touching sample data") {
    val bytes = AudioCodec.encodeWavPcm16(8000, 2, wave(200, 2))
    val h = AudioCodec.sniffWav(bytes)
    assert(h.isDefined)
    assert(h.get.channels == 2 && h.get.sampleRate == 8000 &&
      h.get.bitsPerSample == 16)
    assert(h.get.frames == 200L)
    assert(h.get.durationMs == 200L * 1000 / 8000)
    // header facts must agree with the full decode
    val pcm = AudioCodec.decodeWav(bytes).get
    assert(pcm.frames.toLong == h.get.frames &&
      pcm.durationMs == h.get.durationMs)
  }

  test("8-bit unsigned path decodes 0..255 (hand-built payload)") {
    // encodeWavPcm16 only writes 16-bit; build an 8-bit file by patching
    // a canonical header: mono, 8 bits, 4 samples 0, 1, 128, 255.
    val data = Array[Byte](0, 1, -128, -1)
    val out = new Array[Byte](44 + data.length)
    def ascii(i: Int, s: String): Unit =
      for (k <- 0 until s.length) out(i + k) = s.charAt(k).toByte
    def le16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    def le32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    ascii(0, "RIFF"); le32(4, 36 + data.length); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, 8000); le32(28, 8000); le16(32, 1); le16(34, 8)
    ascii(36, "data"); le32(40, data.length)
    System.arraycopy(data, 0, out, 44, data.length)
    val pcm = AudioCodec.decodeWav(out)
    assert(pcm.isDefined)
    assert(pcm.get.bitsPerSample == 8)
    assert(pcm.get.samples.toSeq == Seq(0, 1, 128, 255)) // unsigned per spec
  }

  test("unknown chunks before data are skipped, odd sizes word-aligned") {
    val base = AudioCodec.encodeWavPcm16(8000, 1, wave(10, 1))
    // splice a 3-byte junk chunk (odd size -> 1 pad byte) between fmt and data
    val junk = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 9, 9, 9, 0)
    val out = new Array[Byte](base.length + junk.length)
    System.arraycopy(base, 0, out, 0, 36) // RIFF..fmt chunk end
    System.arraycopy(junk, 0, out, 36, junk.length)
    System.arraycopy(base, 36, out, 36 + junk.length, base.length - 36)
    // patch the RIFF size field
    val riffSize = out.length - 8
    out(4) = riffSize.toByte; out(5) = (riffSize >> 8).toByte
    out(6) = (riffSize >> 16).toByte; out(7) = (riffSize >> 24).toByte
    val pcm = AudioCodec.decodeWav(out)
    assert(pcm.isDefined)
    assert(pcm.get.frames == 10)
    assert(pcm.get.samples.toSeq ==
      AudioCodec.decodeWav(base).get.samples.toSeq)
  }

  test("malformed payloads return None, never throw") {
    val good = AudioCodec.encodeWavPcm16(8000, 2, wave(50, 2))
    val cases = Seq[Array[Byte]](
      null,
      Array.emptyByteArray,
      good.take(43), // shorter than any valid header
      good.take(60), // truncated mid-data
      "RIFFxxxxWAVE".getBytes ++ new Array[Byte](40), // no fmt/data
      { val b = good.clone(); b(20) = 2; b }, // audioFormat != 1 (ADPCM)
      { val b = good.clone(); b(34) = 24; b }, // unsupported bit depth
      { val b = good.clone(); b(22) = 0; b }, // zero channels
      { val b = good.clone(); b(40) = 3; b(41) = 0; b(42) = 0; b(43) = 0; b }, // data not frame-aligned
      { // corrupt chunk size near 2^31: the Long bounds check must catch
        // the wrap, not index out of bounds (round-6 ADVICE finding)
        val b = good.clone()
        b(16) = -1; b(17) = -1; b(18) = -1; b(19) = 0x7f
        b
      },
      { // negative chunk size
        val b = good.clone()
        b(40) = -1; b(41) = -1; b(42) = -1; b(43) = -1
        b
      })
    for ((c, idx) <- cases.zipWithIndex) {
      assert(AudioCodec.decodeWav(c).isEmpty, s"case $idx decoded")
      assert(AudioCodec.sniffWav(c).isEmpty, s"case $idx sniffed")
    }
  }

  test("Multimodal.sniffAudioHeader surfaces header facts") {
    val bytes = AudioCodec.encodeWavPcm16(16000, 2, wave(320, 2))
    assert(Multimodal.sniffAudioHeader(bytes).contains(("wav", 2, 16000, 20L)))
    assert(Multimodal.sniffAudioHeader(bytes.take(50)).isEmpty)
  }
}
