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

  // ---- G.711 μ-law / A-law (format 7 / 6) ----

  test("mulawToLinear matches the classic G.711 anchor points") {
    assert(AudioCodec.mulawToLinear(0xff.toByte) == 0) // +0
    assert(AudioCodec.mulawToLinear(0x7f.toByte) == 0) // -0
    assert(AudioCodec.mulawToLinear(0x80.toByte) == 32124) // +max
    assert(AudioCodec.mulawToLinear(0x00.toByte) == -32124) // -max
    assert(AudioCodec.mulawToLinear(0xfe.toByte) == 8) // smallest +step
    assert(AudioCodec.mulawToLinear(0x7e.toByte) == -8)
  }

  test("alawToLinear matches the classic G.711 anchor points") {
    assert(AudioCodec.alawToLinear(0xd5.toByte) == 8) // +min (a=0x80)
    assert(AudioCodec.alawToLinear(0x55.toByte) == -8) // -min (a=0x00)
    assert(AudioCodec.alawToLinear(0xaa.toByte) == 32256) // +max (a=0xff)
    assert(AudioCodec.alawToLinear(0x2a.toByte) == -32256) // -max
  }

  test("G.711 expansion matches the JDK's own ULAW/ALAW converter byte-for-byte") {
    // Independent cross-check: javax.sound.sampled ships its own G.711
    // tables. Feed every possible companded byte through BOTH decoders.
    import javax.sound.sampled._
    for (mulaw <- Seq(true, false)) {
      val enc = if (mulaw) AudioFormat.Encoding.ULAW else AudioFormat.Encoding.ALAW
      val bytes = Array.tabulate(256)(i => i.toByte)
      val src = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes),
        new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false),
        bytes.length.toLong)
      val pcmFmt = new AudioFormat(8000f, 16, 1, true, false) // LE signed 16
      val conv = AudioSystem.getAudioInputStream(pcmFmt, src)
      val out = conv.readAllBytes()
      assert(out.length == 512)
      val jdk = Array.tabulate(256) { i =>
        ((out(2 * i) & 0xff) | (out(2 * i + 1) << 8)).toShort.toInt
      }
      val ours = bytes.map(b =>
        if (mulaw) AudioCodec.mulawToLinear(b) else AudioCodec.alawToLinear(b))
      assert(ours.toSeq == jdk.toSeq,
        s"${if (mulaw) "ULAW" else "ALAW"} table mismatch vs JDK")
    }
  }

  test("G.711 compress/expand round-trip is idempotent on code points") {
    // expand(compress(expand(b))) == expand(b) for every byte — the
    // standard G.711 consistency property (compression is lossy, but code
    // points are fixed points).
    for (i <- 0 until 256) {
      val b = i.toByte
      val mu = AudioCodec.mulawToLinear(b)
      assert(AudioCodec.mulawToLinear(AudioCodec.linearToMulaw(mu)) == mu,
        s"mulaw byte $i")
      val al = AudioCodec.alawToLinear(b)
      assert(AudioCodec.alawToLinear(AudioCodec.linearToAlaw(al)) == al,
        s"alaw byte $i")
    }
  }

  test("G.711 WAV end-to-end: container walk + expansion, mono and stereo") {
    for ((mulaw, ch) <- Seq((true, 1), (true, 2), (false, 1), (false, 2))) {
      val data = Array.tabulate(300 * ch)(i => ((i * 29 + 5) % 256).toByte)
      val bytes = AudioCodec.encodeWavG711(8000, ch, mulaw, data)
      val h = AudioCodec.sniffWav(bytes).get
      assert(h.audioFormat == (if (mulaw) 7 else 6))
      assert(h.channels == ch && h.frames == 300L)
      assert(h.durationMs == 300L * 1000 / 8000)
      val pcm = AudioCodec.decodeWav(bytes).get
      assert(pcm.bitsPerSample == 16 && pcm.frames == 300)
      val expect = data.map(b =>
        if (mulaw) AudioCodec.mulawToLinear(b) else AudioCodec.alawToLinear(b))
      assert(pcm.samples.toSeq == expect.toSeq)
    }
  }

  // ---- IMA ADPCM (format 0x11) ----

  test("IMA ADPCM hand-computed vector decodes exactly") {
    // Block: predictor 0, step index 0 (step 7); nibbles 7, 15, 0, 8, ...
    // hand-walked per the IMA algorithm:
    //   n=7: diff = 0+7+3+1 = 11 -> pred 11, index 0+8 = 8 (step 16)
    //   n=15: diff = 2+16+8+4 = 30, sign -> pred -19, index 8+8 = 16 (step 34)
    //   n=0: diff = 34>>3 = 4 -> pred -15, index 16-1 = 15 (step 31)
    //   n=8: diff = 31>>3 = 3, sign -> pred -18, index 15-1 = 14
    val nibbles = Array(7, 15, 0, 8) ++ Array.fill(4)(0)
    val block = new Array[Byte](4 + 4)
    block(0) = 0; block(1) = 0; block(2) = 0; block(3) = 0
    for (k <- 0 until 8 by 2)
      block(4 + k / 2) = (nibbles(k) | (nibbles(k + 1) << 4)).toByte
    val bytes = AudioCodec.encodeWavImaAdpcm(8000, 1, 8, Seq(block))
    val pcm = AudioCodec.decodeWav(bytes).get
    assert(pcm.frames == 9) // 1 header sample + 8 nibbles
    assert(pcm.samples.take(5).toSeq == Seq(0, 11, -19, -15, -18))
  }

  test("IMA ADPCM round-trip tracks a smooth signal closely") {
    for (ch <- Seq(1, 2)) {
      val blockAlign = 4 * ch + 4 * ch * 8 // 8 nibble-groups per channel
      val spb = (blockAlign - 4 * ch) * 2 / ch + 1
      val frames = spb * 3
      val samples = new Array[Short](frames * ch)
      for (k <- 0 until frames; c <- 0 until ch)
        samples(k * ch + c) =
          (2000 * math.sin(k / 20.0 + c) + 500 * math.sin(k / 3.0)).toShort
      val bytes = AudioCodec.encodeImaAdpcmFromPcm(8000, ch, blockAlign, samples)
      val pcm = AudioCodec.decodeWav(bytes).get
      assert(pcm.channels == ch && pcm.frames == frames)
      // Block-leading samples are stored verbatim in the header.
      for (b <- 0 until 3; c <- 0 until ch)
        assert(pcm.samples(b * spb * ch + c) == samples(b * spb * ch + c).toInt)
      val errs = pcm.samples.zip(samples).map { case (a, e) => math.abs(a - e) }
      val mean = errs.map(_.toLong).sum.toDouble / errs.length
      assert(mean < 60.0, s"mean abs error $mean (x$ch)")
      assert(errs.max < 2000, s"max abs error ${errs.max} (x$ch)")
    }
  }

  test("IMA ADPCM malformed containers are rejected, corrupt index too") {
    val block = new Array[Byte](8)
    val good = AudioCodec.encodeWavImaAdpcm(8000, 1, 8, Seq(block))
    // samplesPerBlock inconsistent with blockAlign
    val badSpb = good.clone(); badSpb(38) = 99
    assert(AudioCodec.sniffWav(badSpb).isEmpty)
    // data not a whole number of blocks
    val badData = good.clone(); badData(44) = 7
    assert(AudioCodec.sniffWav(badData).isEmpty)
    // step index out of range: header walk fine, decode cleanly None
    val badIdx = good.clone(); badIdx(48 + 2) = 90.toByte
    assert(AudioCodec.sniffWav(badIdx).isDefined)
    assert(AudioCodec.decodeWav(badIdx).isEmpty)
    // unknown compressed format tag (MS ADPCM = 2)
    val badFmt = good.clone(); badFmt(20) = 2
    assert(AudioCodec.sniffWav(badFmt).isEmpty)
  }
}
