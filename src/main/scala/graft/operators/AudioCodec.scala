package graft.operators

/** Dependency-free WAV (RIFF/WAVE) codec for linear PCM — the one audio
  * container decodable without a media library: the header is plain
  * little-endian fields and the payload is raw interleaved samples.
  * Compressed audio (MP3/AAC/Opus) stays honestly stubbed behind
  * [[Multimodal.stubDecode]] — entropy coders need a real codec.
  *
  * Same role on the audio side that [[RasterCodec]] plays for images:
  * the payload→samples step of a multimodal ingest runs distributed, one
  * partition at a time, with integer-exact outputs an oracle can verify
  * analytically (see the m02 gate).
  */
object AudioCodec {

  /** Decoded linear PCM: interleaved samples widened to Int (sign-correct
    * for 16-bit; 8-bit WAV is unsigned by spec, stored 0..255). */
  final case class Pcm(channels: Int, sampleRate: Int, bitsPerSample: Int,
                       samples: Array[Int]) {
    /** Frames = samples per channel. */
    def frames: Int = if (channels == 0) 0 else samples.length / channels
    def durationMs: Long =
      if (sampleRate == 0) 0L else frames.toLong * 1000L / sampleRate
  }

  /** Encode 16-bit PCM into a canonical RIFF/WAVE file: fmt chunk then
    * data chunk. `samples` are interleaved frames. */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
                     samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      "samples must hold whole interleaved frames")
    val dataBytes = samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    def ascii(i: Int, s: String): Unit = {
      var k = 0
      while (k < s.length) { out(i + k) = s.charAt(k).toByte; k += 1 }
    }
    def le16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    def le32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    ascii(0, "RIFF"); le32(4, 36 + dataBytes); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16)
    le16(20, 1) // audioFormat = 1 (linear PCM)
    le16(22, channels); le32(24, sampleRate)
    le32(28, sampleRate * channels * 2) // byte rate
    le16(32, channels * 2) // block align
    le16(34, 16) // bits per sample
    ascii(36, "data"); le32(40, dataBytes)
    var i = 0
    while (i < samples.length) {
      le16(44 + i * 2, samples(i).toInt)
      i += 1
    }
    out
  }

  /** Decode a RIFF/WAVE payload holding linear PCM (audioFormat 1,
    * 8 or 16 bits per sample). Chunks are walked in order — fmt must
    * precede data, unknown chunks (LIST, fact, ...) are skipped per spec
    * (word-aligned). None for anything malformed, truncated, or
    * non-PCM. */
  def decodeWav(p: Array[Byte]): Option[Pcm] = {
    if (p == null || p.length < 44) return None
    def u8(i: Int) = p(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3) << 24)
    def tag(i: Int, s: String): Boolean =
      p(i) == s.charAt(0).toByte && p(i + 1) == s.charAt(1).toByte &&
        p(i + 2) == s.charAt(2).toByte && p(i + 3) == s.charAt(3).toByte
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var haveFmt = false
    var i = 12
    while (i + 8 <= p.length) {
      val size = le32(i + 4)
      if (size < 0 || i + 8 + size > p.length) return None
      if (tag(i, "fmt ")) {
        if (size < 16) return None
        val audioFormat = le16(i + 8)
        if (audioFormat != 1) return None // PCM only
        channels = le16(i + 10)
        sampleRate = le32(i + 12)
        bits = le16(i + 22)
        if (channels <= 0 || sampleRate <= 0 ||
          (bits != 8 && bits != 16)) return None
        haveFmt = true
      } else if (tag(i, "data")) {
        if (!haveFmt) return None
        val bytesPerSample = bits / 8
        if (size % (bytesPerSample * channels) != 0) return None
        val n = size / bytesPerSample
        val samples = new Array[Int](n)
        val base = i + 8
        var k = 0
        if (bits == 16) {
          while (k < n) {
            samples(k) = (le16(base + k * 2) << 16) >> 16 // sign-extend
            k += 1
          }
        } else {
          while (k < n) { samples(k) = u8(base + k); k += 1 } // 8-bit: unsigned
        }
        return Some(Pcm(channels, sampleRate, bits, samples))
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }
}
