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

  /** Header facts recoverable from the chunk walk alone — everything a
    * metadata-validation pass needs, with NO sample materialization. */
  final case class WavHeader(channels: Int, sampleRate: Int, bitsPerSample: Int,
                             dataOffset: Int, dataBytes: Int) {
    def frames: Long = dataBytes.toLong / ((bitsPerSample / 8) * channels)
    def durationMs: Long =
      if (sampleRate == 0) 0L else frames * 1000L / sampleRate
  }

  /** Walk the RIFF chunks of a WAVE payload holding linear PCM
    * (audioFormat 1, 8 or 16 bits per sample). fmt must precede data,
    * unknown chunks (LIST, fact, ...) are skipped per spec (word-aligned).
    * All offset arithmetic is in Long: a corrupt chunk size near 2^31 must
    * fail the bounds check, not wrap it (one crafted payload in a
    * distributed decode would otherwise kill the job with an
    * ArrayIndexOutOfBoundsException instead of the documented None).
    * None for anything malformed, truncated, or non-PCM; O(#chunks) time,
    * O(1) allocation. */
  def sniffWav(p: Array[Byte]): Option[WavHeader] = {
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
    var i = 12L
    while (i + 8 <= p.length) {
      val at = i.toInt
      val size = le32(at + 4)
      if (size < 0 || i + 8L + size > p.length) return None
      if (tag(at, "fmt ")) {
        if (size < 16) return None
        val audioFormat = le16(at + 8)
        if (audioFormat != 1) return None // PCM only
        channels = le16(at + 10)
        sampleRate = le32(at + 12)
        bits = le16(at + 22)
        if (channels <= 0 || sampleRate <= 0 ||
          (bits != 8 && bits != 16)) return None
        haveFmt = true
      } else if (tag(at, "data")) {
        if (!haveFmt) return None
        if (size % ((bits / 8) * channels) != 0) return None
        return Some(WavHeader(channels, sampleRate, bits, at + 8, size))
      }
      i += 8L + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** Decode a RIFF/WAVE payload: [[sniffWav]]'s chunk walk, then one pass
    * materializing the interleaved samples (sign-extended 16-bit, or
    * unsigned 8-bit per spec). */
  def decodeWav(p: Array[Byte]): Option[Pcm] =
    sniffWav(p).map { h =>
      def u8(i: Int) = p(i) & 0xff
      val n = h.dataBytes / (h.bitsPerSample / 8)
      val samples = new Array[Int](n)
      val base = h.dataOffset
      var k = 0
      if (h.bitsPerSample == 16) {
        while (k < n) {
          val v = u8(base + k * 2) | (u8(base + k * 2 + 1) << 8)
          samples(k) = (v << 16) >> 16 // sign-extend
          k += 1
        }
      } else {
        while (k < n) { samples(k) = u8(base + k); k += 1 } // 8-bit: unsigned
      }
      Pcm(h.channels, h.sampleRate, h.bitsPerSample, samples)
    }
}
