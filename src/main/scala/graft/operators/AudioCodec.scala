package graft.operators

/** Dependency-free WAV (RIFF/WAVE) codec: linear PCM plus the three
  * compressed-in-WAV formats whose specs are closed-form enough to decode
  * without a media library — G.711 A-law (format 6) and μ-law (format 7)
  * per the ITU G.711 segmented-companding tables, and IMA/DVI ADPCM
  * (format 0x11) per the IMA Digital Audio Pack step/index algorithm.
  * All three decode to sign-correct 16-bit linear PCM. Entropy-coded
  * audio (MP3/AAC/Opus) stays honestly stubbed behind
  * [[Multimodal.stubDecode]] — those need a real transform codec.
  *
  * Same role on the audio side that [[RasterCodec]] plays for images:
  * the payload→samples step of a multimodal ingest runs distributed, one
  * partition at a time, with integer-exact outputs an oracle can verify
  * analytically (see the m02/m07 gates). The G.711 expansions are also
  * cross-checked against the JDK's own `javax.sound.sampled` ULAW/ALAW
  * converter in `AudioCodecSpec` — an independent decoder, not a
  * round-trip through this file's encoders.
  */
object AudioCodec {

  /** WAVE format tags this codec understands. */
  final val FormatPcm = 1
  final val FormatAlaw = 6
  final val FormatMulaw = 7
  final val FormatImaAdpcm = 0x11

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
    * metadata-validation pass needs, with NO sample materialization.
    * `blockAlign`/`samplesPerBlock` only carry meaning for IMA ADPCM. */
  final case class WavHeader(channels: Int, sampleRate: Int, bitsPerSample: Int,
                             dataOffset: Int, dataBytes: Int,
                             audioFormat: Int = FormatPcm,
                             blockAlign: Int = 0, samplesPerBlock: Int = 0) {
    def frames: Long = audioFormat match {
      case FormatAlaw | FormatMulaw => dataBytes.toLong / channels
      case FormatImaAdpcm =>
        if (blockAlign == 0) 0L
        else (dataBytes.toLong / blockAlign) * samplesPerBlock
      case _ => dataBytes.toLong / ((bitsPerSample / 8) * channels)
    }
    def durationMs: Long =
      if (sampleRate == 0) 0L else frames * 1000L / sampleRate
  }

  /** Walk the RIFF chunks of a WAVE payload holding linear PCM
    * (audioFormat 1, 8 or 16 bits per sample), G.711 A-law/μ-law
    * (formats 6/7, 8 bits), or IMA ADPCM (format 0x11, 4 bits, whole
    * blocks). fmt must precede data, unknown chunks (LIST, fact, ...) are
    * skipped per spec (word-aligned).
    * All offset arithmetic is in Long: a corrupt chunk size near 2^31 must
    * fail the bounds check, not wrap it (one crafted payload in a
    * distributed decode would otherwise kill the job with an
    * ArrayIndexOutOfBoundsException instead of the documented None).
    * None for anything malformed, truncated, or an unknown format;
    * O(#chunks) time, O(1) allocation. */
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
    var fmt = 0
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var blockAlign = 0
    var samplesPerBlock = 0
    var haveFmt = false
    var i = 12L
    while (i + 8 <= p.length) {
      val at = i.toInt
      val size = le32(at + 4)
      if (size < 0 || i + 8L + size > p.length) return None
      if (tag(at, "fmt ")) {
        if (size < 16) return None
        fmt = le16(at + 8)
        channels = le16(at + 10)
        sampleRate = le32(at + 12)
        blockAlign = le16(at + 20)
        bits = le16(at + 22)
        if (channels <= 0 || sampleRate <= 0) return None
        fmt match {
          case FormatPcm =>
            if (bits != 8 && bits != 16) return None
          case FormatAlaw | FormatMulaw =>
            if (bits != 8) return None
          case FormatImaAdpcm =>
            // IMA constraints: 4-bit nibbles, a 4-byte per-channel block
            // header, and data laid out in 4-byte-per-channel groups —
            // so samplesPerBlock is pinned by blockAlign (Microsoft
            // WAVE_FORMAT_IMA_ADPCM spec). The fmt chunk must carry the
            // cbSize=2 extension holding wSamplesPerBlock; anything
            // inconsistent is malformed, not "best effort".
            if (bits != 4 || size < 20) return None
            samplesPerBlock = le16(at + 26)
            if (blockAlign <= 4 * channels ||
              (blockAlign - 4 * channels) % (4 * channels) != 0) return None
            val expect = (blockAlign - 4 * channels) * 2 / channels + 1
            if (samplesPerBlock != expect) return None
          case _ => return None // unknown format tag
        }
        haveFmt = true
      } else if (tag(at, "data")) {
        if (!haveFmt) return None
        val ok = fmt match {
          case FormatPcm => size % ((bits / 8) * channels) == 0
          case FormatAlaw | FormatMulaw => size % channels == 0
          case _ => size % blockAlign == 0 // IMA: whole blocks only
        }
        if (!ok) return None
        return Some(WavHeader(channels, sampleRate, bits, at + 8, size,
          fmt, blockAlign, samplesPerBlock))
      }
      i += 8L + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** G.711 μ-law byte → 16-bit linear sample. Closed form of the
    * segmented-companding table (ITU G.711 Table 2a): complement, split
    * sign/exponent/mantissa, rebuild `((m<<3)+0x84)<<e − 0x84`. Range
    * ±32124 — identical to the JDK ULAW converter's table. */
  def mulawToLinear(b: Byte): Int = {
    val u = (~b) & 0xff
    val mag = ((((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** G.711 A-law byte → 16-bit linear sample (ITU G.711 Table 1a): XOR
    * 0x55, then segment expansion; sign bit SET means positive in A-law.
    * Range ±32256 — identical to the JDK ALAW converter's table. */
  def alawToLinear(b: Byte): Int = {
    val a = (b & 0xff) ^ 0x55
    val e = (a >> 4) & 7
    val m = a & 0x0f
    val mag = if (e == 0) (m << 4) + 8 else ((m << 4) + 0x108) << (e - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** 16-bit linear → μ-law byte (G.711 compression, bias-132 segment
    * search). Used only for fixtures/round-trip tests — the pipeline
    * decodes. */
  def linearToMulaw(sample: Int): Byte = {
    val s = math.max(-32635, math.min(32635, sample))
    val sign = if (s < 0) 0x80 else 0
    var mag = (if (s < 0) -s else s) + 0x84
    var e = 7
    var mask = 0x4000
    while (e > 0 && (mag & mask) == 0) { e -= 1; mask >>= 1 }
    val m = (mag >> (e + 3)) & 0x0f
    (~(sign | (e << 4) | m)).toByte
  }

  /** 16-bit linear → A-law byte (G.711 compression). Fixture-side only. */
  def linearToAlaw(sample: Int): Byte = {
    val s = math.max(-32767, math.min(32767, sample))
    val sign = if (s >= 0) 0x80 else 0
    var mag = if (s >= 0) s else -s
    if (mag > 32635) mag = 32635
    val out =
      if (mag < 256) (mag >> 4) // segment 0
      else {
        var e = 7
        var mask = 0x4000
        while (e > 0 && (mag & mask) == 0) { e -= 1; mask >>= 1 }
        (e << 4) | ((mag >> (e + 3)) & 0x0f)
      }
    ((sign | out) ^ 0x55).toByte
  }

  /** IMA ADPCM step-size table (IMA Digital Audio Pack, 89 entries). */
  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** IMA ADPCM index-adjust table (per 4-bit code). */
  private val ImaIndex: Array[Int] = Array(
    -1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM step: decode nibble `n` against (pred, index), return
    * the new (pred, index). The diff reconstruction `(2*m+1)*step/8` is
    * done with shifts exactly as the IMA reference algorithm specifies —
    * bit-identical across implementations, unlike the multiply form. */
  @inline private def imaStep(pred: Int, index: Int, n: Int): (Int, Int) = {
    val step = ImaStep(index)
    var diff = step >> 3
    if ((n & 4) != 0) diff += step
    if ((n & 2) != 0) diff += step >> 1
    if ((n & 1) != 0) diff += step >> 2
    val p0 = if ((n & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, index + ImaIndex(n)))
    (p, i)
  }

  /** Decode the data chunk of an IMA ADPCM WAV into interleaved 16-bit
    * samples. Block layout per the Microsoft WAVE_FORMAT_IMA_ADPCM spec:
    * each block starts with a 4-byte header per channel (int16 predictor,
    * uint8 step index, reserved byte) — the predictor IS sample 0 — then
    * nibble data in 4-byte-per-channel interleaved groups, low nibble
    * first. Returns None for an out-of-range step index (corrupt block);
    * truncation cannot occur because sniffWav pinned whole blocks. */
  private def decodeImaData(p: Array[Byte], h: WavHeader): Option[Array[Int]] = {
    def u8(i: Int) = p(i) & 0xff
    val ch = h.channels
    val nBlocks = h.dataBytes / h.blockAlign
    val out = new Array[Int](nBlocks * h.samplesPerBlock * ch)
    val pred = new Array[Int](ch)
    val index = new Array[Int](ch)
    var b = 0
    while (b < nBlocks) {
      val blockAt = h.dataOffset + b * h.blockAlign
      val outBase = b * h.samplesPerBlock * ch
      var c = 0
      while (c < ch) {
        val at = blockAt + c * 4
        val v = u8(at) | (u8(at + 1) << 8)
        pred(c) = (v << 16) >> 16 // sign-extend predictor
        index(c) = u8(at + 2)
        if (index(c) > 88) return None
        out(outBase + c) = pred(c) // header predictor is sample 0
        c += 1
      }
      // Nibble payload: groups of 4 bytes (8 samples) per channel,
      // channels interleaved group-wise; within a byte low nibble first.
      val dataAt = blockAt + 4 * ch
      val groups = (h.blockAlign - 4 * ch) / (4 * ch)
      var g = 0
      while (g < groups) {
        var c2 = 0
        while (c2 < ch) {
          val gAt = dataAt + (g * ch + c2) * 4
          var k = 0
          while (k < 8) {
            val byte = u8(gAt + (k >> 1))
            val nib = if ((k & 1) == 0) byte & 0x0f else (byte >> 4) & 0x0f
            val (np, ni) = imaStep(pred(c2), index(c2), nib)
            pred(c2) = np; index(c2) = ni
            val frame = 1 + g * 8 + k // frame 0 was the header predictor
            if (frame < h.samplesPerBlock)
              out(outBase + frame * ch + c2) = np
            k += 1
          }
          c2 += 1
        }
        g += 1
      }
      b += 1
    }
    Some(out)
  }

  /** Decode a RIFF/WAVE payload: [[sniffWav]]'s chunk walk, then one pass
    * materializing interleaved samples. Linear PCM keeps its container
    * width (sign-extended 16-bit / unsigned 8-bit per spec); G.711 and
    * IMA ADPCM expand to sign-correct 16-bit linear. */
  def decodeWav(p: Array[Byte]): Option[Pcm] =
    sniffWav(p).flatMap { h =>
      def u8(i: Int) = p(i) & 0xff
      val base = h.dataOffset
      h.audioFormat match {
        case FormatPcm =>
          val n = h.dataBytes / (h.bitsPerSample / 8)
          val samples = new Array[Int](n)
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
          Some(Pcm(h.channels, h.sampleRate, h.bitsPerSample, samples))
        case FormatAlaw | FormatMulaw =>
          val n = h.dataBytes
          val samples = new Array[Int](n)
          val mu = h.audioFormat == FormatMulaw
          var k = 0
          while (k < n) {
            samples(k) =
              if (mu) mulawToLinear(p(base + k)) else alawToLinear(p(base + k))
            k += 1
          }
          Some(Pcm(h.channels, h.sampleRate, 16, samples))
        case FormatImaAdpcm =>
          decodeImaData(p, h).map(Pcm(h.channels, h.sampleRate, 16, _))
        case _ => None
      }
    }

  /** Encode raw already-companded G.711 bytes into a WAV container
    * (format 6 A-law / 7 μ-law). Fixture writer for gates and specs. */
  def encodeWavG711(sampleRate: Int, channels: Int, mulaw: Boolean,
                    data: Array[Byte]): Array[Byte] = {
    require(channels > 0 && data.length % channels == 0,
      "data must hold whole frames")
    val out = new Array[Byte](DataStart + data.length + (data.length & 1))
    writeWavShell(out, if (mulaw) FormatMulaw else FormatAlaw, sampleRate,
      channels, bits = 8, blockAlign = channels,
      samplesPerBlock = 0, dataBytes = data.length)
    System.arraycopy(data, 0, out, DataStart, data.length)
    out
  }

  /** Encode IMA ADPCM blocks into a WAV container from pre-built block
    * payloads (each exactly `blockAlign` bytes: per-channel 4-byte
    * headers + nibble groups). Fixture writer — lets a spec/gate pin
    * predictors, step indexes, and nibbles exactly. */
  def encodeWavImaAdpcm(sampleRate: Int, channels: Int, blockAlign: Int,
                        blocks: Seq[Array[Byte]]): Array[Byte] = {
    require(blocks.forall(_.length == blockAlign), "blocks must be blockAlign bytes")
    val samplesPerBlock = (blockAlign - 4 * channels) * 2 / channels + 1
    val dataBytes = blockAlign * blocks.length
    val out = new Array[Byte](DataStart + dataBytes + (dataBytes & 1))
    writeWavShell(out, FormatImaAdpcm, sampleRate, channels, bits = 4,
      blockAlign = blockAlign, samplesPerBlock = samplesPerBlock,
      dataBytes = dataBytes)
    var at = DataStart
    blocks.foreach { b => System.arraycopy(b, 0, out, at, blockAlign); at += blockAlign }
    out
  }

  /** Compress 16-bit PCM to IMA ADPCM WAV (mono or stereo) — the real
    * encoder, for round-trip property tests. Frames must fill whole
    * blocks (`samplesPerBlock` per block). */
  def encodeImaAdpcmFromPcm(sampleRate: Int, channels: Int, blockAlign: Int,
                            samples: Array[Short]): Array[Byte] = {
    val spb = (blockAlign - 4 * channels) * 2 / channels + 1
    val frames = samples.length / channels
    require(frames % spb == 0, s"frames must fill whole blocks of $spb")
    val pred = new Array[Int](channels)
    val index = new Array[Int](channels)
    val blocks = (0 until frames / spb).map { b =>
      val block = new Array[Byte](blockAlign)
      val frame0 = b * spb
      var c = 0
      while (c < channels) {
        pred(c) = samples((frame0) * channels + c).toInt
        block(c * 4) = pred(c).toByte
        block(c * 4 + 1) = (pred(c) >> 8).toByte
        block(c * 4 + 2) = index(c).toByte
        c += 1
      }
      val groups = (blockAlign - 4 * channels) / (4 * channels)
      var g = 0
      while (g < groups) {
        var c2 = 0
        while (c2 < channels) {
          val gAt = 4 * channels + (g * channels + c2) * 4
          var k = 0
          while (k < 8) {
            val frame = frame0 + 1 + g * 8 + k
            val target =
              if (frame < frame0 + spb) samples(frame * channels + c2).toInt
              else pred(c2) // pad nibbles past the block's sample count
            val step = ImaStep(index(c2))
            val delta = target - pred(c2)
            var n = if (delta < 0) 8 else 0
            var d = if (delta < 0) -delta else delta
            if (d >= step) { n |= 4; d -= step }
            if (d >= (step >> 1)) { n |= 2; d -= step >> 1 }
            if (d >= (step >> 2)) { n |= 1 }
            val (np, ni) = imaStep(pred(c2), index(c2), n)
            pred(c2) = np; index(c2) = ni
            if ((k & 1) == 0) block(gAt + (k >> 1)) = (n & 0x0f).toByte
            else block(gAt + (k >> 1)) = (block(gAt + (k >> 1)) | (n << 4)).toByte
            k += 1
          }
          c2 += 1
        }
        g += 1
      }
      block
    }
    encodeWavImaAdpcm(sampleRate, channels, blockAlign, blocks)
  }

  /** Shared RIFF/WAVE + fmt(+extension) + data chunk-header writer for
    * the non-PCM fixture encoders (fmt size 18+fmtExtra, cbSize always
    * present per spec for compressed formats). */
  private def writeWavShell(out: Array[Byte], fmt: Int, sampleRate: Int,
                            channels: Int, bits: Int, blockAlign: Int,
                            samplesPerBlock: Int,
                            dataBytes: Int): Unit = {
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
    // Fixed shell: 20-byte fmt body (18 + cbSize extension of 2, written
    // even when unused — spec-legal), so "data" sits at 40 and sample
    // bytes start at [[DataStart]] = 48.
    le32(4, 4 + 8 + 20 + 8 + dataBytes + (dataBytes & 1))
    ascii(0, "RIFF"); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 20)
    le16(20, fmt)
    le16(22, channels); le32(24, sampleRate)
    val byteRate = fmt match {
      case FormatImaAdpcm =>
        // Average bytes/sec for block-aligned ADPCM.
        (sampleRate.toLong * blockAlign /
          math.max(1, samplesPerBlock)).toInt
      case _ => sampleRate * channels * (bits / 8)
    }
    le32(28, byteRate)
    le16(32, blockAlign)
    le16(34, bits)
    le16(36, 2) // cbSize
    le16(38, if (fmt == FormatImaAdpcm) samplesPerBlock else 0)
    ascii(40, "data"); le32(44, dataBytes)
  }

  /** First data byte in the fixture encoders' fixed WAV shell. */
  private val DataStart = 48
}
