package graft.operators

/** Dependency-free FLAC codec — the compressed-audio analogue of the
  * raster family: speech/audio training corpora (LibriSpeech and kin)
  * ship FLAC, so "audio as an analyzable column" needs a real in-engine
  * decode, not a header sniff. Implements the full stream format from
  * the public xiph.org specification (RFC 9639): STREAMINFO + metadata
  * walk, frame headers (UTF-8-coded frame numbers, all block-size /
  * sample-rate / sample-size codes, CRC-8), subframes (CONSTANT,
  * VERBATIM, FIXED orders 0-4, LPC up to order 32, wasted bits), Rice
  * residuals (4- and 5-bit parameters, partition orders, escape-raw
  * partitions), inter-channel decorrelation (left/side, right/side,
  * mid/side), and frame CRC-16 verification.
  *
  * FLAC is LOSSLESS: decode either reproduces the encoder's samples
  * bit-exactly or returns None — there is no tolerance anywhere, which
  * is what makes the m13 oracle gate exact (a formula waveform must
  * decode to the formula's analytic sums).
  *
  * The encoder is a real one (canonical frame layout, computed CRCs,
  * Rice-coded residuals over constant/fixed/LPC predictors, mid/side),
  * used by the gate and specs; `FlacCodecSpec` round-trips every
  * subframe type and validates the CRC and Rice layers independently.
  *
  * Reference behavior: binary file content ingested eagerly
  * (`dlt_sources/m365/__init__.py:22-62`) becomes decodable in-engine.
  * Output shape is [[AudioCodec.Pcm]] so every downstream audio operator
  * (feature sums, duration, windowing) is codec-agnostic.
  */
object FlacCodec {
  import AudioCodec.Pcm

  private final class Bad extends RuntimeException(null, null, false, false)
  private def bad(): Nothing = throw new Bad

  /** Max decoded samples per payload (alloc guard: a crafted STREAMINFO
    * can claim 2^36 samples in a 100-byte file). */
  final val MaxTotalSamples: Long = 1L << 24

  // ---- CRCs (spec Annex: CRC-8 poly 0x07, CRC-16 poly 0x8005) --------

  private val Crc8Table: Array[Int] = Array.tabulate(256) { b =>
    var c = b
    for (_ <- 0 until 8) c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff
                             else (c << 1) & 0xff
    c
  }
  private val Crc16Table: Array[Int] = Array.tabulate(256) { b =>
    var c = b << 8
    for (_ <- 0 until 8) c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
                             else (c << 1) & 0xffff
    c
  }
  private[operators] def crc8(p: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Table(c ^ (p(i) & 0xff)); i += 1 }
    c
  }
  private[operators] def crc16(p: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc16Table((c >> 8) ^ (p(i) & 0xff)) ^ ((c << 8) & 0xffff); i += 1 }
    c
  }

  // ---- bit reader (MSB-first) ----------------------------------------

  private[operators] final class BitIn(p: Array[Byte]) {
    var bytePos = 0
    var bitPos = 0 // bits consumed of current byte
    def atEnd: Boolean = bytePos >= p.length
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def bit(): Int = {
      if (bytePos >= p.length) bad()
      val b = (p(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def bitsInt(n: Int): Int = bits(n).toInt
    /** Signed two's-complement n-bit read. */
    def sbits(n: Int): Int = {
      val v = bits(n)
      (v << (64 - n) >> (64 - n)).toInt
    }
    def sbitsLong(n: Int): Long = {
      val v = bits(n)
      v << (64 - n) >> (64 - n)
    }
    /** Unary: count of 0-bits before the terminating 1. */
    def unary(): Int = {
      var n = 0
      while (bit() == 0) { n += 1; if (n > (1 << 20)) bad() }
      n
    }
  }

  // ---- STREAMINFO -----------------------------------------------------

  /** Parsed STREAMINFO facts (the audio-header sniff for FLAC). */
  final case class FlacStreamInfo(minBlock: Int, maxBlock: Int,
                                  sampleRate: Int, channels: Int,
                                  bitsPerSample: Int, totalSamples: Long) {
    def durationMs: Long =
      if (sampleRate == 0) 0L else totalSamples * 1000L / sampleRate
  }

  /** Walk "fLaC" + metadata blocks; return STREAMINFO facts and the byte
    * offset of the first audio frame. */
  def sniffFlac(p: Array[Byte]): Option[(FlacStreamInfo, Int)] = {
    if (p == null || p.length < 42) return None
    if (p(0) != 'f' || p(1) != 'L' || p(2) != 'a' || p(3) != 'C') return None
    try {
      var at = 4
      var info: FlacStreamInfo = null
      var last = false
      var first = true
      while (!last) {
        if (at + 4 > p.length) return None
        val h = p(at) & 0xff
        last = (h & 0x80) != 0
        val btype = h & 0x7f
        val len = ((p(at + 1) & 0xff) << 16) | ((p(at + 2) & 0xff) << 8) |
          (p(at + 3) & 0xff)
        if (first && btype != 0) return None // STREAMINFO must be first
        if (btype == 0) {
          if (!first || len != 34 || at + 4 + 34 > p.length) return None
          val b = new BitIn(java.util.Arrays.copyOfRange(p, at + 4, at + 38))
          val minB = b.bitsInt(16)
          val maxB = b.bitsInt(16)
          b.bits(24); b.bits(24) // min/max frame size (informational)
          val sr = b.bitsInt(20)
          val nc = b.bitsInt(3) + 1
          val bps = b.bitsInt(5) + 1
          val total = b.bits(36)
          if (sr <= 0 || sr > 655350) return None
          info = FlacStreamInfo(minB, maxB, sr, nc, bps, total)
        }
        first = false
        at += 4 + len
        if (at > p.length) return None
      }
      if (info == null) None else Some((info, at))
    } catch { case _: Bad | _: ArrayIndexOutOfBoundsException => None }
  }

  // ---- frame decode ---------------------------------------------------

  /** Decode a whole FLAC payload to interleaved PCM. Returns None on any
    * structural problem, CRC mismatch, or guard breach — never a throw. */
  def decode(p: Array[Byte]): Option[Pcm] = {
    try decodeImpl(p) catch {
      case _: Bad | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException | _: ArithmeticException => None
    }
  }

  private def decodeImpl(p: Array[Byte]): Option[Pcm] = {
    val (info, framesAt) = sniffFlac(p).getOrElse(return None)
    if (info.channels < 1 || info.channels > 8) return None
    if (info.bitsPerSample < 4 || info.bitsPerSample > 32) return None
    if (info.totalSamples > MaxTotalSamples) return None
    val nc = info.channels
    val outLen =
      if (info.totalSamples > 0) (info.totalSamples * nc).toInt else -1
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    if (outLen > 0) out.sizeHint(outLen)
    var decoded = 0L

    var at = framesAt
    while (at < p.length &&
           (info.totalSamples == 0 || decoded < info.totalSamples)) {
      // ---- frame header ----
      val frameStart = at
      val br = new BitIn(p)
      br.bytePos = at
      if (br.bits(14) != 0x3ffe) bad()
      if (br.bit() != 0) bad() // reserved
      br.bit() // blocking strategy (frame- vs sample-number; both fine)
      val bsCode = br.bitsInt(4)
      val srCode = br.bitsInt(4)
      val chAsn = br.bitsInt(4)
      val ssCode = br.bitsInt(3)
      if (br.bit() != 0) bad() // reserved
      // UTF-8-style coded frame/sample number (value unused; must parse)
      val lead = br.bitsInt(8)
      var cont = 0
      if ((lead & 0x80) != 0) {
        var m = lead
        while ((m & 0x40) != 0) { cont += 1; m <<= 1 }
        if (cont < 1 || cont > 6) bad()
        for (_ <- 0 until cont) if ((br.bitsInt(8) & 0xc0) != 0x80) bad()
      }
      val blockSize = bsCode match {
        case 0 => bad()
        case 1 => 192
        case n if n >= 2 && n <= 5 => 576 << (n - 2)
        case 6 => br.bitsInt(8) + 1
        case 7 => br.bitsInt(16) + 1
        case n => 256 << (n - 8)
      }
      val sampleRate = srCode match {
        case 0 => info.sampleRate
        case 1 => 88200
        case 2 => 176400
        case 3 => 192000
        case 4 => 8000
        case 5 => 16000
        case 6 => 22050
        case 7 => 24000
        case 8 => 32000
        case 9 => 44100
        case 10 => 48000
        case 11 => 96000
        case 12 => br.bitsInt(8) * 1000
        case 13 => br.bitsInt(16)
        case 14 => br.bitsInt(16) * 10
        case _ => bad()
      }
      val bps = ssCode match {
        case 0 => info.bitsPerSample
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => bad()
      }
      val frameChannels = if (chAsn <= 7) chAsn + 1 else 2
      if (frameChannels != nc) bad()
      if (blockSize <= 0 || blockSize > 65535) bad()
      if (decoded + blockSize > MaxTotalSamples) bad()
      // CRC-8 covers the header up to (not incl.) the crc byte
      br.align()
      val crcAt = br.bytePos
      if (crc8(p, frameStart, crcAt) != (p(crcAt) & 0xff)) bad()
      br.bytePos = crcAt + 1

      // ---- subframes ----
      val chans = Array.ofDim[Long](frameChannels, blockSize)
      var ch = 0
      while (ch < frameChannels) {
        // side channels carry one extra bit
        val extra = chAsn match {
          case 8 => if (ch == 1) 1 else 0 // left/side
          case 9 => if (ch == 0) 1 else 0 // right/side
          case 10 => if (ch == 1) 1 else 0 // mid/side
          case _ => 0
        }
        decodeSubframe(br, chans(ch), blockSize, bps + extra)
        ch += 1
      }
      br.align()
      // frame CRC-16 covers everything from the sync to here
      if (crc16(p, frameStart, br.bytePos) !=
          (((p(br.bytePos) & 0xff) << 8) | (p(br.bytePos + 1) & 0xff))) bad()
      br.bytePos += 2
      at = br.bytePos

      // ---- undo inter-channel decorrelation, interleave ----
      var i = 0
      chAsn match {
        case 8 => // left/side: right = left - side
          while (i < blockSize) {
            val l = chans(0)(i); val s = chans(1)(i)
            out += l.toInt; out += (l - s).toInt
            i += 1
          }
        case 9 => // right/side: left = right + side
          while (i < blockSize) {
            val s = chans(0)(i); val r = chans(1)(i)
            out += (r + s).toInt; out += r.toInt
            i += 1
          }
        case 10 => // mid/side
          while (i < blockSize) {
            var m = chans(0)(i); val s = chans(1)(i)
            m = (m << 1) | (s & 1)
            out += ((m + s) >> 1).toInt; out += ((m - s) >> 1).toInt
            i += 1
          }
        case _ =>
          while (i < blockSize) {
            var c = 0
            while (c < frameChannels) { out += chans(c)(i).toInt; c += 1 }
            i += 1
          }
      }
      decoded += blockSize
      val _ = sampleRate // frame-local rate is validated, stream rate reported
    }
    if (info.totalSamples > 0 && decoded != info.totalSamples) bad()
    Some(Pcm(nc, info.sampleRate, info.bitsPerSample, out.result()))
  }

  private def decodeSubframe(br: BitIn, outCh: Array[Long], n: Int,
                             bps: Int): Unit = {
    if (br.bit() != 0) bad() // zero-pad bit
    val ty = br.bitsInt(6)
    var wasted = 0
    if (br.bit() == 1) wasted = br.unary() + 1
    val ebps = bps - wasted
    if (ebps <= 0 || ebps > 33) bad()

    if (ty == 0) { // CONSTANT
      val v = br.sbitsLong(ebps)
      java.util.Arrays.fill(outCh, v)
    } else if (ty == 1) { // VERBATIM
      var i = 0
      while (i < n) { outCh(i) = br.sbitsLong(ebps); i += 1 }
    } else if (ty >= 8 && ty <= 12) { // FIXED, order = ty - 8
      val order = ty - 8
      if (order > n) bad()
      var i = 0
      while (i < order) { outCh(i) = br.sbitsLong(ebps); i += 1 }
      decodeResidual(br, outCh, n, order)
      i = order
      order match {
        case 0 =>
        case 1 => while (i < n) { outCh(i) += outCh(i - 1); i += 1 }
        case 2 => while (i < n) {
            outCh(i) += 2 * outCh(i - 1) - outCh(i - 2); i += 1 }
        case 3 => while (i < n) {
            outCh(i) += 3 * outCh(i - 1) - 3 * outCh(i - 2) + outCh(i - 3)
            i += 1 }
        case _ => while (i < n) {
            outCh(i) += 4 * outCh(i - 1) - 6 * outCh(i - 2) +
              4 * outCh(i - 3) - outCh(i - 4)
            i += 1 }
      }
    } else if (ty >= 32) { // LPC, order = ty - 31
      val order = ty - 31
      if (order > n) bad()
      var i = 0
      while (i < order) { outCh(i) = br.sbitsLong(ebps); i += 1 }
      val precision = br.bitsInt(4) + 1
      if (precision == 16) bad() // 1111 is invalid per spec
      val shift = br.sbits(5)
      if (shift < 0) bad()
      val coefs = new Array[Long](order)
      i = 0
      while (i < order) { coefs(i) = br.sbits(precision); i += 1 }
      decodeResidual(br, outCh, n, order)
      i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j) * outCh(i - 1 - j); j += 1 }
        outCh(i) += acc >> shift
        i += 1
      }
    } else bad() // reserved types

    if (wasted > 0) {
      var i = 0
      while (i < n) { outCh(i) <<= wasted; i += 1 }
    }
  }

  /** Rice-coded residual into outCh(order until n), stored raw (the
    * caller applies the predictor). */
  private def decodeResidual(br: BitIn, outCh: Array[Long], n: Int,
                             order: Int): Unit = {
    val method = br.bitsInt(2)
    if (method > 1) bad()
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = br.bitsInt(4)
    val parts = 1 << po
    if (n % parts != 0) bad()
    val perPart = n >> po
    if (perPart <= order && po > 0) bad()
    if (perPart <= 0) bad()
    var i = order
    var part = 0
    while (part < parts) {
      val count = if (part == 0) perPart - order else perPart
      if (count < 0) bad()
      val k = br.bitsInt(pBits)
      if (k == escape) {
        val raw = br.bitsInt(5)
        var c = 0
        while (c < count) {
          outCh(i) = if (raw == 0) 0L else br.sbitsLong(raw)
          i += 1; c += 1
        }
      } else {
        var c = 0
        while (c < count) {
          val q = br.unary().toLong
          val u = (q << k) | br.bits(k)
          outCh(i) = (u >>> 1) ^ -(u & 1L) // zigzag
          i += 1; c += 1
        }
      }
      part += 1
    }
  }

  // ---- encoder --------------------------------------------------------

  private[operators] final class BitOut {
    val bos = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    def put(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { bos.write(acc); acc = 0; nbits = 0 }
        i -= 1
      }
    }
    def putUnary(q: Int): Unit = { put(0, q); put(1, 1) }
    def alignZero(): Unit = while (nbits != 0) put(0, 1)
    def bytes: Array[Byte] = { require(nbits == 0); bos.toByteArray }
  }

  /** Per-channel subframe strategy for [[encode]]. */
  sealed trait SubframePlan
  case object PlanAuto extends SubframePlan // constant if flat, else fixed-2
  case object PlanVerbatim extends SubframePlan
  final case class PlanFixed(order: Int) extends SubframePlan
  /** LPC with explicit quantized coefficients and shift. */
  final case class PlanLpc(coefs: Array[Int], shift: Int,
                           precision: Int) extends SubframePlan

  /** Encode interleaved PCM as a real FLAC stream: STREAMINFO + fixed
    * blocksize frames, each channel coded per `plan`, Rice partition
    * order 0 with a fitted parameter. `midSide = true` (stereo only)
    * stores mid/side subframes. Round trip is bit-exact by construction.
    */
  def encode(sampleRate: Int, bps: Int, channels: Int, samples: Array[Int],
             blockSize: Int = 192, plan: SubframePlan = PlanAuto,
             midSide: Boolean = false, wastedBits: Int = 0,
             partitionOrder: Int = 0): Array[Byte] = {
    require(channels >= 1 && channels <= 8)
    require(samples.length % channels == 0)
    require(blockSize >= 16 && blockSize <= 65535)
    require(bps >= 8 && bps <= 24)
    require(!midSide || channels == 2)
    val total = samples.length / channels
    require(total % blockSize == 0, "fixture encoder: whole blocks only")

    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last-metadata flag set)
    val si = new BitOut
    si.put(blockSize, 16); si.put(blockSize, 16)
    si.put(0, 24); si.put(0, 24)
    si.put(sampleRate, 20); si.put(channels - 1, 3); si.put(bps - 1, 5)
    si.put(total, 36)
    for (_ <- 0 until 16) si.put(0, 8) // MD5 unset (all zero = not computed)
    val siB = si.bytes
    require(siB.length == 34)
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(siB, 0, 34)

    val nFrames = total / blockSize
    var f = 0
    while (f < nFrames) {
      val bo = new BitOut
      bo.put(0x3ffe, 14)
      bo.put(0, 1) // reserved
      bo.put(0, 1) // fixed blocksize strategy
      // block size code: emit 8-bit "get from end" for generality except
      // the classic 192 shortcut
      val bsCode = if (blockSize == 192) 1
                   else if (blockSize <= 256) 6 else 7
      bo.put(bsCode, 4)
      val srCode = sampleRate match {
        case 8000 => 4
        case 16000 => 5
        case 22050 => 6
        case 24000 => 7
        case 32000 => 8
        case 44100 => 9
        case 48000 => 10
        case 96000 => 11
        case _ => 0
      }
      bo.put(srCode, 4)
      val chAsn = if (midSide) 10 else channels - 1
      bo.put(chAsn, 4)
      val ssCode = bps match {
        case 8 => 1
        case 12 => 2
        case 16 => 4
        case 20 => 5
        case 24 => 6
        case _ => 0
      }
      bo.put(ssCode, 3)
      bo.put(0, 1) // reserved
      // UTF-8 coded frame number
      if (f < 0x80) bo.put(f, 8)
      else if (f < 0x800) {
        bo.put(0xc0 | (f >> 6), 8); bo.put(0x80 | (f & 0x3f), 8)
      } else {
        bo.put(0xe0 | (f >> 12), 8); bo.put(0x80 | ((f >> 6) & 0x3f), 8)
        bo.put(0x80 | (f & 0x3f), 8)
      }
      if (bsCode == 6) bo.put(blockSize - 1, 8)
      else if (bsCode == 7) bo.put(blockSize - 1, 16)
      bo.alignZero()
      val headerNoCrc = bo.bytes
      val h8 = crc8(headerNoCrc, 0, headerNoCrc.length)

      val body = new BitOut
      // channel planes for this frame
      val base = f * blockSize
      val planes: Array[Array[Long]] =
        if (midSide) {
          val mid = new Array[Long](blockSize)
          val side = new Array[Long](blockSize)
          var i = 0
          while (i < blockSize) {
            val l = samples((base + i) * 2).toLong
            val r = samples((base + i) * 2 + 1).toLong
            mid(i) = (l + r) >> 1
            side(i) = l - r
            i += 1
          }
          Array(mid, side)
        } else {
          Array.tabulate(channels) { c =>
            Array.tabulate(blockSize)(i =>
              samples((base + i) * channels + c).toLong)
          }
        }
      var ch = 0
      while (ch < planes.length) {
        val extra = if (midSide && ch == 1) 1 else 0
        encodeSubframe(body, planes(ch), bps + extra, plan, wastedBits,
          partitionOrder)
        ch += 1
      }
      body.alignZero()
      val bodyB = body.bytes

      val frameB = new Array[Byte](headerNoCrc.length + 1 + bodyB.length)
      System.arraycopy(headerNoCrc, 0, frameB, 0, headerNoCrc.length)
      frameB(headerNoCrc.length) = h8.toByte
      System.arraycopy(bodyB, 0, frameB, headerNoCrc.length + 1, bodyB.length)
      val c16 = crc16(frameB, 0, frameB.length)
      out.write(frameB, 0, frameB.length)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
      f += 1
    }
    out.toByteArray
  }

  private def encodeSubframe(bo: BitOut, x0: Array[Long], bps: Int,
                             plan: SubframePlan, wasted0: Int,
                             po: Int): Unit = {
    // wasted bits: reduced per subframe to the largest shift the plane
    // actually supports (mid/side planes may not share the source
    // signal's trailing zeros); code the shifted-down signal at
    // bps - wasted and declare the shift
    var wasted = wasted0
    while (wasted > 0 && x0.exists(v => (v & ((1L << wasted) - 1)) != 0))
      wasted -= 1
    val x = if (wasted == 0) x0 else x0.map(_ >> wasted)
    val ebps = bps - wasted
    def putWasted(): Unit =
      if (wasted == 0) bo.put(0, 1)
      else { bo.put(1, 1); bo.putUnary(wasted - 1) }
    val n = x.length
    val flat = x.forall(_ == x(0))
    val effective = plan match {
      case PlanAuto => if (flat) null else PlanFixed(2)
      case p => p
    }
    bo.put(0, 1) // pad
    if (effective == null) { // CONSTANT
      bo.put(0, 6)
      putWasted()
      bo.put(x(0) & ((1L << ebps) - 1), ebps)
      return
    }
    effective match {
      case PlanVerbatim =>
        bo.put(1, 6)
        putWasted()
        var i = 0
        while (i < n) { bo.put(x(i) & ((1L << ebps) - 1), ebps); i += 1 }
      case PlanFixed(order) =>
        require(order >= 0 && order <= 4 && order < n)
        bo.put(8 + order, 6)
        putWasted()
        var i = 0
        while (i < order) { bo.put(x(i) & ((1L << ebps) - 1), ebps); i += 1 }
        val res = new Array[Long](n)
        i = order
        while (i < n) {
          res(i) = order match {
            case 0 => x(i)
            case 1 => x(i) - x(i - 1)
            case 2 => x(i) - 2 * x(i - 1) + x(i - 2)
            case 3 => x(i) - 3 * x(i - 1) + 3 * x(i - 2) - x(i - 3)
            case _ => x(i) - 4 * x(i - 1) + 6 * x(i - 2) -
              4 * x(i - 3) + x(i - 4)
          }
          i += 1
        }
        encodeResidual(bo, res, n, order, po)
      case PlanLpc(coefs, shift, precision) =>
        val order = coefs.length
        require(order >= 1 && order <= 32 && order < n)
        require(precision >= 2 && precision <= 15)
        require(shift >= 0 && shift <= 15)
        bo.put(31 + order, 6)
        putWasted()
        var i = 0
        while (i < order) { bo.put(x(i) & ((1L << ebps) - 1), ebps); i += 1 }
        bo.put(precision - 1, 4)
        bo.put(shift, 5)
        i = 0
        while (i < order) {
          bo.put(coefs(i).toLong & ((1L << precision) - 1), precision)
          i += 1
        }
        val res = new Array[Long](n)
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * x(i - 1 - j); j += 1 }
          res(i) = x(i) - (acc >> shift)
          i += 1
        }
        encodeResidual(bo, res, n, order, po)
      case PlanAuto => throw new IllegalStateException
    }
  }

  private def encodeResidual(bo: BitOut, res: Array[Long], n: Int,
                             order: Int, po: Int): Unit = {
    require(po >= 0 && po <= 15 && n % (1 << po) == 0)
    val parts = 1 << po
    val perPart = n >> po
    require(perPart > order)
    bo.put(1, 2) // 5-bit Rice parameters (escape value 31)
    bo.put(po, 4)
    var part = 0
    var i = order
    while (part < parts) {
      val count = if (part == 0) perPart - order else perPart
      // fit k per partition: smallest k with max quotient <= 40; fall
      // back to an escape-raw partition when no k <= 30 bounds it
      var maxU = 0L
      var j = i
      while (j < i + count) {
        val u = (res(j) << 1) ^ (res(j) >> 63)
        if (u > maxU) maxU = u
        j += 1
      }
      var k = 0
      while (k < 30 && (maxU >> k) > 40) k += 1
      if ((maxU >> k) > 40) {
        // escape: raw two's-complement at the tightest width that fits
        var w = 1
        j = i
        while (j < i + count) {
          val v = res(j)
          val bits = 65 - java.lang.Long.numberOfLeadingZeros(v ^ (v >> 63))
          if (bits > w) w = bits.toInt
          j += 1
        }
        require(w <= 31, "residual exceeds 31-bit raw escape width")
        bo.put(31, 5)
        bo.put(w, 5)
        j = i
        while (j < i + count) {
          bo.put(res(j) & ((1L << w) - 1), w)
          j += 1
        }
      } else {
        bo.put(k, 5)
        j = i
        while (j < i + count) {
          val u = (res(j) << 1) ^ (res(j) >> 63)
          bo.putUnary((u >>> k).toInt)
          if (k > 0) bo.put(u & ((1L << k) - 1), k)
          j += 1
        }
      }
      i += count
      part += 1
    }
  }
}
