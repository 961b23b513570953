package graft.operators

/** Lossless JPEG (SOF3, ITU T.81 Annex H) — the predictive Huffman
  * process used by scientific/medical imaging for 12- and 16-bit data the
  * DCT modes can't carry. Decodes any precision 2..16 and all seven
  * predictors, mono or multi-component (1x1 sampling, interleaved scan).
  * Shares the entropy machinery with [[JpegCodec]] (canonical Huffman per
  * Annex C, FF-stuffed bit reader, F.2.2.1 EXTEND) — lossless coding is
  * the DC-difference path applied to every sample, with a spatial
  * predictor in place of the previous-block DC.
  *
  * Reference pipeline context: binary file payloads arrive opaque
  * (`dlt_sources/m365/__init__.py:22-62`); this decodes them partition-
  * parallel like the rest of the codec family. Sums are integer-exact by
  * construction (lossless), which is what the m09 analytic gate checks.
  *
  * Robustness stance identical to [[JpegCodec]]: malformed/truncated/
  * unsupported payloads return None, never a throw.
  */
object LosslessJpeg {
  import JpegCodec.{Bad, bad, Huff, BitReader, extend}

  /** Decoded lossless image: `samples` interleaved row-major
    * (x-major, one value per component), full integer precision. */
  final case class LosslessImage(width: Int, height: Int, components: Int,
                                 precision: Int, samples: Array[Int])

  def decode(p: Array[Byte]): Option[LosslessImage] = {
    if (p == null || p.length < 4 || (p(0) & 0xff) != 0xff ||
      (p(1) & 0xff) != 0xd8) return None
    try Some(run(p)) catch {
      case _: Bad | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }
  }

  private final case class LComp(id: Int, var dcTab: Int = 0)

  private def run(p: Array[Byte]): LosslessImage = {
    def u8(i: Int) = if (i < p.length) p(i) & 0xff else bad()
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)

    var width = 0
    var height = 0
    var precision = 0
    var comps: Array[LComp] = null
    val huff = new Array[Huff](4)
    var restartInterval = 0
    var predictorSel = 0
    var pt = 0

    var at = 2
    var done = false
    while (!done) {
      if (u8(at) != 0xff) bad()
      val m = u8(at + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { at += 2 }
      else if (m == 0xd9) bad() // EOI before any scan
      else {
        val len = be16(at + 2)
        if (len < 2) bad()
        val seg = at + 4
        m match {
          case 0xc3 => // SOF3 lossless
            precision = u8(seg)
            height = be16(seg + 1)
            width = be16(seg + 3)
            val nc = u8(seg + 5)
            if (precision < 2 || precision > 16) bad()
            if (width <= 0 || height <= 0 || nc <= 0 || nc > 4) bad()
            if (width.toLong * height * nc > (1L << 24)) bad() // alloc guard
            comps = Array.tabulate(nc) { i =>
              val off = seg + 6 + i * 3
              val hv = u8(off + 1)
              if (hv != 0x11) bad() // 1x1 sampling only in this decoder
              LComp(u8(off))
            }
          case 0xc0 | 0xc1 | 0xc2 | 0xc9 | 0xca | 0xcb =>
            bad() // DCT/arithmetic SOFs: not this decoder's process
          case 0xc4 => // DHT (DC-class tables carry the sample categories)
            var o = seg
            while (o < seg + len - 2) {
              val tc = u8(o) >> 4
              val th = u8(o) & 0x0f
              val bits = new Array[Int](17)
              var total = 0
              for (l <- 1 to 16) { bits(l) = u8(o + l); total += bits(l) }
              if (total > 256) bad()
              val vals = new Array[Byte](total)
              for (i <- 0 until total) vals(i) = p(o + 17 + i)
              if (tc == 0) {
                if (th > 3) bad()
                huff(th) = new Huff(bits, vals)
              } // AC-class tables are legal to ship, unused in lossless
              o += 17 + total
            }
          case 0xdd => // DRI
            restartInterval = be16(seg)
          case 0xda => // SOS
            if (comps == null) bad()
            val ns = u8(seg)
            if (ns != comps.length) bad() // single fully-interleaved scan
            for (i <- 0 until ns) {
              val cid = u8(seg + 1 + i * 2)
              val c = comps.find(_.id == cid).getOrElse(bad())
              c.dcTab = u8(seg + 2 + i * 2) >> 4
            }
            predictorSel = u8(seg + 1 + ns * 2) // Ss = predictor selector
            pt = u8(seg + 3 + ns * 2) & 0x0f // Al = point transform
            if (predictorSel < 1 || predictorSel > 7) bad()
            if (pt >= precision) bad()
            done = true
          case _ => // APPn/COM/DQT(unused): skip
        }
        if (!done) at += 2 + len else at = at + 2 + len
      }
    }
    if (comps == null || huff.forall(_ == null)) bad()
    comps.foreach(c => if (huff(c.dcTab) == null) bad())

    val nc = comps.length
    val out = new Array[Int](width * height * nc)
    val reader = new BitReader(p, at)
    val mask = 0xffff
    val defaultPred = 1 << (precision - pt - 1)
    // per-component previous-row buffer and current-row buffer
    val prevRow = Array.ofDim[Int](nc, width)
    val curRow = Array.ofDim[Int](nc, width)
    var sinceRestart = 0
    var restarted = true // start-of-scan behaves like a fresh interval
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          if (!reader.restart()) bad()
          sinceRestart = 0
          restarted = true
        }
        var ci = 0
        while (ci < nc) {
          val s = reader.decode(huff(comps(ci).dcTab))
          if (s > 16) bad()
          val diff =
            if (s == 16) 32768
            else extend(reader.bits(s), s)
          val px =
            if (restarted) defaultPred
            else if (y == 0) curRow(ci)(x - 1) // first line: Ra
            else if (x == 0) prevRow(ci)(x) // first column: Rb
            else {
              val a = curRow(ci)(x - 1)
              val b = prevRow(ci)(x)
              val c = prevRow(ci)(x - 1)
              predictorSel match {
                case 1 => a
                case 2 => b
                case 3 => c
                case 4 => a + b - c
                case 5 => a + ((b - c) >> 1)
                case 6 => b + ((a - c) >> 1)
                case _ => (a + b) >> 1
              }
            }
          val v = (px + diff) & mask
          curRow(ci)(x) = v
          out((y * width + x) * nc + ci) = v
          ci += 1
        }
        restarted = false
        sinceRestart += 1
        x += 1
      }
      // row done: rotate buffers
      var ci = 0
      while (ci < nc) {
        System.arraycopy(curRow(ci), 0, prevRow(ci), 0, width)
        ci += 1
      }
      y += 1
    }
    // a sample exceeding the declared precision means a corrupt stream
    val lim = (1 << precision) - 1
    if (pt == 0 && out.exists(v => v < 0 || v > lim)) bad()
    LosslessImage(width, height, nc, precision, out)
  }

  // ------------------------------------------------------------------
  // Encoder (fixture + general): mirror of the decode path.
  // ------------------------------------------------------------------

  /** Canonical DC-class Huffman table covering categories 0..16 used by
    * the encoder: lengths (2,2,2,3,4,...,16) — Kraft sum 1 − 2^-16, so no
    * all-ones code exists (the property Annex C tables maintain). */
  private val EncLengths: Array[Int] =
    Array(2, 2, 2) ++ (3 to 16).toArray

  /** Encode a lossless JPEG (SOF3): `samples` interleaved row-major at
    * `precision` bits, all components 1x1-sampled in one interleaved
    * scan, predictor 1..7, optional restart interval in MCUs. */
  def encode(width: Int, height: Int, components: Int, precision: Int,
             predictor: Int, samples: Array[Int],
             restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && components > 0 && components <= 4)
    require(precision >= 2 && precision <= 16)
    require(predictor >= 1 && predictor <= 7)
    require(samples.length == width * height * components)
    val lim = (1 << precision) - 1
    require(samples.forall(v => v >= 0 && v <= lim), "samples exceed precision")

    val bos = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bos.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }

    marker(0xd8) // SOI
    marker(0xc3); w16(8 + 3 * components); w8(precision) // SOF3
    w16(height); w16(width); w8(components)
    for (i <- 0 until components) { w8(i + 1); w8(0x11); w8(0) }

    // DHT: symbols 0..16 with EncLengths, canonical order
    val bitsPerLen = new Array[Int](17)
    EncLengths.foreach(l => bitsPerLen(l) += 1)
    marker(0xc4); w16(2 + 17 + 17); w8(0x00)
    for (l <- 1 to 16) w8(bitsPerLen(l))
    // canonical: symbols sorted by (length, symbol) — EncLengths is
    // already nondecreasing so symbol order 0..16 IS canonical order
    for (sym <- 0 to 16) w8(sym)
    // derive the actual codes the decoder's Annex C reconstruction yields
    val codeOf = new Array[Int](17)
    val lenOf = new Array[Int](17)
    var code = 0
    var sym = 0
    for (l <- 1 to 16) {
      var n = bitsPerLen(l)
      while (n > 0) {
        codeOf(sym) = code; lenOf(sym) = l
        code += 1; sym += 1; n -= 1
      }
      code <<= 1
    }

    if (restartInterval > 0) { marker(0xdd); w16(4); w16(restartInterval) }

    marker(0xda); w16(6 + 2 * components); w8(components) // SOS
    for (i <- 0 until components) { w8(i + 1); w8(0x00) }
    w8(predictor); w8(0); w8(0) // Ss = predictor, Se = 0, AhAl = 0

    var acc = 0
    var nbits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          w8(acc)
          if ((acc & 0xff) == 0xff) w8(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flushBits(): Unit = while (nbits != 0) put(1, 1)

    val defaultPred = 1 << (precision - 1)
    val prevRow = Array.ofDim[Int](components, width)
    val curRow = Array.ofDim[Int](components, width)
    var rstIdx = 0
    var sinceRestart = 0
    var fresh = true
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          flushBits()
          marker(0xd0 + (rstIdx & 7))
          rstIdx += 1
          sinceRestart = 0
          fresh = true
        }
        var ci = 0
        while (ci < components) {
          val v = samples((y * width + x) * components + ci)
          val px =
            if (fresh) defaultPred
            else if (y == 0) curRow(ci)(x - 1)
            else if (x == 0) prevRow(ci)(x)
            else {
              val a = curRow(ci)(x - 1)
              val b = prevRow(ci)(x)
              val c = prevRow(ci)(x - 1)
              predictor match {
                case 1 => a
                case 2 => b
                case 3 => c
                case 4 => a + b - c
                case 5 => a + ((b - c) >> 1)
                case 6 => b + ((a - c) >> 1)
                case _ => (a + b) >> 1
              }
            }
          curRow(ci)(x) = v
          // difference folded to [-32768, 32767]; -32768 codes as +32768
          val diff = ((v - px + 32768) & 0xffff) - 32768
          if (diff == -32768) put(codeOf(16), lenOf(16))
          else {
            var mag = if (diff < 0) -diff else diff
            var s = 0
            while (mag != 0) { mag >>= 1; s += 1 }
            put(codeOf(s), lenOf(s))
            if (s > 0) {
              val d = if (diff < 0) diff - 1 else diff
              put(d & ((1 << s) - 1), s)
            }
          }
          ci += 1
        }
        fresh = false
        sinceRestart += 1
        x += 1
      }
      var ci = 0
      while (ci < components) {
        System.arraycopy(curRow(ci), 0, prevRow(ci), 0, width)
        ci += 1
      }
      y += 1
    }
    flushBits()
    marker(0xd9) // EOI
    bos.toByteArray
  }
}
