package graft.operators

/** Dependency-free baseline JPEG (JFIF) decoder: marker parse, canonical
  * Huffman entropy decode, dequantize + dezigzag, separable floating IDCT,
  * nearest-neighbor chroma upsampling, YCbCr→RGB. Covers baseline and
  * extended sequential DCT (SOF0/SOF1), 8-bit, 1 or 3 components, sampling
  * factors ≤ 2, restart markers, byte stuffing. Progressive, arithmetic,
  * 12-bit, and CMYK return None — entropy-coded progressive scans need a
  * multi-pass buffer this deliberately stays simpler than.
  *
  * Same role as the BMP/PNG paths in [[RasterCodec]]: the reference
  * pipeline ingests arbitrary binary file content
  * (`dlt_sources/m365/__init__.py:22-62`) and JPEG is the dominant image
  * format of any real corpus; here the payload→pixels step runs
  * distributed, one partition at a time, with a malformed payload yielding
  * None — never an exception that would kill a 100 TB decode job.
  *
  * The companion [[encodeJpegGrayBlocks]] writes DC-only 4:4:4 fixtures
  * whose decoded pixels are analytically exact (a DC of 8k IDCTs to a flat
  * block of k+128), which is what lets the m03 oracle gate hash-match the
  * decode against a formula computed in SQL.
  */
object JpegCodec {
  import RasterCodec.Raster

  private final class Bad extends RuntimeException(null, null, false, false)
  private def bad(): Nothing = throw new Bad

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** c(u)(x) = C(u)/2 * cos((2x+1)uπ/16) — the separable 1-D IDCT basis. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    // canonical code tables per JPEG Annex C
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    private var code = 0
    private var k = 0
    for (l <- 1 to 16) {
      valPtr(l) = k
      minCode(l) = code
      code += bits(l)
      k += bits(l)
      maxCode(l) = code - 1
      if (bits(l) == 0) maxCode(l) = -1
      code <<= 1
    }
    def value(i: Int): Int = vals(i) & 0xff
  }

  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var sawMarker: Int = -1 // marker byte seen (e.g. 0xD9), stops the scan

    def reset(): Unit = { acc = 0; nbits = 0 }

    /** Consume a restart marker RSTn if next in the stream. The reader may
      * already have read ahead into the marker (fill() tops up 4 bytes at
      * a time) — sawMarker is cleared so the next interval decodes. */
    def restart(): Boolean = {
      reset()
      if (pos + 1 < p.length && (p(pos) & 0xff) == 0xff) {
        val m = p(pos + 1) & 0xff
        if (m >= 0xd0 && m <= 0xd7) { pos += 2; sawMarker = -1; return true }
      }
      false
    }

    private def fill(): Unit = {
      while (nbits <= 24) {
        if (sawMarker >= 0) { acc |= 0 << (24 - nbits); nbits += 8 }
        else if (pos >= p.length) { sawMarker = 0xd9; nbits += 8 }
        else {
          var b = p(pos) & 0xff
          pos += 1
          if (b == 0xff) {
            if (pos >= p.length) { sawMarker = 0xd9; b = 0 }
            else {
              val m = p(pos) & 0xff
              if (m == 0x00) pos += 1 // stuffed byte: 0xFF data
              else { sawMarker = m; pos -= 1; b = 0 }
            }
          }
          acc |= b << (24 - nbits)
          nbits += 8
        }
      }
    }

    def bit(): Int = {
      if (nbits == 0) fill()
      val v = (acc >>> 31) & 1
      acc <<= 1
      nbits -= 1
      v
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def decode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.value(h.valPtr(l) + code - h.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      bad()
    }
  }

  /** Sign extension per JPEG F.2.2.1: an s-bit value v is negative when its
    * top bit is 0. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int,
                                var dcTab: Int = 0, var acTab: Int = 0,
                                var pred: Int = 0, var plane: Array[Byte] = null,
                                var planeW: Int = 0, var planeH: Int = 0)

  def decodeJpeg(p: Array[Byte]): Option[Raster] = {
    if (p == null || p.length < 4 || (p(0) & 0xff) != 0xff ||
      (p(1) & 0xff) != 0xd8) return None
    try Some(run(p)) catch {
      case _: Bad | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }
  }

  private def run(p: Array[Byte]): Raster = {
    def u8(i: Int) = if (i < p.length) p(i) & 0xff else bad()
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)

    val quant = Array.ofDim[Int](4, 64)
    val quantSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var i = 2
    var scanAt = -1

    while (scanAt < 0) {
      if (u8(i) != 0xff) bad()
      var m = u8(i + 1)
      while (m == 0xff) { i += 1; m = u8(i + 1) } // legal fill bytes
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { i += 2 }
      else if (m == 0xd9) bad() // EOI before any scan
      else {
        val len = be16(i + 2)
        if (len < 2 || i + 2 + len > p.length) bad()
        val seg = i + 4
        m match {
          case 0xdb => // DQT — possibly several tables in one segment
            var q = seg
            while (q < i + 2 + len) {
              val pq = u8(q) >> 4
              val tq = u8(q) & 15
              if (tq > 3 || pq > 1) bad()
              var k = 0
              q += 1
              while (k < 64) {
                quant(tq)(k) = if (pq == 1) { val v = be16(q); q += 2; v }
                else { val v = u8(q); q += 1; v }
                if (quant(tq)(k) <= 0) bad()
                k += 1
              }
              quantSeen(tq) = true
            }
          case 0xc4 => // DHT — possibly several tables
            var q = seg
            while (q < i + 2 + len) {
              val tc = u8(q) >> 4
              val th = u8(q) & 15
              if (tc > 1 || th > 3) bad()
              val bits = new Array[Int](17)
              var total = 0
              for (l <- 1 to 16) { bits(l) = u8(q + l); total += bits(l) }
              if (total > 256 || q + 17 + total > i + 2 + len) bad()
              val vals = new Array[Byte](total)
              System.arraycopy(p, q + 17, vals, 0, total)
              val h = new Huff(bits, vals)
              if (tc == 0) dcTabs(th) = h else acTabs(th) = h
              q += 17 + total
            }
          case 0xc0 | 0xc1 => // SOF0/1: baseline + extended sequential
            if (u8(seg) != 8) bad() // 8-bit precision only
            height = be16(seg + 1)
            width = be16(seg + 3)
            val n = u8(seg + 5)
            if (width <= 0 || height <= 0 || width > (1 << 20) ||
              height > (1 << 20) || (n != 1 && n != 3)) bad()
            comps = Array.tabulate(n) { c =>
              val o = seg + 6 + c * 3
              val comp = Comp(u8(o), u8(o + 1) >> 4, u8(o + 1) & 15, u8(o + 2))
              if (comp.h < 1 || comp.h > 2 || comp.v < 1 || comp.v > 2 ||
                comp.tq > 3) bad()
              comp
            }
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            bad() // progressive / lossless / arithmetic: unsupported
          case 0xdd => // DRI
            restartInterval = be16(seg)
          case 0xda => // SOS
            if (comps == null) bad()
            val ns = u8(seg)
            if (ns != comps.length) bad()
            for (c <- 0 until ns) {
              val cs = u8(seg + 1 + c * 2)
              val tt = u8(seg + 2 + c * 2)
              val comp = comps.find(_.id == cs).getOrElse(bad())
              comp.dcTab = tt >> 4
              comp.acTab = tt & 15
            }
            scanAt = i + 2 + len
          case _ => // APPn / COM / others: skip
        }
        if (scanAt < 0) i += 2 + len
      }
    }

    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcuW = 8 * hmax
    val mcuH = 8 * vmax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    for (c <- comps) {
      if (!quantSeen(c.tq)) bad()
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      val sz = c.planeW.toLong * c.planeH
      if (sz > Int.MaxValue) bad()
      c.plane = new Array[Byte](sz.toInt)
    }

    val br = new BitReader(p, scanAt)
    val coef = new Array[Int](64)
    val tmp = Array.ofDim[Double](8, 8)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) bad()
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      for (c <- comps; bv <- 0 until c.v; bh <- 0 until c.h) {
        val dc = dcTabs(c.dcTab)
        val ac = acTabs(c.acTab)
        if (dc == null || ac == null) bad()
        java.util.Arrays.fill(coef, 0)
        val q = quant(c.tq)
        val t = br.decode(dc)
        if (t > 11) bad()
        c.pred += extend(br.bits(t), t)
        coef(0) = c.pred * q(0)
        var k = 1
        var eob = false
        while (!eob && k < 64) {
          val rs = br.decode(ac)
          val r = rs >> 4
          val s = rs & 15
          if (s == 0) {
            if (r == 15) k += 16 else eob = true
          } else {
            k += r
            if (k > 63) bad()
            coef(Zigzag(k)) = extend(br.bits(s), s) * q(k)
            k += 1
          }
        }
        // NOTE on truncation: a severely truncated scan fails here via an
        // invalid Huffman code (-> None); a scan cut within the last few
        // MCUs decodes its tail from zero-fill, matching libjpeg's
        // recover-don't-crash convention (the bit reader legitimately
        // reads ahead into the trailing marker, so a strict
        // saw-marker-early check would reject valid streams).
        // separable IDCT: rows then columns
        var x = 0
        while (x < 8) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var u = 0
            while (u < 8) { s += Cos(u)(x) * coef(v * 8 + u); u += 1 }
            tmp(x)(v) = s
            v += 1
          }
          x += 1
        }
        val bx0 = (mx * c.h + bh) * 8
        val by0 = (my * c.v + bv) * 8
        x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            var s = 0.0
            var v = 0
            while (v < 8) { s += Cos(v)(y) * tmp(x)(v); v += 1 }
            val px = math.round(s + 128.0).toInt
            val clamped = if (px < 0) 0 else if (px > 255) 255 else px
            c.plane((by0 + y) * c.planeW + bx0 + x) = clamped.toByte
            y += 1
          }
          x += 1
        }
      }
      mcu += 1
    }

    if (comps.length == 1) {
      val c = comps(0)
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(c.plane, y * c.planeW, out, y * width, width)
        y += 1
      }
      Raster(width, height, 1, out)
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = cy.plane((y * cy.v / vmax) * cy.planeW + x * cy.h / hmax) & 0xff
          val pb = (cb.plane((y * cb.v / vmax) * cb.planeW + x * cb.h / hmax) & 0xff) - 128
          val pr = (cr.plane((y * cr.v / vmax) * cr.planeW + x * cr.h / hmax) & 0xff) - 128
          val r = math.round(yy + 1.402 * pr).toInt
          val g = math.round(yy - 0.344136 * pb - 0.714136 * pr).toInt
          val b = math.round(yy + 1.772 * pb).toInt
          val d = (y * width + x) * 3
          out(d) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          out(d + 1) = (if (g < 0) 0 else if (g > 255) 255 else g).toByte
          out(d + 2) = (if (b < 0) 0 else if (b > 255) 255 else b).toByte
          x += 1
        }
        y += 1
      }
      Raster(width, height, 3, out)
    }
  }

  // ---- fixture encoder ------------------------------------------------

  /** Encode a baseline JFIF whose pixels are EXACTLY reconstructible: a
    * mosaic of flat 8×8 blocks. Block (bx,by) decodes to the flat gray
    * value `gray(bx,by)` in all three channels (4:4:4 YCbCr with Cb=Cr=128,
    * quant all-ones, DC-only coefficients — a DC of 8k IDCTs to k+128 with
    * zero rounding ambiguity). This is a REAL entropy-coded baseline
    * stream (canonical Huffman, byte stuffing, sign-extended DC diffs) —
    * the decoder exercises its full path on it. */
  def encodeJpegGrayBlocks(wBlocks: Int, hBlocks: Int,
                           gray: (Int, Int) => Int,
                           components: Int = 3): Array[Byte] = {
    require(wBlocks > 0 && hBlocks > 0)
    require(components == 1 || components == 3)
    val bos = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bos.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    marker(0xd8) // SOI
    marker(0xdb); w16(2 + 1 + 64); w8(0x00) // DQT: pq=0 tq=0
    for (_ <- 0 until 64) w8(1)
    val wPix = wBlocks * 8
    val hPix = hBlocks * 8
    marker(0xc0); w16(8 + 3 * components); w8(8); w16(hPix); w16(wPix)
    w8(components)
    for (id <- 1 to components) { w8(id); w8(0x11); w8(0) } // 4:4:4, quant 0
    // DHT DC 0: 12 symbols (categories 0..11), all 4-bit codes
    marker(0xc4); w16(2 + 1 + 16 + 12); w8(0x00)
    for (l <- 1 to 16) w8(if (l == 4) 12 else 0)
    for (s <- 0 until 12) w8(s)
    // DHT AC 0: single symbol EOB, 1-bit code "0"
    marker(0xc4); w16(2 + 1 + 16 + 1); w8(0x10)
    for (l <- 1 to 16) w8(if (l == 1) 1 else 0)
    w8(0x00)
    marker(0xda); w16(6 + 2 * components); w8(components)
    for (id <- 1 to components) { w8(id); w8(0x00) }
    w8(0); w8(63); w8(0) // ss/se/ah-al
    // entropy: DC category codes are canonical 4-bit (code == category),
    // AC EOB is the single bit 0
    var acc = 0
    var nbits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    val pred = new Array[Int](3)
    for (by <- 0 until hBlocks; bx <- 0 until wBlocks; c <- 0 until components) {
      val target = if (c == 0) (gray(bx, by) - 128) * 8 else 0
      val diff = target - pred(c)
      pred(c) = target
      var s = 0
      var a = math.abs(diff)
      while (a != 0) { s += 1; a >>= 1 }
      put(s, 4) // DC category (canonical code == category value)
      if (s > 0) put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      put(0, 1) // AC: EOB
    }
    if (nbits > 0) { // pad with 1s per spec
      while (nbits != 0) put(1, 1)
    }
    marker(0xd9) // EOI
    bos.toByteArray
  }
}
