package graft.operators

/** Dependency-free JPEG (JFIF) decoder: marker parse, canonical Huffman
  * entropy decode, dequantize + dezigzag, separable floating IDCT,
  * nearest-neighbor chroma upsampling, YCbCr→RGB. Covers baseline and
  * extended sequential DCT (SOF0/SOF1) plus progressive DCT (SOF2 —
  * spectral selection, successive approximation, DC/AC first and
  * refinement scans with EOB runs, per G.1.2 and the libjpeg
  * correction-bit algorithm), 8-bit, 1 or 3 components, sampling factors
  * ≤ 2, restart markers, byte stuffing. Arithmetic coding, 12-bit,
  * lossless/differential modes, and CMYK return None.
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

  private[operators] final class Bad extends RuntimeException(null, null, false, false)
  private[operators] def bad(): Nothing = throw new Bad

  private[operators] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** c(u)(x) = C(u)/2 * cos((2x+1)uπ/16) — the separable 1-D IDCT basis. */
  private[operators] val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private[operators] final class Huff(bits: Array[Int], vals: Array[Byte]) {
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

  private[operators] final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var sawMarker: Int = -1 // marker byte seen (e.g. 0xD9), stops the scan

    def reset(): Unit = { acc = 0; nbits = 0 }

    /** Consume the next restart marker RSTn. The reader may already have
      * read ahead into the marker (fill() tops up 4 bytes at a time), or
      * may still sit on the interval's pad bits / a trailing FF00 stuff
      * pair — per the resync convention (libjpeg next_marker) bytes before
      * the marker are discardable, so scan forward; any non-RST marker
      * found instead means the stream is corrupt here. */
    def restart(): Boolean = {
      reset()
      var i = pos
      while (i + 1 < p.length) {
        if ((p(i) & 0xff) == 0xff) {
          val m = p(i + 1) & 0xff
          if (m >= 0xd0 && m <= 0xd7) { pos = i + 2; sawMarker = -1; return true }
          if (m != 0x00 && m != 0xff) return false
          i += (if (m == 0x00) 2 else 1)
        } else i += 1
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
  private[operators] def extend(v: Int, s: Int): Int =
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
    var progressive = false
    // progressive state: per-comp coefficient buffers in ZIGZAG order,
    // one 64-slot run per block on the MCU-padded grid, filled across scans
    var coefs: Array[Array[Int]] = null
    var padW: Array[Int] = null
    var padH: Array[Int] = null
    var mcusX = 0
    var mcusY = 0
    var hmax = 0
    var vmax = 0
    var scansSeen = 0
    var i = 2
    var scanAt = -1

    def setupGeometry(): Unit = {
      hmax = comps.map(_.h).max
      vmax = comps.map(_.v).max
      mcusX = (width + 8 * hmax - 1) / (8 * hmax)
      mcusY = (height + 8 * vmax - 1) / (8 * vmax)
      for (c <- comps) {
        c.planeW = mcusX * c.h * 8
        c.planeH = mcusY * c.v * 8
        if (c.planeW.toLong * c.planeH > Int.MaxValue) bad()
      }
    }

    while (scanAt < 0 && !(progressive && scansSeen > 0 && u8(i) == 0xff &&
        u8(i + 1) == 0xd9)) {
      if (u8(i) != 0xff) bad()
      var m = u8(i + 1)
      while (m == 0xff) { i += 1; m = u8(i + 1) } // legal fill bytes
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { i += 2 }
      else if (m == 0xd9) bad() // EOI before any (baseline) scan
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
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 baseline+extended, SOF2 progressive
            if (comps != null) bad() // one frame only
            progressive = m == 0xc2
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
            if (progressive) {
              setupGeometry()
              padW = comps.map(c => mcusX * c.h)
              padH = comps.map(c => mcusY * c.v)
              coefs = comps.indices.toArray.map { ci =>
                val blocks = padW(ci).toLong * padH(ci)
                if (blocks * 64 > Int.MaxValue / 2) bad()
                new Array[Int](blocks.toInt * 64)
              }
            }
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            bad() // lossless / arithmetic / differential: unsupported
          case 0xdd => // DRI
            restartInterval = be16(seg)
          case 0xda => // SOS
            if (comps == null) bad()
            val ns = u8(seg)
            if (ns < 1 || ns > comps.length) bad()
            val scanComps = Array.tabulate(ns) { c =>
              val cs = u8(seg + 1 + c * 2)
              val tt = u8(seg + 2 + c * 2)
              val comp = comps.find(_.id == cs).getOrElse(bad())
              comp.dcTab = tt >> 4
              comp.acTab = tt & 15
              comp
            }
            val ss = u8(seg + 1 + ns * 2)
            val se = u8(seg + 2 + ns * 2)
            val ahal = u8(seg + 3 + ns * 2)
            if (progressive) {
              val endAt = progressiveScan(p, i + 2 + len, scanComps, comps,
                coefs, padW, padH, mcusX, mcusY, dcTabs, acTabs,
                restartInterval, width, height, hmax, vmax,
                ss, se, ahal >> 4, ahal & 15)
              scansSeen += 1
              i = endAt
            } else {
              if (ns != comps.length) bad()
              scanAt = i + 2 + len
            }
          case _ => // APPn / COM / others: skip
        }
        if (scanAt < 0 && m != 0xda) i += 2 + len
        else if (scanAt < 0 && m == 0xda && !progressive) ()
      }
    }

    if (progressive) {
      // all scans consumed: dequantize + IDCT every (padded-grid) block
      for (c <- comps) {
        if (!quantSeen(c.tq)) bad()
        c.plane = new Array[Byte](c.planeW * c.planeH)
      }
      val nat = new Array[Int](64)
      val tmp = Array.ofDim[Double](8, 8)
      for (ci <- comps.indices) {
        val c = comps(ci)
        val q = quant(c.tq)
        val raw = coefs(ci)
        var by = 0
        while (by < padH(ci)) {
          var bx = 0
          while (bx < padW(ci)) {
            val base = (by * padW(ci) + bx) * 64
            var k = 0
            while (k < 64) { nat(Zigzag(k)) = raw(base + k) * q(k); k += 1 }
            idctTo(nat, c.plane, c.planeW, bx * 8, by * 8, tmp)
            bx += 1
          }
          by += 1
        }
      }
      return assemble(comps, width, height, hmax, vmax)
    }

    setupGeometry()
    for (c <- comps) {
      if (!quantSeen(c.tq)) bad()
      c.plane = new Array[Byte](c.planeW * c.planeH)
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
        idctTo(coef, c.plane, c.planeW,
          (mx * c.h + bh) * 8, (my * c.v + bv) * 8, tmp)
      }
      mcu += 1
    }
    assemble(comps, width, height, hmax, vmax)
  }

  /** One progressive (SOF2) scan: spectral selection [ss, se] at
    * successive-approximation (ah, al), accumulating into the per-comp
    * zigzag-order coefficient buffers. DC scans may be interleaved (all
    * components, MCU order) or single-component; AC scans are single-
    * component over the real block grid per G.1.2. Refinement follows the
    * libjpeg correction-bit algorithm. Returns the offset of the next
    * marker. */
  private def progressiveScan(p: Array[Byte], dataAt: Int,
      scanComps: Array[Comp], comps: Array[Comp],
      coefs: Array[Array[Int]], padW: Array[Int], padH: Array[Int],
      mcusX: Int, mcusY: Int, dcTabs: Array[Huff], acTabs: Array[Huff],
      restartInterval: Int, width: Int, height: Int, hmax: Int, vmax: Int,
      ss: Int, se: Int, ah: Int, al: Int): Int = {
    if (ss < 0 || se > 63 || ss > se || al > 13 || ah > 14) bad()
    val br = new BitReader(p, dataAt)
    var eobrun = 0
    scanComps.foreach(_.pred = 0)

    def ciOf(c: Comp): Int = comps.indexWhere(_ eq c)
    def blockBase(ci: Int, bx: Int, by: Int): Int = (by * padW(ci) + bx) * 64

    def decodeDc(c: Comp, ci: Int, bx: Int, by: Int): Unit = {
      if (bx >= padW(ci) || by >= padH(ci)) bad()
      val at = blockBase(ci, bx, by)
      if (ah == 0) {
        val dc = dcTabs(c.dcTab)
        if (dc == null) bad()
        val t = br.decode(dc)
        if (t > 11) bad()
        c.pred += extend(br.bits(t), t)
        coefs(ci)(at) = c.pred << al
      } else {
        if (br.bit() == 1) coefs(ci)(at) |= (1 << al) // libjpeg OR semantics
      }
    }

    def acFirst(ac: Huff, raw: Array[Int], base: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      var done = false
      while (!done && k <= se) {
        val rs = br.decode(ac)
        val r = rs >> 4
        val s = rs & 15
        if (s == 0) {
          if (r < 15) {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.bits(r)
            done = true
          } else k += 16
        } else {
          k += r
          if (k > se) bad()
          raw(base + k) = extend(br.bits(s), s) << al
          k += 1
        }
      }
    }

    def acRefine(ac: Huff, raw: Array[Int], base: Int): Unit = {
      val one = 1 << al
      var k = ss
      if (eobrun == 0) {
        var brk = false
        while (!brk && k <= se) {
          val rs = br.decode(ac)
          var r = rs >> 4
          val s = rs & 15
          var newVal = 0
          if (s == 0) {
            if (r < 15) {
              // unlike acFirst, the count INCLUDES the current block: its
              // remaining positions still take correction bits in the tail
              // below, which also does the decrement (libjpeg convention)
              eobrun = 1 << r
              if (r > 0) eobrun += br.bits(r)
              brk = true
            } // r == 15: pass over 16 zero-history positions
          } else {
            if (s != 1) bad()
            newVal = if (br.bit() == 1) one else -one
          }
          if (!brk) {
            var moved = false
            while (!moved && k <= se) {
              val idx = base + k
              if (raw(idx) != 0) {
                if (br.bit() == 1 && (raw(idx) & one) == 0)
                  raw(idx) += (if (raw(idx) > 0) one else -one)
              } else {
                if (r == 0) {
                  if (newVal != 0) raw(idx) = newVal
                  moved = true
                } else r -= 1
              }
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          val idx = base + k
          if (raw(idx) != 0) {
            if (br.bit() == 1 && (raw(idx) & one) == 0)
              raw(idx) += (if (raw(idx) > 0) one else -one)
          }
          k += 1
        }
        eobrun -= 1
      }
    }

    def maybeRestart(unit: Int): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        if (!br.restart()) bad()
        scanComps.foreach(_.pred = 0)
        eobrun = 0
      }

    if (ss == 0) {
      if (se != 0) bad() // DC scan carries only coefficient 0
      if (scanComps.length == comps.length && comps.length > 1) {
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus) {
          maybeRestart(mcu)
          val mx = mcu % mcusX
          val my = mcu / mcusX
          for (c <- comps; bv <- 0 until c.v; bh <- 0 until c.h)
            decodeDc(c, ciOf(c), mx * c.h + bh, my * c.v + bv)
          mcu += 1
        }
      } else {
        for (c <- scanComps) {
          val ci = ciOf(c)
          val bw = ((width * c.h + hmax - 1) / hmax + 7) / 8
          val bh = ((height * c.v + vmax - 1) / vmax + 7) / 8
          var blk = 0
          while (blk < bw * bh) {
            maybeRestart(blk)
            decodeDc(c, ci, blk % bw, blk / bw)
            blk += 1
          }
        }
      }
    } else {
      if (scanComps.length != 1) bad() // AC scans are single-component
      val c = scanComps(0)
      val ci = ciOf(c)
      val ac = acTabs(c.acTab)
      if (ac == null) bad()
      val bw = ((width * c.h + hmax - 1) / hmax + 7) / 8
      val bh = ((height * c.v + vmax - 1) / vmax + 7) / 8
      var blk = 0
      while (blk < bw * bh) {
        maybeRestart(blk)
        val base = blockBase(ci, blk % bw, blk / bw)
        if (ah == 0) acFirst(ac, coefs(ci), base)
        else acRefine(ac, coefs(ci), base)
        blk += 1
      }
    }

    // skip to the next marker (tolerating unconsumed padding bits)
    var i = br.pos
    while (i + 1 < p.length && !((p(i) & 0xff) == 0xff && {
      val m = p(i + 1) & 0xff
      m != 0 && !(m >= 0xd0 && m <= 0xd7)
    })) i += 1
    if (i + 1 >= p.length) bad()
    i
  }

  /** Separable IDCT of one natural-order coefficient block into a plane
    * at (bx0, by0), with level shift and clamp. */
  private[operators] def idctTo(coef: Array[Int], plane: Array[Byte], planeW: Int,
                     bx0: Int, by0: Int, tmp: Array[Array[Double]]): Unit = {
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
    x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += Cos(v)(y) * tmp(x)(v); v += 1 }
        val px = math.round(s + 128.0).toInt
        val clamped = if (px < 0) 0 else if (px > 255) 255 else px
        plane((by0 + y) * planeW + bx0 + x) = clamped.toByte
        y += 1
      }
      x += 1
    }
  }

  /** 12-bit twin of [[idctTo]]: level shift 2^11, clamp to [0, 4095],
    * Int plane (samples exceed a byte). Shared with [[Jpeg12]]. */
  private[operators] def idct12To(coef: Array[Int], plane: Array[Int],
                     planeW: Int, bx0: Int, by0: Int,
                     tmp: Array[Array[Double]]): Unit = {
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
    x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += Cos(v)(y) * tmp(x)(v); v += 1 }
        val px = math.round(s + 2048.0).toInt
        val clamped = if (px < 0) 0 else if (px > 4095) 4095 else px
        plane((by0 + y) * planeW + bx0 + x) = clamped
        y += 1
      }
      x += 1
    }
  }

  /** Crop component planes to the image and convert to the output raster:
    * grayscale pass-through for one component, nearest-neighbor chroma
    * upsample + YCbCr→RGB for three. */
  private def assemble(comps: Array[Comp], width: Int, height: Int,
                       hmax: Int, vmax: Int): Raster = {
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

  /** The progressive (SOF2) twin of [[encodeJpegGrayBlocks]]: the SAME
    * flat-block mosaic, but entropy-coded across four scans — DC first at
    * point transform 1, DC refinement delivering the low bit, then one
    * all-EOB-run AC scan per component. Decoded pixels are identical to
    * the baseline fixture's, so the m03 oracle formula covers both
    * encodings; what changes is the decode path exercised: multi-scan
    * coefficient accumulation, successive-approximation DC, and
    * multi-block EOB runs. */
  def encodeJpegGrayBlocksProgressive(wBlocks: Int, hBlocks: Int,
                                      gray: (Int, Int) => Int,
                                      components: Int = 3): Array[Byte] = {
    require(wBlocks > 0 && hBlocks > 0)
    require(components == 1 || components == 3)
    val bos = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bos.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    var acc = 0
    var nbits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = while (nbits != 0) put(1, 1)

    marker(0xd8) // SOI
    marker(0xdb); w16(2 + 1 + 64); w8(0x00)
    for (_ <- 0 until 64) w8(1)
    marker(0xc2); w16(8 + 3 * components); w8(8) // SOF2
    w16(hBlocks * 8); w16(wBlocks * 8); w8(components)
    for (id <- 1 to components) { w8(id); w8(0x11); w8(0) }
    // DHT DC 0: categories 0..11 as 4-bit codes (code == category)
    marker(0xc4); w16(2 + 1 + 16 + 12); w8(0x00)
    for (l <- 1 to 16) w8(if (l == 4) 12 else 0)
    for (s <- 0 until 12) w8(s)
    // DHT AC 0: EOB-run symbols r<<4 for r=0..14, 4-bit codes (code == r)
    marker(0xc4); w16(2 + 1 + 16 + 15); w8(0x10)
    for (l <- 1 to 16) w8(if (l == 4) 15 else 0)
    for (r <- 0 until 15) w8(r << 4)

    def sos(ids: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); w16(6 + 2 * ids.length); w8(ids.length)
      for (id <- ids) { w8(id); w8(0x00) }
      w8(ss); w8(se); w8((ah << 4) | al)
    }
    def target(bx: Int, by: Int, c: Int): Int =
      if (c == 0) (gray(bx, by) - 128) * 8 else 0

    // scan 1: DC first, al=1 — diffs of the arithmetic-shifted DC
    sos(1 to components, 0, 0, 0, 1)
    val pred = new Array[Int](3)
    for (by <- 0 until hBlocks; bx <- 0 until wBlocks; c <- 0 until components) {
      val t = target(bx, by, c) >> 1
      val diff = t - pred(c)
      pred(c) = t
      var s = 0
      var a = math.abs(diff)
      while (a != 0) { s += 1; a >>= 1 }
      put(s, 4)
      if (s > 0) put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    }
    flush()

    // scan 2: DC refinement, ah=1 al=0 — one raw low bit per block
    sos(1 to components, 0, 0, 1, 0)
    for (by <- 0 until hBlocks; bx <- 0 until wBlocks; c <- 0 until components)
      put(target(bx, by, c) & 1, 1)
    flush()

    // scans 3..: one AC first scan per component, all zeros -> one EOB run
    for (id <- 1 to components) {
      sos(Seq(id), 1, 63, 0, 0)
      var n = wBlocks * hBlocks // blocks in this component's grid (4:4:4)
      while (n > 0) {
        var r = 0
        while (r < 14 && (2 << r) <= n) r += 1
        val count = math.min(n, (2 << r) - 1)
        put(r << 4, 4) // canonical: code == r
        if (r > 0) put(count - (1 << r), r)
        n -= count
      }
      flush()
    }
    marker(0xd9)
    bos.toByteArray
  }
}
