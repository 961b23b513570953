package graft.operators

/** Baseline TIFF 6.0 decode (+ fixture encoder) — the archival/scientific
  * imaging format scan corpora actually carry (document scans, microscopy,
  * DICOM exports). Dependency-free, both byte orders ("II" little / "MM"
  * big endian), IFD walk with inline-or-offset values, 8-bit gray and RGB
  * at PlanarConfiguration=1, strip organization, and the three baseline
  * compressions:
  *
  *  - 1 none
  *  - 32773 PackBits (run-length)
  *  - 8 Deflate/zlib (and the old 32946 alias) via `java.util.zip`
  *  - 5 LZW — the TIFF variant: MSB-first bit packing AND the "early
  *    change" (code width bumps when the next free code reaches
  *    2^bits - 1, one code earlier than GIF's table-full rule — the
  *    classic interop bug this implementation gets right, cross-checked
  *    against the JDK's independent ImageIO TIFF plugin in the spec),
  *    with optional horizontal-differencing Predictor=2.
  *
  * Failure stance (codec-family contract): malformed structure, strip
  * overruns, bad LZW codes, unsupported layouts → None, never a throw;
  * dimensions are allocation-guarded. Cited reference behavior: the
  * reference pipeline ingests raw binary file content
  * (`dlt_sources/m365/__init__.py:22-62`); decode here runs distributed,
  * per partition.
  */
object TiffCodec {

  /** Guard on decoded pixel bytes. */
  final val MaxPixelBytes: Int = 1 << 26 // 64 MiB

  // ---- decode ---------------------------------------------------------

  def decode(p: Array[Byte]): Option[RasterCodec.Raster] =
    decodePage(p, 0)

  /** Multi-page support: absolute offsets of every IFD in next-pointer
    * order (empty when not a TIFF; cycle-capped). */
  def ifdOffsets(p: Array[Byte]): IndexedSeq[Long] = {
    if (p == null || p.length < 8) return IndexedSeq.empty
    val le =
      if (p(0) == 'I' && p(1) == 'I') true
      else if (p(0) == 'M' && p(1) == 'M') false
      else return IndexedSeq.empty
    def u8(i: Int): Int = p(i) & 0xff
    def u16(i: Int): Int =
      if (i < 0 || i + 2 > p.length) -1
      else if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (i < 0 || i + 4 > p.length) -1L
      else if (le) u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    if (u16(2) != 42) return IndexedSeq.empty
    val out = IndexedSeq.newBuilder[Long]
    var at = u32(4)
    var pages = 0
    while (at >= 8 && at + 2 <= p.length && pages < 4096) {
      val n = u16(at.toInt)
      if (n <= 0 || at + 2 + n * 12L + 4 > p.length) return out.result()
      out += at
      pages += 1
      at = u32((at + 2 + n * 12L).toInt)
    }
    out.result()
  }

  def pageCount(p: Array[Byte]): Int = ifdOffsets(p).length

  /** Decode page `page` (0-based) of a possibly multi-page TIFF. */
  def decodePage(p: Array[Byte], page: Int): Option[RasterCodec.Raster] = {
    if (p == null || p.length < 8 || page < 0) return None
    val le =
      if (p(0) == 'I' && p(1) == 'I') true
      else if (p(0) == 'M' && p(1) == 'M') false
      else return None
    def u8(i: Int): Int = p(i) & 0xff
    def u16(i: Int): Int =
      if (i < 0 || i + 2 > p.length) -1
      else if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (i < 0 || i + 4 > p.length) -1L
      else if (le) u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    if (u16(2) != 42) return None
    val ifds = ifdOffsets(p)
    if (page >= ifds.length) return None
    val ifdAt = ifds(page)
    if (ifdAt < 8 || ifdAt + 2 > p.length) return None
    val nEntries = u16(ifdAt.toInt)
    if (nEntries <= 0 || ifdAt + 2 + nEntries * 12L > p.length) return None

    // Collect tag values as Long sequences (SHORT/LONG/BYTE only — all
    // baseline tags we honor use those types).
    def typeSize(t: Int): Int = t match {
      case 1 => 1; case 3 => 2; case 4 => 4; case _ => -1
    }
    def values(entryAt: Int): Option[IndexedSeq[Long]] = {
      val t = u16(entryAt + 2)
      val n = u32(entryAt + 4)
      val sz = typeSize(t)
      if (sz < 0 || n < 0 || n > (1 << 20)) return None
      val total = sz * n
      val at = if (total <= 4) entryAt + 8 else u32(entryAt + 8).toInt
      if (at < 0 || at + total > p.length) return None
      Some((0L until n).map { k =>
        val o = (at + k * sz).toInt
        sz match {
          case 1 => u8(o).toLong
          case 2 => u16(o).toLong
          case 4 => u32(o)
        }
      })
    }
    var tags = Map.empty[Int, IndexedSeq[Long]]
    var e = 0
    while (e < nEntries) {
      val at = (ifdAt + 2 + e * 12).toInt
      val tag = u16(at)
      values(at) match {
        case Some(vs) => tags += tag -> vs
        case None => if (Set(256, 257, 258, 259, 262, 273, 277, 278, 279,
          284, 317).contains(tag)) return None
      }
      e += 1
    }
    def oneOr(tag: Int, default: Long): Long =
      tags.get(tag).flatMap(_.headOption).getOrElse(default)
    def one(tag: Int): Long =
      tags.get(tag).flatMap(_.headOption).getOrElse(-1L)

    val width = one(256).toInt
    val height = one(257).toInt
    val spp = oneOr(277, 1L).toInt
    if (width <= 0 || height <= 0 || (spp != 1 && spp != 3)) return None
    if (width.toLong * height * spp > MaxPixelBytes) return None
    val bits = tags.getOrElse(258, IndexedSeq.fill(spp)(8L))
    if (bits.length < spp || bits.exists(_ != 8L)) return None
    val compression = oneOr(259, 1L).toInt
    val photometric = one(262).toInt
    val okPhoto = (spp == 1 && (photometric == 0 || photometric == 1)) ||
      (spp == 3 && photometric == 2)
    if (!okPhoto) return None
    if (oneOr(284, 1L) != 1L) return None
    val predictor = oneOr(317, 1L).toInt
    if (predictor != 1 && predictor != 2) return None
    // Predictor is defined for LZW (TIFF6 section 14); mainstream readers
    // (incl. ImageIO) ignore it elsewhere — honor it only for LZW
    val applyPredictor = predictor == 2 &&
      (compression == 5 || compression == 8 || compression == 32946)
    val rowsPerStrip = math.min(oneOr(278, height.toLong), height.toLong).toInt
    if (rowsPerStrip <= 0) return None
    val offsets = tags.getOrElse(273, return None)
    val counts = tags.getOrElse(279, return None)
    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    if (offsets.length != nStrips || counts.length != nStrips) return None

    val rowBytes = width * spp
    val out = new Array[Byte](height * rowBytes)
    var strip = 0
    while (strip < nStrips) {
      val rows = math.min(rowsPerStrip, height - strip * rowsPerStrip)
      val expect = rows * rowBytes
      val off = offsets(strip)
      val cnt = counts(strip)
      if (off < 0 || cnt < 0 || off + cnt > p.length) return None
      val raw = java.util.Arrays.copyOfRange(p, off.toInt, (off + cnt).toInt)
      val data = compression match {
        case 1 => if (raw.length < expect) return None else raw
        case 32773 => unpackBits(raw, expect).getOrElse(return None)
        case 5 => lzwDecode(raw, expect).getOrElse(return None)
        case 8 | 32946 => inflate(raw, expect).getOrElse(return None)
        case _ => return None
      }
      if (applyPredictor) undiff(data, rows, width, spp)
      System.arraycopy(data, 0, out, strip * rowsPerStrip * rowBytes, expect)
      strip += 1
    }
    // WhiteIsZero gray inverts to the BlackIsZero convention
    if (photometric == 0) {
      var i = 0
      while (i < out.length) { out(i) = (255 - (out(i) & 0xff)).toByte; i += 1 }
    }
    Some(RasterCodec.Raster(width, height, spp, out))
  }

  /** Light header sniff: (width, height) via the same IFD walk. */
  def sniffDims(p: Array[Byte]): Option[(Int, Int)] =
    decodeDimsOnly(p)

  private def decodeDimsOnly(p: Array[Byte]): Option[(Int, Int)] = {
    // Full structural walk is cheap (header-only); reuse decode's parsing
    // by accepting any compression and skipping pixel work would complicate
    // the code — the IFD alone is parsed here.
    if (p == null || p.length < 8) return None
    val le =
      if (p(0) == 'I' && p(1) == 'I') true
      else if (p(0) == 'M' && p(1) == 'M') false
      else return None
    def u8(i: Int): Int = p(i) & 0xff
    def u16(i: Int): Int =
      if (i + 2 > p.length) -1
      else if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (i + 4 > p.length) -1L
      else if (le) u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    if (u16(2) != 42) return None
    val ifdAt = u32(4)
    if (ifdAt < 8 || ifdAt + 2 > p.length) return None
    val n = u16(ifdAt.toInt)
    var w = -1L
    var h = -1L
    var e = 0
    while (e < n) {
      val at = (ifdAt + 2 + e * 12).toInt
      if (at + 12 > p.length) return None
      val tag = u16(at)
      val t = u16(at + 2)
      if (tag == 256 || tag == 257) {
        val v = if (t == 3) u16(at + 8).toLong else u32(at + 8)
        if (tag == 256) w = v else h = v
      }
      e += 1
    }
    if (w > 0 && h > 0) Some((w.toInt, h.toInt)) else None
  }

  /** PackBits expansion to exactly `expect` bytes. */
  private def unpackBits(raw: Array[Byte], expect: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](expect)
    var i = 0
    var o = 0
    while (i < raw.length && o < expect) {
      val n = raw(i)
      i += 1
      if (n >= 0) {
        val len = n + 1
        if (i + len > raw.length || o + len > expect) return None
        System.arraycopy(raw, i, out, o, len)
        i += len; o += len
      } else if (n != -128) {
        val len = 1 - n
        if (i >= raw.length || o + len > expect) return None
        java.util.Arrays.fill(out, o, o + len, raw(i))
        i += 1; o += len
      } // -128: no-op
    }
    if (o == expect) Some(out) else None
  }

  /** TIFF LZW decode (MSB-first, early change) to exactly `expect` bytes. */
  private def lzwDecode(raw: Array[Byte], expect: Int): Option[Array[Byte]] = {
    val Clear = 256
    val Eoi = 257
    val out = new Array[Byte](expect)
    var o = 0
    var bitPos = 0
    val nBits = raw.length * 8
    var codeBits = 9
    def read(): Int = {
      if (bitPos + codeBits > nBits) return -1
      var v = 0
      var k = 0
      while (k < codeBits) {
        val b = (raw(bitPos >> 3) >> (7 - (bitPos & 7))) & 1
        v = (v << 1) | b
        bitPos += 1; k += 1
      }
      v
    }
    // table entries as (prefix code, appended byte); first-byte chase for
    // output without materializing strings
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    val length = new Array[Int](4096)
    var next = 258
    def reset(): Unit = { next = 258; codeBits = 9 }
    def emit(code: Int): Boolean = { // writes table string ending at o
      var len = if (code < 256) 1 else length(code)
      if (o + len > expect) return false
      var c = code
      var at = o + len - 1
      while (len > 0) {
        if (c < 256) { out(at) = c.toByte; c = -1 }
        else { out(at) = append(c); c = prefix(c) }
        at -= 1; len -= 1
      }
      o += (if (code < 256) 1 else length(code))
      true
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= 258) c = prefix(c)
      c.toByte
    }
    reset()
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return None
      if (code == Eoi) done = true
      else if (code == Clear) { reset(); prev = -1 }
      else if (prev < 0) {
        if (code >= 256) return None
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > next || code == Clear) return None
        val cur =
          if (code < next) code
          else { // KwKwK: the not-yet-defined code
            if (next >= 4096) return None
            prefix(next) = prev; append(next) = firstByte(prev)
            length(next) = (if (prev < 256) 1 else length(prev)) + 1
            next
          }
        if (code < next) {
          if (next < 4096) {
            prefix(next) = prev; append(next) = firstByte(cur)
            length(next) = (if (prev < 256) 1 else length(prev)) + 1
          }
        }
        if (next < 4096) next += 1
        if (!emit(cur)) return None
        prev = cur
        // TIFF early change: bump when the NEXT free code reaches 2^b - 1
        if (next == (1 << codeBits) - 1 && codeBits < 12) codeBits += 1
      }
      if (o == expect && !done) {
        // spec requires EOI next (possibly after padding); accept as done
        done = true
      }
    }
    if (o == expect) Some(out) else None
  }

  /** Zlib (Deflate/Adler) strip expansion — TIFF compression 8 (and the
    * old 32946 alias), `java.util.zip`. */
  private def inflate(raw: Array[Byte], expect: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new Array[Byte](expect)
      var o = 0
      while (o < expect && !inf.finished()) {
        val n =
          try inf.inflate(out, o, expect - o)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (n == 0 && !inf.finished()) return None
        o += n
      }
      if (o == expect) Some(out) else None
    } finally inf.end()
  }

  private def deflate(plain: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(plain); d.finish()
    val buf = new Array[Byte](plain.length + 64)
    val bos = new java.io.ByteArrayOutputStream()
    while (!d.finished()) {
      val n = d.deflate(buf)
      bos.write(buf, 0, n)
    }
    d.end()
    bos.toByteArray
  }

  /** Reverse Predictor=2 (horizontal differencing) in place. */
  private def undiff(data: Array[Byte], rows: Int, width: Int, spp: Int): Unit = {
    var r = 0
    while (r < rows) {
      val base = r * width * spp
      var x = 1
      while (x < width) {
        var c = 0
        while (c < spp) {
          val i = base + x * spp + c
          data(i) = (data(i) + data(i - spp)).toByte
          c += 1
        }
        x += 1
      }
      r += 1
    }
  }

  // ---- fixture encoder ------------------------------------------------

  /** Encode a baseline TIFF: 8-bit gray (channels=1, PhotometricInterp 1)
    * or RGB (channels=3), one or more strips, compression 1/5/32773,
    * optional Predictor=2 (applied for any compression here; readers
    * honor the tag regardless). */
  /** One page of a (possibly multi-page) TIFF fixture. */
  final case class Page(width: Int, height: Int, channels: Int,
                        data: Array[Byte], compression: Int = 1,
                        rowsPerStrip: Int = Int.MaxValue, predictor: Int = 1)

  def encode(width: Int, height: Int, channels: Int, data: Array[Byte],
             compression: Int = 1, bigEndian: Boolean = false,
             rowsPerStrip: Int = Int.MaxValue,
             predictor: Int = 1): Array[Byte] =
    encodeMultiPage(Seq(Page(width, height, channels, data, compression,
      rowsPerStrip, predictor)), bigEndian)

  /** Encode a multi-page TIFF (scan-corpus page chains): each page is a
    * self-contained segment [IFD][value arrays][strips] whose IFD's
    * next-pointer links to the following page's segment. */
  def encodeMultiPage(pages: Seq[Page], bigEndian: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty)
    val prepared = pages.map { pg =>
      require(pg.channels == 1 || pg.channels == 3)
      require(pg.data.length == pg.width * pg.height * pg.channels)
      require(Set(1, 5, 8, 32773).contains(pg.compression))
      require(pg.predictor == 1 || pg.compression == 5 || pg.compression == 8,
        "Predictor=2 is defined for LZW/Deflate only")
      val rps = math.min(pg.rowsPerStrip, pg.height)
      val nStrips = (pg.height + rps - 1) / rps
      val rowBytes = pg.width * pg.channels
      val strips = (0 until nStrips).map { st =>
        val rows = math.min(rps, pg.height - st * rps)
        val plain = java.util.Arrays.copyOfRange(pg.data,
          st * rps * rowBytes, st * rps * rowBytes + rows * rowBytes)
        if (pg.predictor == 2 &&
            (pg.compression == 5 || pg.compression == 8))
          diff(plain, rows, pg.width, pg.channels)
        pg.compression match {
          case 1 => plain
          case 32773 => packBits(plain)
          case 5 => lzwEncode(plain)
          case 8 => deflate(plain)
        }
      }
      (pg, rps, nStrips, strips)
    }
    val segSizes = prepared.map { case (pg, _, nStrips, strips) =>
      val nE = 9 + (if (pg.predictor == 2) 1 else 0)
      (2 + nE * 12 + 4).toLong +
        (if (pg.channels == 3) pg.channels * 2 else 0) +
        (if (nStrips > 1) nStrips * 8L else 0L) +
        strips.map(_.length.toLong).sum
    }
    val bases = segSizes.scanLeft(8L)(_ + _)

    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (bigEndian) { bos.write(v >> 8); bos.write(v & 0xff) }
      else { bos.write(v & 0xff); bos.write(v >> 8) }
    def w32(v: Long): Unit =
      if (bigEndian) { bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
        bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt) }
      else { bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
        bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt) }
    bos.write(if (bigEndian) 'M' else 'I'); bos.write(if (bigEndian) 'M' else 'I')
    w16(42)
    w32(8) // first IFD immediately after the header

    prepared.zipWithIndex.foreach { case ((pg, rps, nStrips, strips), pi) =>
      val base = bases(pi)
      val nextIfd = if (pi == prepared.length - 1) 0L else bases(pi + 1)
      val entries = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Int, Long, Either[Long, Seq[Long]])]
      val needBpsArray = pg.channels == 3 // 3 SHORTs don't fit inline
      val need317 = pg.predictor == 2
      val nE = 9 + (if (need317) 1 else 0)
      val ifdSize = 2 + nE * 12 + 4
      var extraAt = base + ifdSize
      val bpsAt = extraAt
      if (needBpsArray) extraAt += pg.channels * 2
      val offArrayAt = extraAt
      if (nStrips > 1) extraAt += nStrips * 4
      val cntArrayAt = extraAt
      if (nStrips > 1) extraAt += nStrips * 4
      var stripAt = extraAt
      val stripOffsets = strips.map { s0 =>
        val at = stripAt; stripAt += s0.length; at
      }
      entries += ((256, 3, 1L, Left(pg.width.toLong)))
      entries += ((257, 3, 1L, Left(pg.height.toLong)))
      entries += (if (needBpsArray)
        ((258, 3, pg.channels.toLong, Right(Seq.fill(pg.channels)(8L))))
        else ((258, 3, 1L, Left(8L))))
      entries += ((259, 3, 1L, Left(pg.compression.toLong)))
      entries += ((262, 3, 1L, Left(if (pg.channels == 3) 2L else 1L)))
      entries += (if (nStrips > 1) ((273, 4, nStrips.toLong, Right(stripOffsets)))
        else ((273, 4, 1L, Left(stripOffsets.head))))
      entries += ((277, 3, 1L, Left(pg.channels.toLong)))
      entries += ((278, 3, 1L, Left(rps.toLong)))
      entries += (if (nStrips > 1)
        ((279, 4, nStrips.toLong, Right(strips.map(_.length.toLong))))
        else ((279, 4, 1L, Left(strips.head.length.toLong))))
      if (need317) entries += ((317, 3, 1L, Left(2L)))
      val sorted = entries.sortBy(_._1)
      w16(nE)
      sorted.foreach { case (tag, typ, count, v) =>
        w16(tag); w16(typ); w32(count)
        v match {
          case Left(x) =>
            // inline value, left-justified in its 4 bytes per spec
            if (typ == 3) { w16(x.toInt); w16(0) } else w32(x)
          case Right(_) =>
            w32(if (tag == 258) bpsAt
            else if (tag == 273) offArrayAt else cntArrayAt)
        }
      }
      w32(nextIfd)
      if (needBpsArray) (0 until pg.channels).foreach(_ => w16(8))
      if (nStrips > 1) stripOffsets.foreach(w32)
      if (nStrips > 1) strips.foreach(s0 => w32(s0.length.toLong))
      strips.foreach(s0 => bos.write(s0, 0, s0.length))
    }
    bos.toByteArray
  }

  private def diff(data: Array[Byte], rows: Int, width: Int, spp: Int): Unit = {
    var r = 0
    while (r < rows) {
      val base = r * width * spp
      var x = width - 1
      while (x >= 1) {
        var c = 0
        while (c < spp) {
          val i = base + x * spp + c
          data(i) = (data(i) - data(i - spp)).toByte
          c += 1
        }
        x -= 1
      }
      r += 1
    }
  }

  private def packBits(plain: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < plain.length) {
      // find run length at i
      var run = 1
      while (i + run < plain.length && run < 128 && plain(i + run) == plain(i))
        run += 1
      if (run >= 2) {
        bos.write(1 - run) // -(run-1)
        bos.write(plain(i))
        i += run
      } else {
        // literal stretch until a run of >= 3 starts (2-runs inside
        // literals are cheaper left literal)
        var end = i + 1
        var look = end
        var broken = false
        while (look < plain.length && (look - i) < 128 && !broken) {
          if (look + 2 < plain.length && plain(look) == plain(look + 1) &&
              plain(look) == plain(look + 2)) broken = true
          else { look += 1 }
        }
        end = look
        bos.write(end - i - 1)
        bos.write(plain, i, end - i)
        i = end
      }
    }
    bos.toByteArray
  }

  // ---- EXIF (a TIFF IFD embedded in JPEG APP1) ------------------------

  /** IFD0 camera metadata: the fields a multimodal curation pipeline
    * filters/groups on (orientation for rotation-normalization, timestamp
    * for dedup/temporal splits, make/model for source analysis). */
  final case class Exif(orientation: Option[Long], dateTime: Option[String],
                        make: Option[String], model: Option[String])

  /** Parse EXIF out of a JPEG's APP1 segment ("Exif\0\0" + TIFF IFD) —
    * marker walk, no entropy decode; malformed → None, never a throw. */
  def exifTags(jpeg: Array[Byte]): Option[Exif] = {
    if (jpeg == null || jpeg.length < 4) return None
    if ((jpeg(0) & 0xff) != 0xff || (jpeg(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < jpeg.length) {
      if ((jpeg(i) & 0xff) != 0xff) return None
      val m = jpeg(i + 1) & 0xff
      if (m == 0xff) { i += 1 } // fill byte
      else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
      else if (m == 0xda || m == 0xd9) return None // into scan: no APP1 found
      else {
        val len = ((jpeg(i + 2) & 0xff) << 8) | (jpeg(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > jpeg.length) return None
        if (m == 0xe1 && len >= 10 &&
            jpeg(i + 4) == 'E' && jpeg(i + 5) == 'x' && jpeg(i + 6) == 'i' &&
            jpeg(i + 7) == 'f' && jpeg(i + 8) == 0 && jpeg(i + 9) == 0) {
          val tiff = java.util.Arrays.copyOfRange(jpeg, i + 10, i + 2 + len)
          return exifFromTiffIfd(tiff)
        }
        i += 2 + len
      }
    }
    None
  }

  /** IFD0 walk of the embedded TIFF block, SHORT + ASCII values only. */
  private def exifFromTiffIfd(p: Array[Byte]): Option[Exif] = {
    if (p.length < 8) return None
    val le =
      if (p(0) == 'I' && p(1) == 'I') true
      else if (p(0) == 'M' && p(1) == 'M') false
      else return None
    def u8(i: Int): Int = p(i) & 0xff
    def u16(i: Int): Int =
      if (i < 0 || i + 2 > p.length) -1
      else if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (i < 0 || i + 4 > p.length) -1L
      else if (le) u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    if (u16(2) != 42) return None
    val ifdAt = u32(4)
    if (ifdAt < 8 || ifdAt + 2 > p.length) return None
    val n = u16(ifdAt.toInt)
    if (n <= 0 || ifdAt + 2 + n * 12L > p.length) return None
    var orientation: Option[Long] = None
    var dateTime: Option[String] = None
    var make: Option[String] = None
    var model: Option[String] = None
    def ascii(entryAt: Int): Option[String] = {
      val count = u32(entryAt + 4)
      if (count <= 0 || count > 4096) return None
      val at = if (count <= 4) entryAt + 8 else u32(entryAt + 8).toInt
      if (at < 0 || at + count > p.length) return None
      val end = (at + count).toInt
      var e = at.toInt
      while (e < end && p(e) != 0) e += 1
      Some(new String(p, at.toInt, e - at.toInt, "US-ASCII"))
    }
    var e = 0
    while (e < n) {
      val at = (ifdAt + 2 + e * 12).toInt
      val tag = u16(at)
      val typ = u16(at + 2)
      tag match {
        case 274 if typ == 3 =>
          val v = u16(at + 8).toLong
          if (v >= 1 && v <= 8) orientation = Some(v)
        case 306 if typ == 2 => dateTime = ascii(at)
        case 271 if typ == 2 => make = ascii(at)
        case 272 if typ == 2 => model = ascii(at)
        case _ => ()
      }
      e += 1
    }
    Some(Exif(orientation, dateTime, make, model))
  }

  /** Fixture: an APP1 EXIF segment (little-endian IFD0 with Make/Model/
    * Orientation/DateTime) spliced after the SOI of `jpeg` (or a bare
    * SOI+APP1+EOI shell when `jpeg` is empty). */
  def withExif(jpeg: Array[Byte], orientation: Int, dateTime: String,
               make: String, model: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write(v >> 8) }
    def w32(v: Long): Unit = { bos.write((v & 0xff).toInt)
      bos.write(((v >> 8) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
      bos.write(((v >> 24) & 0xff).toInt) }
    bos.write('I'); bos.write('I'); w16(42); w32(8)
    val mk = (make + "\u0000").getBytes("US-ASCII")
    val md = (model + "\u0000").getBytes("US-ASCII")
    val dt = (dateTime + "\u0000").getBytes("US-ASCII")
    val nE = 4
    var extraAt = 8L + 2 + nE * 12 + 4
    val mkAt = extraAt; if (mk.length > 4) extraAt += mk.length
    val mdAt = extraAt; if (md.length > 4) extraAt += md.length
    val dtAt = extraAt
    w16(nE)
    def entry(tag: Int, typ: Int, count: Long, inline: Option[Array[Byte]],
              offset: Long): Unit = {
      w16(tag); w16(typ); w32(count)
      inline match {
        case Some(b) =>
          var k = 0
          while (k < 4) { bos.write(if (k < b.length) b(k) & 0xff else 0); k += 1 }
        case None => w32(offset)
      }
    }
    entry(271, 2, mk.length.toLong, if (mk.length <= 4) Some(mk) else None, mkAt)
    entry(272, 2, md.length.toLong, if (md.length <= 4) Some(md) else None, mdAt)
    entry(274, 3, 1L, Some(Array((orientation & 0xff).toByte,
      ((orientation >> 8) & 0xff).toByte)), 0L)
    entry(306, 2, dt.length.toLong, None, dtAt)
    w32(0)
    if (mk.length > 4) bos.write(mk, 0, mk.length)
    if (md.length > 4) bos.write(md, 0, md.length)
    bos.write(dt, 0, dt.length)
    val tiff = bos.toByteArray
    val app1Len = 2 + 6 + tiff.length
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    out.write(0xff); out.write(0xe1)
    out.write((app1Len >> 8) & 0xff); out.write(app1Len & 0xff)
    out.write('E'); out.write('x'); out.write('i'); out.write('f')
    out.write(0); out.write(0)
    out.write(tiff, 0, tiff.length)
    if (jpeg != null && jpeg.length > 2)
      out.write(jpeg, 2, jpeg.length - 2) // splice the rest after our APP1
    else { out.write(0xff); out.write(0xd9) }
    out.toByteArray
  }

  private def lzwEncode(plain: Array[Byte]): Array[Byte] = {
    val Clear = 256
    val Eoi = 257
    val bos = new java.io.ByteArrayOutputStream()
    var cur = 0
    var curBits = 0
    var codeBits = 9
    def write(code: Int): Unit = {
      cur = (cur << codeBits) | code
      curBits += codeBits
      while (curBits >= 8) {
        bos.write((cur >> (curBits - 8)) & 0xff)
        curBits -= 8
      }
    }
    def flush(): Unit =
      if (curBits > 0) { bos.write((cur << (8 - curBits)) & 0xff); curBits = 0 }
    val table = new java.util.HashMap[Long, Integer]()
    var next = 258
    def resetTable(): Unit = { table.clear(); next = 258 }
    write(Clear)
    var prefixCode = -1
    var i = 0
    while (i < plain.length) {
      val b = plain(i) & 0xff
      if (prefixCode < 0) prefixCode = b
      else {
        val key = (prefixCode.toLong << 8) | b
        val hit = table.get(key)
        if (hit != null) prefixCode = hit.intValue()
        else {
          write(prefixCode)
          table.put(key, Integer.valueOf(next))
          next += 1
          // the encoder runs ONE table entry ahead of the decoder, so its
          // early change fires at 2^b where the decoder's fires at 2^b - 1
          // — the same stream boundary (spec pseudo-code, TIFF6 §13)
          if (next == (1 << codeBits) && codeBits < 12) codeBits += 1
          if (next == 4094) { // table nearly full: restart
            write(Clear)
            codeBits = 9
            resetTable()
          }
          prefixCode = b
        }
      }
      i += 1
    }
    if (prefixCode >= 0) write(prefixCode)
    write(Eoi)
    flush()
    bos.toByteArray
  }
}
