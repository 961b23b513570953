package graft.operators

/** Dependency-free GIF decoder: logical-screen parse, global/local color
  * tables, LZW decompression (variable code width, clear/EOI codes), the
  * four-pass interlace order, and GIF89a extension-block skipping. Decodes
  * the FIRST image frame to RGB — the training-data decode contract (an
  * animation's later frames are sampled by [[Multimodal.sampleFrames]]
  * semantics, not needed for feature extraction).
  *
  * GIF's LZW is lossless, which makes the decode exactly oracle-checkable
  * the same way BMP/PNG are (m01) and JPEG's DC-only mosaics are (m03):
  * the companion [[encodeGif]] writes a real LZW stream (9-bit codes with
  * periodic clear codes — the classic "uncompressed GIF" form every
  * conformant decoder must accept), so a synthetic palette image round-
  * trips bit-exactly through the full parse + LZW + interlace path.
  *
  * Malformed payloads return None — never an exception that would kill a
  * distributed decode job. All sizing arithmetic is in Long (the PNG
  * lesson from round 6's ADVICE: header-declared dims must not wrap Int).
  */
object GifCodec {
  import RasterCodec.Raster

  private final class Bad extends RuntimeException(null, null, false, false)
  private def bad(): Nothing = throw new Bad

  def decodeGif(p: Array[Byte]): Option[Raster] = {
    if (p == null || p.length < 13) return None
    if (!(p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
      (p(4) == '7' || p(4) == '9') && p(5) == 'a')) return None
    try Some(run(p)) catch {
      case _: Bad | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }
  }

  private def run(p: Array[Byte]): Raster = {
    def u8(i: Int) = if (i < p.length) p(i) & 0xff else bad()
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)

    val screenW = le16(6)
    val screenH = le16(8)
    val packed = u8(10)
    var i = 13
    var globalTable: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7) // entries
      globalTable = new Array[Byte](n * 3)
      if (i + n * 3 > p.length) bad()
      System.arraycopy(p, i, globalTable, 0, n * 3)
      i += n * 3
    }

    while (true) {
      u8(i) match {
        case 0x21 => // extension: label + sub-blocks, skip
          i += 2
          while (u8(i) != 0) i += 1 + u8(i)
          i += 1
        case 0x3b => bad() // trailer before any image frame
        case 0x2c => // image descriptor: decode this frame and return
          val left = le16(i + 1)
          val top = le16(i + 3)
          val w = le16(i + 5)
          val h = le16(i + 7)
          val ipacked = u8(i + 9)
          i += 10
          if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15)) bad()
          var table = globalTable
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            table = new Array[Byte](n * 3)
            if (i + n * 3 > p.length) bad()
            System.arraycopy(p, i, table, 0, n * 3)
            i += n * 3
          }
          if (table == null) bad()
          val interlaced = (ipacked & 0x40) != 0

          // LZW: collect the concatenated sub-block data bounds first
          val minCode = u8(i)
          i += 1
          if (minCode < 2 || minCode > 8) bad()
          val data = new java.io.ByteArrayOutputStream()
          while (u8(i) != 0) {
            val n = u8(i)
            if (i + 1 + n > p.length) bad()
            data.write(p, i + 1, n)
            i += 1 + n
          }
          val lz = data.toByteArray
          val nPix = w.toLong * h
          if (nPix > Int.MaxValue / 4) bad()
          val indices = lzwDecode(lz, minCode, nPix.toInt)

          // interlace: pass offsets/steps per the spec
          val rowOrder = new Array[Int](h)
          if (interlaced) {
            var r = 0
            for ((off, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                 y <- off until h by step) { rowOrder(r) = y; r += 1 }
          } else {
            var y = 0
            while (y < h) { rowOrder(y) = y; y += 1 }
          }

          val out = new Array[Byte](w * h * 3)
          val nColors = table.length / 3
          var r = 0
          while (r < h) {
            val y = rowOrder(r)
            var x = 0
            while (x < w) {
              val idx = indices(r * w + x) & 0xff
              if (idx >= nColors) bad()
              val d = (y * w + x) * 3
              out(d) = table(idx * 3)
              out(d + 1) = table(idx * 3 + 1)
              out(d + 2) = table(idx * 3 + 2)
              x += 1
            }
            r += 1
          }
          // left/top offsets beyond the screen are tolerated: the decode
          // contract here is the frame raster itself
          val _ = (screenW, screenH, left, top)
          return Raster(w, h, 3, out)
        case _ => bad()
      }
    }
    bad()
  }

  /** GIF LZW: LSB-first variable-width codes (9..12 bits), dictionary
    * reset on clear, the KwKwK not-yet-in-table case, and deferred-clear
    * streams (table full at 4096: codes keep flowing at 12 bits). */
  private def lzwDecode(d: Array[Byte], minCode: Int, nPix: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](nPix)
    var outAt = 0
    var codeSize = minCode + 1
    var next = eoi + 1
    var prev = -1
    var acc = 0
    var nbits = 0
    var at = 0
    var k = 0
    while (k < clear) { prefix(k) = -1; suffix(k) = k.toByte; k += 1 }

    def firstOf(code: Int): Int = {
      var c = code
      while (prefix(c) >= 0) c = prefix(c)
      suffix(c) & 0xff
    }
    def emit(code: Int): Unit = {
      var c = code
      var sp = 0
      while (c >= 0) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      while (sp > 0 && outAt < nPix) { sp -= 1; out(outAt) = stack(sp); outAt += 1 }
    }

    while (outAt < nPix) {
      while (nbits < codeSize) {
        if (at >= d.length) bad() // stream exhausted before the frame filled
        acc |= (d(at) & 0xff) << nbits
        nbits += 8
        at += 1
      }
      val code = acc & ((1 << codeSize) - 1)
      acc >>>= codeSize
      nbits -= codeSize
      if (code == clear) {
        next = eoi + 1; codeSize = minCode + 1; prev = -1
      } else if (code == eoi) {
        if (outAt < nPix) bad() // EOI before the frame filled
      } else if (prev < 0) {
        if (code >= clear) bad() // first code after clear must be a root
        emit(code)
        prev = code
      } else if (code < next) { // known code
        val first = firstOf(code)
        emit(code)
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first.toByte; next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      } else if (code == next && next < 4096) { // KwKwK: define then emit
        prefix(next) = prev; suffix(next) = firstOf(prev).toByte; next += 1
        emit(next - 1)
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = next - 1
      } else bad()
    }
    out
  }

  /** Encode an RGB image as GIF89a with a 256-entry global palette built
    * from the caller's indexed pixels: `palette` is up to 256 RGB triples,
    * `indices` one palette index per pixel (row-major). The LZW stream is
    * the "uncompressed" form — literal 9-bit codes with a clear code every
    * 254 symbols so the width never grows — which every conformant decoder
    * accepts. Lossless, hence oracle-exact. */
  def encodeGif(width: Int, height: Int, palette: Array[Byte],
                indices: Array[Byte]): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length <= 768)
    require(indices.length == width * height)
    val bos = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bos.write(v & 0xff)
    def le16(v: Int): Unit = { w8(v); w8(v >> 8) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    le16(width); le16(height)
    w8(0xf7) // global table, 256 entries, 8-bit color resolution
    w8(0); w8(0)
    val table = java.util.Arrays.copyOf(palette, 768)
    bos.write(table)
    w8(0x2c) // image descriptor
    le16(0); le16(0); le16(width); le16(height)
    w8(0) // no local table, not interlaced
    w8(8) // LZW min code size
    // 9-bit literal codes, clear every 254 so the code width stays 9
    val body = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    def put(code: Int): Unit = {
      acc |= (code.toLong & 0x1ff) << nbits
      nbits += 9
      while (nbits >= 8) { body.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }
    put(256) // initial clear
    var k = 0
    while (k < indices.length) {
      put(indices(k) & 0xff)
      k += 1
      if (k % 254 == 0) put(256)
    }
    put(257) // EOI
    if (nbits > 0) body.write((acc & 0xff).toInt)
    val lz = body.toByteArray
    var off = 0
    while (off < lz.length) { // 255-byte sub-blocks
      val n = math.min(255, lz.length - off)
      w8(n); bos.write(lz, off, n); off += n
    }
    w8(0) // block terminator
    w8(0x3b) // trailer
    bos.toByteArray
  }
}
