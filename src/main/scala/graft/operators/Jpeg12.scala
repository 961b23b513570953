package graft.operators

/** 12-bit extended sequential JPEG (SOF1, ITU T.81 "extended DCT-based
  * Huffman" process at sample precision 12) — the high-bit-depth DCT
  * family member used by medical (DICOM) and scientific imagery, and the
  * last DCT/Huffman combination the codec family didn't cover (baseline
  * SOF0 and progressive SOF2 are 8-bit in [[JpegCodec]]; SOF3 lossless
  * covers 2–16 bit predictively in [[LosslessJpeg]]).
  *
  * What changes at 12-bit versus baseline (T.81 Annex F / Table F.1-F.2):
  * DC difference categories extend to SSSS=15 (magnitudes to ±32767), AC
  * size categories to 14, the level shift is 2^11 = 2048, samples clamp
  * to [0, 4095], and DQT tables may ship 16-bit elements (Pq=1). The
  * entropy layer (canonical Huffman, byte stuffing, EXTEND, restart
  * markers) is byte-identical to baseline and reused from [[JpegCodec]].
  *
  * Scope (documented): precision 12, 1 or 3 components at 1x1 sampling
  * (fully interleaved single scan), Huffman only (SOF9/SOF10 arithmetic
  * live in [[ArithJpeg]]). Output is raw component samples — no YCbCr
  * transform, matching [[LosslessJpeg]]'s convention: 12-bit pipelines
  * treat the component planes as data, not display pixels.
  *
  * Reference behavior: the reference pipeline ingests arbitrary binary
  * file content (`dlt_sources/m365/__init__.py:22-62`); this decoder is
  * part of making those payloads analyzable in-engine.
  */
object Jpeg12 {
  import JpegCodec.{Bad, bad, Huff, BitReader, extend, Zigzag, Cos, idct12To}

  /** Decoded 12-bit image: `samples` interleaved row-major, each in
    * [0, 4095]. */
  final case class Image12(width: Int, height: Int, components: Int,
                           samples: Array[Int])

  def decode(p: Array[Byte]): Option[Image12] = {
    if (p == null || p.length < 4 || (p(0) & 0xff) != 0xff ||
      (p(1) & 0xff) != 0xd8) return None
    try Some(run(p)) catch {
      case _: Bad | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }
  }

  private final case class C12(id: Int, tq: Int,
                               var dcTab: Int = 0, var acTab: Int = 0,
                               var pred: Int = 0)

  private def run(p: Array[Byte]): Image12 = {
    def u8(i: Int) = if (i < p.length) p(i) & 0xff else bad()
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)

    var width = 0
    var height = 0
    var comps: Array[C12] = null
    val quant = Array.ofDim[Int](4, 64)
    val quantSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var restartInterval = 0

    var at = 2
    var scanAt = -1
    while (scanAt < 0) {
      if (u8(at) != 0xff) bad()
      val m = u8(at + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { at += 2 }
      else if (m == 0xd9) bad() // EOI before the scan
      else {
        val len = be16(at + 2)
        if (len < 2) bad()
        val seg = at + 4
        m match {
          case 0xdb => // DQT — Pq=0 (8-bit) or Pq=1 (16-bit) elements
            var o = seg
            while (o < seg + len - 2) {
              val pq = u8(o) >> 4
              val tq = u8(o) & 0x0f
              if (pq > 1 || tq > 3) bad()
              val w = if (pq == 1) 2 else 1
              for (k <- 0 until 64)
                quant(tq)(k) = if (pq == 1) be16(o + 1 + 2 * k)
                               else u8(o + 1 + k)
              if (quant(tq).exists(_ <= 0)) bad()
              quantSeen(tq) = true
              o += 1 + 64 * w
            }
          case 0xc4 => // DHT
            var o = seg
            while (o < seg + len - 2) {
              val tc = u8(o) >> 4
              val th = u8(o) & 0x0f
              if (tc > 1 || th > 3) bad()
              val bits = new Array[Int](17)
              var total = 0
              for (l <- 1 to 16) { bits(l) = u8(o + l); total += bits(l) }
              if (total > 256) bad()
              val vals = new Array[Byte](total)
              for (i <- 0 until total) vals(i) = p(o + 17 + i)
              val h = new Huff(bits, vals)
              if (tc == 0) dcTabs(th) = h else acTabs(th) = h
              o += 17 + total
            }
          case 0xc1 => // SOF1 extended sequential
            if (comps != null) bad()
            if (u8(seg) != 12) bad() // this decoder is the 12-bit process
            height = be16(seg + 1)
            width = be16(seg + 3)
            val n = u8(seg + 5)
            if (width <= 0 || height <= 0 || (n != 1 && n != 3)) bad()
            if (width.toLong * height * n > (1L << 24)) bad() // alloc guard
            comps = Array.tabulate(n) { c =>
              val o = seg + 6 + c * 3
              if (u8(o + 1) != 0x11) bad() // 1x1 sampling only
              val tq = u8(o + 2)
              if (tq > 3) bad()
              C12(u8(o), tq)
            }
          case 0xc0 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
               0xcb | 0xcd | 0xce | 0xcf =>
            bad() // other processes belong to their own decoders
          case 0xdd =>
            restartInterval = be16(seg)
          case 0xda =>
            if (comps == null) bad()
            val ns = u8(seg)
            if (ns != comps.length) bad() // single interleaved scan
            for (i <- 0 until ns) {
              val cid = u8(seg + 1 + i * 2)
              val c = comps.find(_.id == cid).getOrElse(bad())
              val tt = u8(seg + 2 + i * 2)
              c.dcTab = tt >> 4
              c.acTab = tt & 15
            }
            scanAt = at + 2 + len
          case _ => // APPn/COM: skip
        }
        if (scanAt < 0) at += 2 + len
      }
    }

    val nc = comps.length
    for (c <- comps) {
      if (!quantSeen(c.tq)) bad()
      if (dcTabs(c.dcTab) == null || acTabs(c.acTab) == null) bad()
    }
    val wB = (width + 7) / 8
    val hB = (height + 7) / 8
    // per-component padded plane of 12-bit samples
    val planeW = wB * 8
    val planes = Array.fill(nc)(new Array[Int](planeW * hB * 8))

    val br = new BitReader(p, scanAt)
    val coef = new Array[Int](64)
    val tmp = Array.ofDim[Double](8, 8)
    var mcu = 0
    val nMcus = wB * hB
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) bad()
        comps.foreach(_.pred = 0)
      }
      val bx = mcu % wB
      val by = mcu / wB
      var ci = 0
      while (ci < nc) {
        val c = comps(ci)
        val q = quant(c.tq)
        java.util.Arrays.fill(coef, 0)
        val t = br.decode(dcTabs(c.dcTab))
        if (t > 15) bad() // 12-bit DC categories stop at SSSS=15
        c.pred += extend(br.bits(t), t)
        coef(0) = c.pred * q(0)
        var k = 1
        var eob = false
        while (!eob && k < 64) {
          val rs = br.decode(acTabs(c.acTab))
          val r = rs >> 4
          val s = rs & 15
          if (s == 0) {
            if (r == 15) k += 16 else eob = true
          } else {
            if (s > 14) bad() // 12-bit AC sizes stop at 14
            k += r
            if (k > 63) bad()
            coef(Zigzag(k)) = extend(br.bits(s), s) * q(k)
            k += 1
          }
        }
        idct12To(coef, planes(ci), planeW, bx * 8, by * 8, tmp)
        ci += 1
      }
      mcu += 1
    }

    // crop + interleave
    val out = new Array[Int](width * height * nc)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var ci = 0
        while (ci < nc) {
          out((y * width + x) * nc + ci) = planes(ci)(y * planeW + x)
          ci += 1
        }
        x += 1
      }
      y += 1
    }
    Image12(width, height, nc, out)
  }

  // ---- fixture encoder ------------------------------------------------

  /** Encode a 12-bit extended sequential (SOF1) stream whose pixels are
    * EXACTLY reconstructible: flat 8x8 blocks at 12-bit gray level
    * `gray12(bx, by)` (DC-only, quant all-ones — a DC of 8k IDCTs to the
    * flat value k+2048 with zero rounding ambiguity). With
    * `components = 3` the chroma planes carry flat 2048 (neutral).
    * DC categories run to 15 (canonical 5-bit codes), exercising the
    * region baseline Huffman cannot express; set `pq16` to ship the
    * quant table with 16-bit elements (Pq=1). */
  def encode12GrayBlocks(wBlocks: Int, hBlocks: Int,
                         gray12: (Int, Int) => Int,
                         components: Int = 1,
                         pq16: Boolean = false,
                         restartInterval: Int = 0): Array[Byte] = {
    require(wBlocks > 0 && hBlocks > 0)
    require(components == 1 || components == 3)
    val bos = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bos.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    marker(0xd8)
    if (pq16) {
      marker(0xdb); w16(2 + 1 + 128); w8(0x10) // Pq=1 Tq=0
      for (_ <- 0 until 64) w16(1)
    } else {
      marker(0xdb); w16(2 + 1 + 64); w8(0x00)
      for (_ <- 0 until 64) w8(1)
    }
    val wPix = wBlocks * 8
    val hPix = hBlocks * 8
    marker(0xc1); w16(8 + 3 * components); w8(12); w16(hPix); w16(wPix)
    w8(components)
    for (id <- 1 to components) { w8(id); w8(0x11); w8(0) }
    // DHT DC 0: 16 symbols (categories 0..15), all 5-bit codes
    marker(0xc4); w16(2 + 1 + 16 + 16); w8(0x00)
    for (l <- 1 to 16) w8(if (l == 5) 16 else 0)
    for (s <- 0 until 16) w8(s)
    // DHT AC 0: single symbol EOB, 1-bit code "0"
    marker(0xc4); w16(2 + 1 + 16 + 1); w8(0x10)
    for (l <- 1 to 16) w8(if (l == 1) 1 else 0)
    w8(0x00)
    if (restartInterval > 0) { marker(0xdd); w16(4); w16(restartInterval) }
    marker(0xda); w16(6 + 2 * components); w8(components)
    for (id <- 1 to components) { w8(id); w8(0x00) }
    w8(0); w8(63); w8(0)
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
    def flushBits(): Unit = while (nbits != 0) put(1, 1)
    val pred = new Array[Int](3)
    var rst = 0
    var sinceRestart = 0
    for (by <- 0 until hBlocks; bx <- 0 until wBlocks) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        flushBits()
        marker(0xd0 + rst)
        rst = (rst + 1) % 8
        sinceRestart = 0
        java.util.Arrays.fill(pred, 0)
      }
      for (c <- 0 until components) {
        val g = gray12(bx, by)
        require(g >= 0 && g <= 4095, "12-bit sample range")
        val target = if (c == 0) (g - 2048) * 8 else 0
        val diff = target - pred(c)
        pred(c) = target
        var s = 0
        var a = math.abs(diff)
        while (a != 0) { s += 1; a >>= 1 }
        put(s, 5) // DC category, canonical code == category
        if (s > 0) put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        put(0, 1) // EOB
      }
      sinceRestart += 1
    }
    flushBits()
    marker(0xd9)
    bos.toByteArray
  }

  /** General 12-bit fixture encoder: arbitrary per-block NATURAL-order
    * coefficient arrays (quant all-ones), grayscale. AC symbols use a
    * flat canonical 8-bit table over every (run, size) pair with size
    * <= 14 plus EOB/ZRL — valid, if not entropy-optimal, which is what a
    * decode-side fixture wants. Used by the spec to exercise nonzero AC,
    * ZRL runs, and the 12-bit EXTEND range against a direct-formula IDCT. */
  def encode12GrayCoefBlocks(wBlocks: Int, hBlocks: Int,
                             coefs: (Int, Int) => Array[Int]): Array[Byte] = {
    require(wBlocks > 0 && hBlocks > 0)
    val bos = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bos.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    marker(0xd8)
    marker(0xdb); w16(2 + 1 + 64); w8(0x00)
    for (_ <- 0 until 64) w8(1)
    marker(0xc1); w16(8 + 3); w8(12); w16(hBlocks * 8); w16(wBlocks * 8)
    w8(1); w8(1); w8(0x11); w8(0)
    // DC 0: categories 0..15 at 5 bits
    marker(0xc4); w16(2 + 1 + 16 + 16); w8(0x00)
    for (l <- 1 to 16) w8(if (l == 5) 16 else 0)
    for (s <- 0 until 16) w8(s)
    // AC 0: EOB(0x00), ZRL(0xF0), and (r<<4|s) for r 0..15, s 1..14 —
    // 226 symbols, all 8-bit canonical codes (max code 225, the
    // all-ones codeword stays unassigned as T.81 requires)
    val acSyms = (0x00 +: 0xf0 +: (for {
      r <- 0 to 15; s <- 1 to 14
    } yield (r << 4) | s)).distinct.sorted
    marker(0xc4); w16(2 + 1 + 16 + acSyms.length); w8(0x10)
    for (l <- 1 to 16) w8(if (l == 8) acSyms.length else 0)
    for (s <- acSyms) w8(s)
    val acCode = acSyms.zipWithIndex.toMap
    marker(0xda); w16(8); w8(1); w8(1); w8(0x00); w8(0); w8(63); w8(0)
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
    def cat(v: Int): Int = {
      var s = 0
      var a = math.abs(v)
      while (a != 0) { s += 1; a >>= 1 }
      s
    }
    def mag(v: Int, s: Int): Int = if (v < 0) v + (1 << s) - 1 else v
    var pred = 0
    for (by <- 0 until hBlocks; bx <- 0 until wBlocks) {
      val c = coefs(bx, by)
      require(c.length == 64)
      val diff = c(0) - pred
      pred = c(0)
      val s0 = cat(diff)
      require(s0 <= 15, "DC diff exceeds 12-bit category range")
      put(s0, 5)
      if (s0 > 0) put(mag(diff, s0), s0)
      // AC in zigzag order with run-lengths
      var k = 1
      var run = 0
      while (k < 64) {
        val v = c(Zigzag(k))
        if (v == 0) run += 1
        else {
          while (run >= 16) { put(acCode(0xf0), 8); run -= 16 }
          val s = cat(v)
          require(s <= 14, "AC magnitude exceeds 12-bit size range")
          put(acCode((run << 4) | s), 8)
          put(mag(v, s), s)
          run = 0
        }
        k += 1
      }
      if (run > 0) put(acCode(0x00), 8) // EOB
    }
    while (nbits != 0) put(1, 1)
    marker(0xd9)
    bos.toByteArray
  }
}
