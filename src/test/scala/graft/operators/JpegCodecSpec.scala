package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class JpegCodecSpec extends AnyFunSuite {

  private def formula(bx: Int, by: Int): Int = (bx * 37 + by * 101 + 13) % 256

  test("DC-only 4:4:4 color mosaic decodes to exact flat blocks") {
    val (wb, hb) = (3, 2)
    val bytes = JpegCodec.encodeJpegGrayBlocks(wb, hb, formula)
    val r = JpegCodec.decodeJpeg(bytes)
    assert(r.isDefined)
    assert(r.get.width == wb * 8 && r.get.height == hb * 8 &&
      r.get.channels == 3)
    for (y <- 0 until hb * 8; x <- 0 until wb * 8; c <- 0 until 3) {
      val want = formula(x / 8, y / 8)
      assert(r.get.sample(x, y, c) == want,
        s"($x,$y,$c): got ${r.get.sample(x, y, c)}, want $want")
    }
  }

  test("single-component grayscale stream decodes as a 1-channel raster") {
    val bytes = JpegCodec.encodeJpegGrayBlocks(2, 3, formula, components = 1)
    val r = JpegCodec.decodeJpeg(bytes)
    assert(r.isDefined)
    assert(r.get.channels == 1)
    for (y <- 0 until 24; x <- 0 until 16)
      assert(r.get.sample(x, y, 0) == formula(x / 8, y / 8), s"($x,$y)")
  }

  test("extreme DC values clamp to 0/255 and negative diffs sign-extend") {
    // gray 0 -> DC -1024 (category 11 all-zeros code path), gray 255 -> 1016
    val bytes = JpegCodec.encodeJpegGrayBlocks(2, 1,
      (bx, _) => if (bx == 0) 0 else 255)
    val r = JpegCodec.decodeJpeg(bytes).get
    assert(r.sample(0, 0, 0) == 0 && r.sample(8, 0, 1) == 255)
    // and a descending sequence forces negative DC diffs
    val desc = JpegCodec.encodeJpegGrayBlocks(4, 1, (bx, _) => 200 - bx * 50)
    val d = JpegCodec.decodeJpeg(desc).get
    for (bx <- 0 until 4)
      assert(d.sample(bx * 8, 0, 0) == 200 - bx * 50, s"block $bx")
  }

  test("decode goes through RasterCodec.decode and the header sniff") {
    val bytes = JpegCodec.encodeJpegGrayBlocks(2, 2, formula)
    assert(Multimodal.sniffImageHeader(bytes).contains(("jpeg", 16, 16)))
    val r = RasterCodec.decode(bytes)
    assert(r.isDefined && r.get.width == 16 && r.get.channels == 3)
  }

  test("malformed payloads return None, never throw") {
    val good = JpegCodec.encodeJpegGrayBlocks(2, 2, formula)
    val sofPatched = good.clone()
    // SOF0 marker (FFC0) -> SOF2: a baseline scan header (ss=0, se=63) is
    // illegal for a progressive DC scan, so this must still reject
    val sofAt = good.indices.find(i => (good(i) & 0xff) == 0xff &&
      i + 1 < good.length && (good(i + 1) & 0xff) == 0xc0).get
    sofPatched(sofAt + 1) = 0xc2.toByte
    val prog = JpegCodec.encodeJpegGrayBlocksProgressive(2, 2, formula)
    val cases = Seq[Array[Byte]](
      null,
      Array.emptyByteArray,
      Array[Byte](0xff.toByte, 0xd8.toByte), // SOI only
      good.take(20), // truncated in the headers
      sofPatched, // baseline scan header under SOF2: invalid -> None
      { val b = good.clone(); b(2) = 0x00; b }, // desynced marker stream
      good.takeWhile(_ => true).dropRight(good.length - 4), // header stub
      prog.dropRight(2), // progressive missing EOI
      prog.take(prog.length / 2) // progressive truncated mid-scan
    )
    for ((c, idx) <- cases.zipWithIndex)
      assert(JpegCodec.decodeJpeg(c).isEmpty, s"case $idx decoded")
  }

  test("progressive fixture decodes to the same exact mosaic as baseline") {
    for (components <- Seq(1, 3)) {
      val base = JpegCodec.encodeJpegGrayBlocks(3, 2, formula, components)
      val prog =
        JpegCodec.encodeJpegGrayBlocksProgressive(3, 2, formula, components)
      val rb = JpegCodec.decodeJpeg(base)
      val rp = JpegCodec.decodeJpeg(prog)
      assert(rb.isDefined && rp.isDefined, s"components=$components")
      assert(rp.get.width == 24 && rp.get.height == 16 &&
        rp.get.channels == rb.get.channels)
      assert(java.util.Arrays.equals(rp.get.data, rb.get.data),
        s"components=$components pixel mismatch")
      // and the pixels are the analytic formula, not merely consistent
      for (y <- 0 until 16; x <- 0 until 24)
        assert(rp.get.sample(x, y, 0) == formula(x / 8, y / 8), s"($x,$y)")
    }
  }

  // ---- general coefficient-level cross-encoder tests -------------------
  // The strongest progressive evidence: encode the SAME quantized
  // coefficient blocks as (a) one baseline scan and (b) a progressive
  // scan script with successive approximation (DC first/refine, AC first/
  // refine per spectral band), then assert the two decodes are
  // byte-identical. With an all-ones quant table both paths dequantize and
  // IDCT identical integers, so any divergence is an entropy-decode bug.

  test("progressive AC first+refinement scans reproduce the baseline decode") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 8) {
      val wb = 1 + rnd.nextInt(4)
      val hb = 1 + rnd.nextInt(3)
      val blocks = Array.fill(wb * hb) {
        val b = new Array[Int](64)
        b(0) = rnd.nextInt(401) - 200 // DC, mixed parity
        // sparse AC: mix of +-1 (newly significant in refine), odd/even
        // magnitudes (correction bits 1/0), long zero runs (ZRL), and
        // some all-zero blocks (EOB runs spanning blocks)
        if (trial % 4 != 0 || rnd.nextBoolean()) {
          for (_ <- 0 until rnd.nextInt(7)) {
            val k = 1 + rnd.nextInt(63)
            val mag = Seq(1, 1, 2, 3, 5, 9, 20)(rnd.nextInt(7))
            b(k) = if (rnd.nextBoolean()) mag else -mag
          }
          if (rnd.nextBoolean()) b(1 + rnd.nextInt(20)) = 0
          // force a >16 zero-gap newly-significant value sometimes
          if (rnd.nextBoolean()) { b(40 + rnd.nextInt(24)) = 1 }
        }
        b
      }
      val bandSplits = Seq(
        Seq((1, 63)),
        Seq((1, 5), (6, 63)),
        Seq((1, 2), (3, 20), (21, 63)))(trial % 3)
      val base = JpegTestEncoder.encodeBaseline(wb, hb, blocks)
      val prog = JpegTestEncoder.encodeProgressive(wb, hb, blocks, bandSplits)
      val rb = JpegCodec.decodeJpeg(base)
      val rp = JpegCodec.decodeJpeg(prog)
      assert(rb.isDefined, s"trial $trial: baseline failed")
      assert(rp.isDefined, s"trial $trial: progressive failed")
      assert(java.util.Arrays.equals(rp.get.data, rb.get.data),
        s"trial $trial (${wb}x$hb, splits=$bandSplits): pixel mismatch")
    }
  }

  test("EOB runs spanning many all-zero blocks decode against baseline") {
    // 6x4 grid, only two blocks carry AC energy -> the AC scans are
    // dominated by multi-block EOB runs with extension bits
    val wb = 6; val hb = 4
    val blocks = Array.tabulate(wb * hb) { i =>
      val b = new Array[Int](64)
      b(0) = (i * 29) % 256 - 128
      if (i == 5) { b(3) = 7; b(17) = -1; b(62) = 2 }
      if (i == 19) { b(1) = -3; b(35) = 1 }
      b
    }
    val base = JpegTestEncoder.encodeBaseline(wb, hb, blocks)
    val prog = JpegTestEncoder.encodeProgressive(wb, hb, blocks, Seq((1, 63)))
    val rb = JpegCodec.decodeJpeg(base).get
    val rp = JpegCodec.decodeJpeg(prog)
    assert(rp.isDefined, "progressive EOB-run stream failed to decode")
    assert(java.util.Arrays.equals(rp.get.data, rb.data))
  }

  test("spectral bands can be refined in any legal scan order") {
    // DC first -> AC first(band2) -> AC first(band1) -> DC refine ->
    // AC refine(band1) -> AC refine(band2): the scan script G.1.1.1 allows
    // any interleaving as long as each band's first scan precedes its
    // refinement; the accumulator must not care about band order
    val blocks = Array.tabulate(4) { i =>
      val b = new Array[Int](64)
      b(0) = i * 40 - 60
      b(2) = 3; b(9) = -1; b(30) = 1; b(55) = -5
      b
    }
    val base = JpegTestEncoder.encodeBaseline(2, 2, blocks)
    val prog = JpegTestEncoder.encodeProgressive(2, 2, blocks,
      Seq((1, 10), (11, 63)), reverseFirstScans = true)
    val rb = JpegCodec.decodeJpeg(base).get
    val rp = JpegCodec.decodeJpeg(prog)
    assert(rp.isDefined)
    assert(java.util.Arrays.equals(rp.get.data, rb.data))
  }

  test("4:2:0 chroma subsampling: upsample + YCbCr conversion are exact") {
    // 3x2 MCUs (48x32), Y varies per 8x8 block, chroma varies per MCU —
    // the flat DC-only planes make every RGB pixel analytically checkable
    // through the nearest-neighbor upsample and the decoder's own
    // conversion formula
    val yG = (bx: Int, by: Int) => (bx * 41 + by * 23 + 40) % 256
    val cb = (mx: Int, my: Int) => (96 + mx * 37 + my * 11) % 256
    val cr = (mx: Int, my: Int) => (160 + mx * 13 + my * 29) % 256
    val bytes = JpegTestEncoder.encode420(3, 2, 48, 32, yG, cb, cr,
      progressive = false)
    val r = JpegCodec.decodeJpeg(bytes)
    assert(r.isDefined, "4:2:0 baseline failed to decode")
    assert(r.get.width == 48 && r.get.height == 32 && r.get.channels == 3)
    def clamp(v: Long): Int = if (v < 0) 0 else if (v > 255) 255 else v.toInt
    for (y <- 0 until 32; x <- 0 until 48) {
      val yy = yG(x / 8, y / 8)
      val pb = cb(x / 16, y / 16) - 128
      val pr = cr(x / 16, y / 16) - 128
      val er = clamp(math.round(yy + 1.402 * pr))
      val eg = clamp(math.round(yy - 0.344136 * pb - 0.714136 * pr))
      val eb = clamp(math.round(yy + 1.772 * pb))
      assert(r.get.sample(x, y, 0) == er && r.get.sample(x, y, 1) == eg &&
        r.get.sample(x, y, 2) == eb, s"($x,$y)")
    }
  }

  test("4:2:0 progressive (interleaved DC scans) equals 4:2:0 baseline") {
    val yG = (bx: Int, by: Int) => (bx * 19 + by * 77 + 5) % 256
    val cb = (mx: Int, my: Int) => (80 + mx * 51 + my * 17) % 256
    val cr = (mx: Int, my: Int) => (200 - mx * 31 - my * 7 + 256) % 256
    // 24x16: one pixel column of the second MCU column survives the crop,
    // so the padded-vs-real block grids genuinely differ
    for ((w, h) <- Seq((32, 16), (24, 16))) {
      val wm = (w + 15) / 16
      val base = JpegTestEncoder.encode420(wm, 1, w, h, yG, cb, cr,
        progressive = false)
      val prog = JpegTestEncoder.encode420(wm, 1, w, h, yG, cb, cr,
        progressive = true)
      val rb = JpegCodec.decodeJpeg(base)
      val rp = JpegCodec.decodeJpeg(prog)
      assert(rb.isDefined && rp.isDefined, s"${w}x$h")
      assert(rb.get.width == w && rp.get.width == w)
      assert(java.util.Arrays.equals(rp.get.data, rb.get.data),
        s"${w}x$h: 4:2:0 progressive != baseline")
    }
  }

  test("restart markers: intervals reset DC prediction") {
    // Build a stream with DRI by splicing: encode without restarts, then a
    // hand-spliced variant is brittle — instead verify the decoder accepts
    // an encoder-independent path: re-encode per interval. Simplest real
    // check: a stream with restart interval equal to the MCU row, written
    // by patching DRI in and RST markers between rows, with per-row DC
    // prediction reset (absolute values re-encoded per row).
    val wb = 2; val hb = 2
    val bos = new java.io.ByteArrayOutputStream()
    val full = JpegCodec.encodeJpegGrayBlocks(wb, hb, formula, components = 1)
    // locate SOS payload start (after the 2-byte marker + its segment)
    val sosAt = full.indices.find(i => (full(i) & 0xff) == 0xff &&
      i + 1 < full.length && (full(i + 1) & 0xff) == 0xda).get
    val sosLen = ((full(sosAt + 2) & 0xff) << 8) | (full(sosAt + 3) & 0xff)
    val entropyAt = sosAt + 2 + sosLen
    // headers + DRI(2) before SOS
    bos.write(full, 0, sosAt)
    bos.write(Array[Byte](0xff.toByte, 0xdd.toByte, 0, 4, 0, wb.toByte))
    bos.write(full, sosAt, 2 + sosLen)
    // entropy per MCU row, each re-encoded independently (DC pred resets)
    for (by <- 0 until hb) {
      val row = JpegCodec.encodeJpegGrayBlocks(wb, 1,
        (bx, _) => formula(bx, by), components = 1)
      val rSos = row.indices.find(i => (row(i) & 0xff) == 0xff &&
        i + 1 < row.length && (row(i + 1) & 0xff) == 0xda).get
      val rLen = ((row(rSos + 2) & 0xff) << 8) | (row(rSos + 3) & 0xff)
      val rEnt = rSos + 2 + rLen
      bos.write(row, rEnt, row.length - rEnt - 2) // strip EOI
      if (by < hb - 1)
        bos.write(Array[Byte](0xff.toByte, (0xd0 + by).toByte))
    }
    bos.write(Array[Byte](0xff.toByte, 0xd9.toByte))
    val r = JpegCodec.decodeJpeg(bos.toByteArray)
    assert(r.isDefined, "restart stream did not decode")
    for (y <- 0 until hb * 8; x <- 0 until wb * 8)
      assert(r.get.sample(x, y, 0) == formula(x / 8, y / 8), s"($x,$y)")
  }
}

/** Test-side grayscale JPEG writer that entropy-codes the SAME zigzag-order
  * coefficient blocks (all-ones quant) either as one baseline scan or as a
  * progressive scan script with successive approximation: DC first (al=1),
  * per-band AC first (al=1), DC refinement, per-band AC refinement (al=0)
  * following the libjpeg jcphuff correction-bit algorithm (ZRL folding,
  * EOB-run accumulation with buffered correction bits). Both encodings
  * must decode to identical pixels — the cross-check JpegCodecSpec runs. */
private object JpegTestEncoder {

  private class BW(val bos: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(v: Int, nb: Int): Unit = {
      var i = nb - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = while (n != 0) put(1, 1)
  }

  // AC table: every (run, size) with size<=10 as an 8-bit code; canonical
  // order == numeric order, so code == index in the sorted symbol list
  private val acSyms: Vector[Int] =
    (for (r <- 0 to 15; s <- 0 to 10) yield (r << 4) | s).toVector
  private val acIdx: Map[Int, Int] = acSyms.zipWithIndex.toMap

  private def cat(v: Int): Int = {
    var s = 0
    var a = math.abs(v)
    while (a != 0) { s += 1; a >>= 1 }
    s
  }

  private def headers(bos: java.io.ByteArrayOutputStream, wPix: Int,
                      hPix: Int, sof: Int,
                      comps: Seq[(Int, Int, Int)]): Unit = {
    def w8(v: Int): Unit = bos.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    marker(0xd8)
    marker(0xdb); w16(2 + 1 + 64); w8(0x00)
    for (_ <- 0 until 64) w8(1)
    marker(sof); w16(8 + 3 * comps.length); w8(8); w16(hPix); w16(wPix)
    w8(comps.length)
    for ((id, h, v) <- comps) { w8(id); w8((h << 4) | v); w8(0) }
    marker(0xc4); w16(2 + 1 + 16 + 12); w8(0x00) // DC: 12 syms, 4-bit
    for (l <- 1 to 16) w8(if (l == 4) 12 else 0)
    for (s <- 0 until 12) w8(s)
    marker(0xc4); w16(2 + 1 + 16 + acSyms.length); w8(0x10) // AC: 8-bit
    for (l <- 1 to 16) w8(if (l == 8) acSyms.length else 0)
    for (s <- acSyms) w8(s)
  }

  private def sosMulti(bos: java.io.ByteArrayOutputStream, ids: Seq[Int],
                       ss: Int, se: Int, ah: Int, al: Int): Unit = {
    def w8(v: Int): Unit = bos.write(v & 0xff)
    w8(0xff); w8(0xda); w8(0); w8(6 + 2 * ids.length); w8(ids.length)
    for (id <- ids) { w8(id); w8(0x00) }
    w8(ss); w8(se); w8((ah << 4) | al)
  }

  private def sos(bos: java.io.ByteArrayOutputStream, ss: Int, se: Int,
                  ah: Int, al: Int): Unit = sosMulti(bos, Seq(1), ss, se, ah, al)

  private def putAc(bw: BW, sym: Int): Unit = bw.put(acIdx(sym), 8)
  private def putSigned(bw: BW, v: Int, s: Int): Unit =
    if (s > 0) bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
  private def putDc(bw: BW, diff: Int): Unit = {
    val s = cat(diff)
    bw.put(s, 4) // canonical 4-bit DC codes: code == category
    putSigned(bw, diff, s)
  }

  def encodeBaseline(wb: Int, hb: Int, blocks: Array[Array[Int]]): Array[Byte] = {
    require(blocks.length == wb * hb)
    val bos = new java.io.ByteArrayOutputStream()
    headers(bos, wb * 8, hb * 8, 0xc0, Seq((1, 1, 1)))
    sos(bos, 0, 63, 0, 0)
    val bw = new BW(bos)
    var pred = 0
    for (b <- blocks) {
      putDc(bw, b(0) - pred)
      pred = b(0)
      var k = 1
      var r = 0
      while (k < 64) {
        if (b(k) == 0) r += 1
        else {
          while (r > 15) { putAc(bw, 0xf0); r -= 16 }
          val s = cat(b(k))
          putAc(bw, (r << 4) | s)
          putSigned(bw, b(k), s)
          r = 0
        }
        k += 1
      }
      if (r > 0) putAc(bw, 0x00) // EOB
    }
    bw.flush()
    bos.write(0xff); bos.write(0xd9)
    bos.toByteArray
  }

  def encodeProgressive(wb: Int, hb: Int, blocks: Array[Array[Int]],
                        bands: Seq[(Int, Int)],
                        reverseFirstScans: Boolean = false): Array[Byte] = {
    require(blocks.length == wb * hb)
    require(bands.nonEmpty && bands.head._1 == 1 &&
      bands.sliding(2).forall {
        case Seq((_, e), (s, _)) => s == e + 1
        case _ => true
      } && bands.last._2 == 63, s"bands must tile 1..63: $bands")
    val bos = new java.io.ByteArrayOutputStream()
    headers(bos, wb * 8, hb * 8, 0xc2, Seq((1, 1, 1)))

    // DC first, al=1 (arithmetic shift per the DC point transform)
    sos(bos, 0, 0, 0, 1)
    var bw = new BW(bos)
    var pred = 0
    for (b <- blocks) { putDc(bw, (b(0) >> 1) - pred); pred = b(0) >> 1 }
    bw.flush()

    // per-band AC first scans at al=1
    val firstOrder = if (reverseFirstScans) bands.reverse else bands
    for ((ss, se) <- firstOrder) {
      sos(bos, ss, se, 0, 1)
      bw = new BW(bos)
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        var r = 0
        while ((2 << r) <= eobrun) r += 1
        putAc(bw, r << 4)
        if (r > 0) bw.put(eobrun - (1 << r), r)
        eobrun = 0
      }
      for (b <- blocks) {
        val t = Array.tabulate(64) { k =>
          val v = b(k)
          if (v < 0) -((-v) >> 1) else v >> 1
        }
        if ((ss to se).forall(t(_) == 0)) eobrun += 1
        else {
          flushEob()
          var r = 0
          for (k <- ss to se) {
            if (t(k) == 0) r += 1
            else {
              while (r > 15) { putAc(bw, 0xf0); r -= 16 }
              val s = cat(t(k))
              putAc(bw, (r << 4) | s)
              putSigned(bw, t(k), s)
              r = 0
            }
          }
          if (r > 0) eobrun += 1
        }
      }
      flushEob()
      bw.flush()
    }

    // DC refinement: one raw low bit per block
    sos(bos, 0, 0, 1, 0)
    bw = new BW(bos)
    for (b <- blocks) bw.put(b(0) & 1, 1)
    bw.flush()

    // per-band AC refinement at al=0 — libjpeg jcphuff algorithm
    for ((ss, se) <- bands) {
      sos(bos, ss, se, 1, 0)
      bw = new BW(bos)
      var eobrun = 0
      val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
      def flushEob(): Unit = if (eobrun > 0) {
        var r = 0
        while ((2 << r) <= eobrun) r += 1
        putAc(bw, r << 4)
        if (r > 0) bw.put(eobrun - (1 << r), r)
        pending.foreach(bw.put(_, 1))
        pending.clear()
        eobrun = 0
      }
      for (b <- blocks) {
        val eobPos = (ss to se).filter(k => math.abs(b(k)) == 1)
          .lastOption.getOrElse(ss - 1)
        var r = 0
        val blockBits = scala.collection.mutable.ArrayBuffer.empty[Int]
        for (k <- ss to se) {
          val a = math.abs(b(k))
          if (a == 0) r += 1
          else {
            while (r > 15 && k <= eobPos) {
              flushEob()
              putAc(bw, 0xf0)
              r -= 16
              blockBits.foreach(bw.put(_, 1))
              blockBits.clear()
            }
            if (a > 1) blockBits += (a & 1)
            else {
              flushEob()
              putAc(bw, (r << 4) | 1)
              bw.put(if (b(k) < 0) 0 else 1, 1)
              blockBits.foreach(bw.put(_, 1))
              blockBits.clear()
              r = 0
            }
          }
        }
        if (r > 0 || blockBits.nonEmpty) {
          eobrun += 1
          pending ++= blockBits
        }
      }
      flushEob()
      bw.flush()
    }

    bos.write(0xff); bos.write(0xd9)
    bos.toByteArray
  }

  /** 4:2:0 DC-only fixture (Y at 2x2 blocks per MCU, Cb/Cr one block per
    * MCU), flat values per block so decoded planes are analytically exact:
    * Y block (bx,by) holds yGray(bx,by), chroma is flat per MCU. Baseline
    * encodes one interleaved scan; progressive splits into interleaved DC
    * first/refine plus per-component all-EOB AC scans — both must decode
    * identically through the multi-block-per-MCU and chroma-upsample
    * paths. `wPix`/`hPix` may undershoot the MCU grid to exercise crop. */
  def encode420(wMcus: Int, hMcus: Int, wPix: Int, hPix: Int,
                yGray: (Int, Int) => Int, cbVal: (Int, Int) => Int,
                crVal: (Int, Int) => Int,
                progressive: Boolean): Array[Byte] = {
    require((wPix + 15) / 16 == wMcus && (hPix + 15) / 16 == hMcus)
    val bos = new java.io.ByteArrayOutputStream()
    headers(bos, wPix, hPix, if (progressive) 0xc2 else 0xc0,
      Seq((1, 2, 2), (2, 1, 1), (3, 1, 1)))
    def target(ci: Int, bx: Int, by: Int): Int = (ci match {
      case 0 => yGray(bx, by) - 128
      case 1 => cbVal(bx, by) - 128
      case _ => crVal(bx, by) - 128
    }) * 8
    // decoder traversal order: per MCU, per component, bv then bh
    val mcuBlocks: Seq[(Int, Int, Int)] = for {
      my <- 0 until hMcus; mx <- 0 until wMcus
      (ci, ch, cv) <- Seq((0, 2, 2), (1, 1, 1), (2, 1, 1))
      bv <- 0 until cv; bh <- 0 until ch
    } yield (ci, mx * ch + bh, my * cv + bv)

    if (!progressive) {
      sosMulti(bos, Seq(1, 2, 3), 0, 63, 0, 0)
      val bw = new BW(bos)
      val pred = new Array[Int](3)
      for ((ci, bx, by) <- mcuBlocks) {
        val t = target(ci, bx, by)
        putDc(bw, t - pred(ci))
        pred(ci) = t
        putAc(bw, 0x00) // DC-only block: immediate EOB
      }
      bw.flush()
    } else {
      sosMulti(bos, Seq(1, 2, 3), 0, 0, 0, 1) // DC first, al=1
      var bw = new BW(bos)
      val pred = new Array[Int](3)
      for ((ci, bx, by) <- mcuBlocks) {
        val t = target(ci, bx, by) >> 1
        putDc(bw, t - pred(ci))
        pred(ci) = t
      }
      bw.flush()
      sosMulti(bos, Seq(1, 2, 3), 0, 0, 1, 0) // DC refine: raw low bits
      bw = new BW(bos)
      for ((ci, bx, by) <- mcuBlocks) bw.put(target(ci, bx, by) & 1, 1)
      bw.flush()
      // per-component all-EOB AC scans over each real block grid
      val grids = Seq((1, 2 * wMcus * 2 * hMcus), (2, wMcus * hMcus),
        (3, wMcus * hMcus))
      for ((id, nBlocks) <- grids) {
        sosMulti(bos, Seq(id), 1, 63, 0, 0)
        bw = new BW(bos)
        var n = nBlocks
        while (n > 0) {
          var r = 0
          while (r < 14 && (2 << r) <= n) r += 1
          val count = math.min(n, (2 << r) - 1)
          putAc(bw, r << 4)
          if (r > 0) bw.put(count - (1 << r), r)
          n -= count
        }
        bw.flush()
      }
    }
    bos.write(0xff); bos.write(0xd9)
    bos.toByteArray
  }
}
