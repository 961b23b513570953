package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class Jpeg12Spec extends AnyFunSuite {

  test("flat DC-only mosaic decodes analytically exactly (gray)") {
    // includes g=0 (DC target -16384, first-diff category 15 — the
    // region 8-bit baseline cannot express)
    val g = (bx: Int, by: Int) => Seq(0, 4095, 2048, 77)(by * 2 + bx)
    val p = Jpeg12.encode12GrayBlocks(2, 2, g)
    val img = Jpeg12.decode(p).get
    assert(img.width == 16 && img.height == 16 && img.components == 1)
    for (y <- 0 until 16; x <- 0 until 16)
      assert(img.samples(y * 16 + x) == g(x / 8, y / 8), s"($x,$y)")
  }

  test("3-component 4:4:4 with neutral chroma; 16-bit DQT (Pq=1)") {
    val g = (bx: Int, by: Int) => (1000 + bx * 700 + by * 900) % 4096
    for (pq16 <- Seq(false, true)) {
      val p = Jpeg12.encode12GrayBlocks(2, 2, g, components = 3, pq16 = pq16)
      val img = Jpeg12.decode(p).get
      assert(img.components == 3)
      for (y <- 0 until 16; x <- 0 until 16) {
        val base = (y * 16 + x) * 3
        assert(img.samples(base) == g(x / 8, y / 8))
        assert(img.samples(base + 1) == 2048 && img.samples(base + 2) == 2048)
      }
    }
  }

  test("restart intervals reset DC prediction") {
    val g = (bx: Int, by: Int) => (bx * 1111 + by * 333) % 4096
    val p = Jpeg12.encode12GrayBlocks(4, 3, g, restartInterval = 5)
    val img = Jpeg12.decode(p).get
    for (y <- 0 until 24; x <- 0 until 32)
      assert(img.samples(y * 32 + x) == g(x / 8, y / 8), s"($x,$y)")
  }

  test("nonzero AC coefficients decode against a direct-formula IDCT") {
    // independent oracle: the textbook O(n^4) IDCT sum written here, not
    // the codec's factored implementation
    def directIdct(coef: Array[Int]): Array[Int] = {
      def cc(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      Array.tabulate(64) { i =>
        val x = i % 8; val y = i / 8
        var s = 0.0
        for (v <- 0 until 8; u <- 0 until 8)
          s += 0.25 * cc(u) * cc(v) * coef(v * 8 + u) *
            math.cos((2 * x + 1) * u * math.Pi / 16.0) *
            math.cos((2 * y + 1) * v * math.Pi / 16.0)
        val px = math.round(s + 2048.0).toInt
        if (px < 0) 0 else if (px > 4095) 4095 else px
      }
    }
    // per-block coefficient patterns: DC + scattered AC incl. a ZRL-run
    // gap, 12-bit-scale magnitudes (AC size categories up to 14), and
    // values that clamp at both rails
    val blocks = Array(
      { val c = new Array[Int](64); c(0) = 4000; c(1) = 800; c(9) = -650; c },
      { val c = new Array[Int](64); c(0) = -9000; c(63) = 500; c },
      { val c = new Array[Int](64); c(0) = 0; c(2) = 8191; c(17) = -8192; c },
      { val c = new Array[Int](64)
        for (k <- 0 until 64) c(k) = ((k * 37) % 901) - 450
        c })
    val p = Jpeg12.encode12GrayCoefBlocks(2, 2, (bx, by) => blocks(by * 2 + bx))
    val img = Jpeg12.decode(p).get
    for (by <- 0 until 2; bx <- 0 until 2) {
      val want = directIdct(blocks(by * 2 + bx))
      for (y <- 0 until 8; x <- 0 until 8)
        assert(img.samples((by * 8 + y) * 16 + bx * 8 + x) == want(y * 8 + x),
          s"block($bx,$by) px($x,$y)")
    }
  }

  test("generic raster dispatch maps 12-bit and lossless to top-8-bit") {
    val p12 = Jpeg12.encode12GrayBlocks(2, 2, (_, _) => 0x9a7) // 1010011..
    val r12 = RasterCodec.decode(p12).get
    assert(r12.width == 16 && r12.channels == 1)
    assert(r12.sample(0, 0, 0) == (0x9a7 >> 4)) // top 8 of 12
    val pl = LosslessJpeg.encode(8, 8, 1, 12, 1, Array.fill(64)(0x801))
    val rl = RasterCodec.decode(pl).get
    assert(rl.sample(3, 3, 0) == (0x801 >> 4))
    // 8-bit lossless passes through unshifted
    val pl8 = LosslessJpeg.encode(8, 8, 1, 8, 1, Array.fill(64)(77))
    assert(RasterCodec.decode(pl8).get.sample(1, 1, 0) == 77)
  }

  test("wrong processes and malformed payloads reject cleanly") {
    // 8-bit SOF1 is not this process; 12-bit is not JpegCodec's
    val p12 = Jpeg12.encode12GrayBlocks(2, 2, (_, _) => 1234)
    assert(JpegCodec.decodeJpeg(p12).isEmpty)
    val p8 = JpegCodec.encodeJpegGrayBlocks(2, 2, (_, _) => 99)
    assert(Jpeg12.decode(p8).isEmpty)
    // lossless and arithmetic streams are rejected, not misdecoded
    val pl = LosslessJpeg.encode(8, 8, 1, 12, 1, Array.fill(64)(5))
    assert(Jpeg12.decode(pl).isEmpty)
    assert(Jpeg12.decode(null).isEmpty)
    assert(Jpeg12.decode("not a jpeg".getBytes).isEmpty)
    // every truncation: None, never a throw
    for (len <- 0 until p12.length)
      Jpeg12.decode(p12.take(len))
    // single-byte mutations: decode() must never throw (wrong pixels are
    // fine — entropy bits aren't integrity-checked in JPEG)
    val rnd = new scala.util.Random(12)
    for (_ <- 0 until 300) {
      val q = p12.clone()
      q(rnd.nextInt(q.length)) = rnd.nextInt(256).toByte
      Jpeg12.decode(q)
    }
  }
}
