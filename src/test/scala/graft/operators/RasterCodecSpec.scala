package graft.operators

import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

class RasterCodecSpec extends AnyFunSuite {

  private def testImage(w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      rgb(p) = ((x * 31 + y * 7) % 256).toByte
      rgb(p + 1) = ((x * 13 + y * 101) % 256).toByte
      rgb(p + 2) = ((x * y + 5) % 256).toByte
    }
    rgb
  }

  test("BMP round-trip, including a padded (non-multiple-of-4) row width") {
    for ((w, h) <- Seq((16, 16), (5, 3), (7, 1), (1, 9))) {
      val rgb = testImage(w, h)
      val decoded = RasterCodec.decodeBmp(RasterCodec.encodeBmp(w, h, rgb))
      assert(decoded.isDefined, s"${w}x$h")
      assert(decoded.get.width == w && decoded.get.height == h)
      assert(decoded.get.data.toSeq == rgb.toSeq, s"${w}x$h pixel mismatch")
    }
  }

  test("PNG round-trip through real deflate") {
    for ((w, h) <- Seq((16, 16), (5, 3), (1, 1))) {
      val rgb = testImage(w, h)
      val png = RasterCodec.encodePng(w, h, rgb)
      assert(Multimodal.sniffImageHeader(png).contains(("png", w, h)))
      val decoded = RasterCodec.decodePng(png)
      assert(decoded.isDefined, s"${w}x$h")
      assert(decoded.get.data.toSeq == rgb.toSeq, s"${w}x$h pixel mismatch")
    }
  }

  /** Build a color-type-2 PNG whose scanlines use the given filter types,
    * computing the filtered deltas from the raw image — decode must undo
    * Sub/Up/Average/Paeth exactly. */
  private def pngWithFilters(w: Int, h: Int, rgb: Array[Byte],
                             filters: Seq[Int]): Array[Byte] = {
    val stride = w * 3
    val raw = new Array[Byte]((1 + stride) * h)
    def px(x: Int, y: Int): Int =
      if (x < 0 || y < 0) 0 else rgb(y * stride + x) & 0xff
    for (y <- 0 until h) {
      val f = filters(y)
      raw(y * (1 + stride)) = f.toByte
      for (x <- 0 until stride) {
        val cur = px(x, y)
        val a = px(x - 3, y); val b = px(x, y - 1); val c = px(x - 3, y - 1)
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(y * (1 + stride) + 1 + x) = (cur - pred).toByte
      }
    }
    val d = new Deflater(); d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val bos = new java.io.ByteArrayOutputStream()
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(RasterCodec.PngSig)
    out.write(RasterCodec.chunk("IHDR", ihdr))
    out.write(RasterCodec.chunk("IDAT", bos.toByteArray))
    out.write(RasterCodec.chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  test("PNG decode reverses all five scanline filters") {
    val (w, h) = (6, 5)
    val rgb = testImage(w, h)
    val png = pngWithFilters(w, h, rgb, Seq(0, 1, 2, 3, 4))
    val decoded = RasterCodec.decodePng(png)
    assert(decoded.isDefined)
    assert(decoded.get.data.toSeq == rgb.toSeq)
  }

  test("boxDownsample: exact floor averages, edge truncation, undersized reject") {
    // 5x3 gray-ish RGB: pixel value = x + 10*y per channel
    val w = 5; val h = 3
    val rgb = Array.tabulate(w * h * 3)(i => ((i / 3 % w) + 10 * (i / 3 / w)).toByte)
    val r = RasterCodec.Raster(w, h, 3, rgb)
    val Some(small) = RasterCodec.boxDownsample(r, 2)
    // 2x1 output (partial right column and bottom row drop)
    assert(small.width == 2 && small.height == 1)
    // block (0,0): values 0,1,10,11 -> floor(22/4)=5; block (1,0): 2,3,12,13 -> 7
    assert(small.sample(0, 0, 0) == 5 && small.sample(1, 0, 0) == 7)
    // k = 1 is identity
    assert(RasterCodec.boxDownsample(r, 1).get.data.toSeq == rgb.toSeq)
    // undersized or bad k reject
    assert(RasterCodec.boxDownsample(r, 4).isEmpty)
    assert(RasterCodec.boxDownsample(r, 0).isEmpty)
  }

  test("decode rejects junk, truncation, and unsupported shapes") {
    assert(RasterCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(RasterCodec.decode(null).isEmpty)
    val png = RasterCodec.encodePng(8, 8, testImage(8, 8))
    assert(RasterCodec.decodePng(png.take(png.length - 20)).isEmpty) // no IEND + cut IDAT
    val bmp = RasterCodec.encodeBmp(8, 8, testImage(8, 8))
    assert(RasterCodec.decodeBmp(bmp.take(40)).isEmpty)
    // 16-bit depth PNG header is refused, not mis-decoded
    val deep = png.clone()
    deep(24) = 16 // bit-depth byte inside IHDR
    assert(RasterCodec.decodePng(deep).isEmpty)
  }

  test("decode dispatches on the sniffed header, not declared metadata") {
    val rgb = testImage(4, 4)
    assert(RasterCodec.decode(RasterCodec.encodeBmp(4, 4, rgb)).get.data.toSeq == rgb.toSeq)
    assert(RasterCodec.decode(RasterCodec.encodePng(4, 4, rgb)).get.data.toSeq == rgb.toSeq)
  }
}
