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
    val progressive = good.clone()
    // SOF0 marker (FFC0) -> SOF2 (progressive): find and patch it
    val sofAt = good.indices.find(i => (good(i) & 0xff) == 0xff &&
      i + 1 < good.length && (good(i + 1) & 0xff) == 0xc0).get
    progressive(sofAt + 1) = 0xc2.toByte
    val cases = Seq[Array[Byte]](
      null,
      Array.emptyByteArray,
      Array[Byte](0xff.toByte, 0xd8.toByte), // SOI only
      good.take(20), // truncated in the headers
      progressive, // progressive DCT: unsupported -> None
      { val b = good.clone(); b(2) = 0x00; b }, // desynced marker stream
      good.takeWhile(_ => true).dropRight(good.length - 4) // header stub
    )
    for ((c, idx) <- cases.zipWithIndex)
      assert(JpegCodec.decodeJpeg(c).isEmpty, s"case $idx decoded")
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
