package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class GifCodecSpec extends AnyFunSuite {

  // palette: entry k = (k, 255-k, k^0x55) — all 256 entries distinct
  private val palette: Array[Byte] = Array.tabulate(768) { i =>
    val k = i / 3
    (i % 3 match {
      case 0 => k
      case 1 => 255 - k
      case 2 => k ^ 0x55
    }).toByte
  }

  private def indicesOf(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 31 + 7) % 256).toByte)

  test("LZW round-trip: every palette index decodes to its exact RGB") {
    for ((w, h) <- Seq((16, 16), (7, 5), (1, 9), (300, 3))) {
      val idx = indicesOf(w, h)
      val bytes = GifCodec.encodeGif(w, h, palette, idx)
      val r = GifCodec.decodeGif(bytes)
      assert(r.isDefined, s"${w}x$h")
      assert(r.get.width == w && r.get.height == h && r.get.channels == 3)
      for (i <- 0 until w * h) {
        val k = idx(i) & 0xff
        assert(r.get.data(i * 3) == palette(k * 3) &&
          r.get.data(i * 3 + 1) == palette(k * 3 + 1) &&
          r.get.data(i * 3 + 2) == palette(k * 3 + 2), s"${w}x$h pixel $i")
      }
    }
  }

  test("interlaced frames come back in display order") {
    val (w, h) = (8, 16)
    val orig = indicesOf(w, h)
    // the stream stores rows in the 4-pass interlace order; build that
    // permutation, encode it, flip the interlace flag, and expect the
    // decoder to hand back display order
    val passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))
    val streamRows = passes.flatMap { case (off, step) => off until h by step }
    val permuted = new Array[Byte](w * h)
    for ((y, r) <- streamRows.zipWithIndex)
      System.arraycopy(orig, y * w, permuted, r * w, w)
    val bytes = GifCodec.encodeGif(w, h, palette, permuted)
    bytes(13 + 768 + 9) = (bytes(13 + 768 + 9) | 0x40).toByte // interlace bit
    val r = GifCodec.decodeGif(bytes)
    assert(r.isDefined)
    for (i <- 0 until w * h) {
      val k = orig(i) & 0xff
      assert(r.get.data(i * 3) == palette(k * 3), s"pixel $i")
    }
  }

  test("GIF89a extension blocks before the frame are skipped") {
    val base = GifCodec.encodeGif(4, 4, palette, indicesOf(4, 4))
    val at = 13 + 768 // image descriptor offset
    val gce = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0) // GCE block
    val out = new Array[Byte](base.length + gce.length)
    System.arraycopy(base, 0, out, 0, at)
    System.arraycopy(gce, 0, out, at, gce.length)
    System.arraycopy(base, at, out, at + gce.length, base.length - at)
    val r = GifCodec.decodeGif(out)
    assert(r.isDefined && r.get.width == 4)
    assert(r.get.data.toSeq == GifCodec.decodeGif(base).get.data.toSeq)
  }

  test("malformed payloads return None, never throw") {
    val good = GifCodec.encodeGif(8, 8, palette, indicesOf(8, 8))
    val cases = Seq[Array[Byte]](
      null,
      Array.emptyByteArray,
      "GIF89a".getBytes, // header only
      good.take(12), // truncated screen descriptor
      good.take(13 + 768 + 5), // truncated image descriptor
      good.take(13 + 768 + 10), // descriptor but no LZW min-code/data
      good.dropRight(8), // truncated LZW stream
      { val b = good.clone(); b(13 + 768) = 0x3b; b }) // trailer, no frame
    for ((c, idx) <- cases.zipWithIndex) {
      val r = try GifCodec.decodeGif(c) catch {
        case e: Throwable => fail(s"case $idx threw ${e.getClass.getName}")
      }
      assert(r.isEmpty, s"case $idx decoded")
    }
  }

  test("decode dispatches through the sniffed gif header") {
    val bytes = GifCodec.encodeGif(6, 3, palette, indicesOf(6, 3))
    assert(Multimodal.sniffImageHeader(bytes).contains(("gif", 6, 3)))
    assert(RasterCodec.decode(bytes).isDefined)
  }
}
