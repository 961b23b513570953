package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class LosslessJpegSpec extends AnyFunSuite {

  private def ramp(w: Int, h: Int, nc: Int, lim: Int): Array[Int] =
    Array.tabulate(w * h * nc) { i =>
      val x = (i / nc) % w; val y = i / nc / w; val c = i % nc
      (x * 31 + y * 57 + c * 11 + (x * y % 13)) % (lim + 1)
    }

  test("round-trip: every predictor x precision, mono") {
    for (pred <- 1 to 7; prec <- Seq(2, 8, 12, 16)) {
      val lim = (1 << prec) - 1
      val s = ramp(9, 7, 1, lim)
      val bytes = LosslessJpeg.encode(9, 7, 1, prec, pred, s)
      val img = LosslessJpeg.decode(bytes)
      assert(img.isDefined, s"pred $pred prec $prec")
      assert(img.get.width == 9 && img.get.height == 7 &&
        img.get.components == 1 && img.get.precision == prec)
      assert(img.get.samples.toSeq == s.toSeq, s"pred $pred prec $prec")
    }
  }

  test("round-trip: three components, interleaved scan") {
    val s = ramp(6, 5, 3, 4095)
    val bytes = LosslessJpeg.encode(6, 5, 3, 12, 4, s)
    val img = LosslessJpeg.decode(bytes).get
    assert(img.components == 3 && img.samples.toSeq == s.toSeq)
  }

  test("round-trip: restart intervals reset prediction") {
    val s = ramp(16, 8, 1, 65535)
    for (ri <- Seq(1, 5, 16, 100)) {
      val bytes = LosslessJpeg.encode(16, 8, 1, 16, 7, s, restartInterval = ri)
      val img = LosslessJpeg.decode(bytes)
      assert(img.isDefined && img.get.samples.toSeq == s.toSeq, s"ri=$ri")
    }
  }

  test("16-bit wraparound: the +-32768 difference takes the category-16 path") {
    // alternating extremes force |diff| = 32768 repeatedly
    val s = Array.tabulate(8 * 2)(i => if (i % 2 == 0) 0 else 32768)
    val bytes = LosslessJpeg.encode(8, 2, 1, 16, 1, s)
    val img = LosslessJpeg.decode(bytes).get
    assert(img.samples.toSeq == s.toSeq)
  }

  test("hand-computed entropy stream for a single sample") {
    // 1x1, precision 8, value 100: default prediction 128, diff = -28
    // category 5 -> code 11110 (canonical lengths 2,2,2,3,...),
    // appended bits (-28-1) & 31 = 00011, then 1-padding to byte:
    // 11110000 11111111 -> 0xF0, 0xFF + stuffed 0x00, then EOI.
    val bytes = LosslessJpeg.encode(1, 1, 1, 8, 1, Array(100))
    val tail = bytes.takeRight(5).map(_ & 0xff).toSeq
    assert(tail == Seq(0xf0, 0xff, 0x00, 0xff, 0xd9))
    assert(LosslessJpeg.decode(bytes).get.samples.toSeq == Seq(100))
  }

  test("constant image decodes to the constant under every predictor") {
    val s = Array.fill(5 * 4)(777)
    for (pred <- 1 to 7) {
      val img = LosslessJpeg.decode(
        LosslessJpeg.encode(5, 4, 1, 12, pred, s)).get
      assert(img.samples.forall(_ == 777), s"pred $pred")
    }
  }

  test("DCT-mode JPEGs and malformed payloads are rejected cleanly") {
    val dct = JpegCodec.encodeJpegGrayBlocks(2, 2, (bx, by) => bx * 64)
    assert(LosslessJpeg.decode(dct).isEmpty) // SOF0 is not this process
    val good = LosslessJpeg.encode(9, 7, 1, 12, 4, ramp(9, 7, 1, 4095))
    assert(LosslessJpeg.decode(null).isEmpty)
    assert(LosslessJpeg.decode("junk".getBytes).isEmpty)
    for (len <- 0 until good.length)
      LosslessJpeg.decode(good.take(len)) // must never throw
    // giant declared dimensions must hit the allocation guard:
    // SOF3 height field sits at (SOI)2+(marker+len)4+1 = offset 7
    val giant = good.clone()
    giant(7) = 0x7f.toByte; giant(8) = -1; giant(9) = 0x7f.toByte; giant(10) = -1
    assert(LosslessJpeg.decode(giant).isEmpty)
  }

  test("lossless decode is bit-exact where DCT modes are lossy (the point)") {
    // encode the same 8-bit plane as baseline DCT and as lossless; the
    // lossless path must return it exactly, the DCT path only approximately
    val w = 16; val h = 16
    val plane = Array.tabulate(w * h)(i => (i * 7 + (i % 9) * 3) % 256)
    val ll = LosslessJpeg.decode(
      LosslessJpeg.encode(w, h, 1, 8, 4, plane)).get
    assert(ll.samples.toSeq == plane.toSeq)
  }
}
