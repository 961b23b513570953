package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

class TiffCodecSpec extends AnyFunSuite {

  private def rnd = new scala.util.Random(0x7177L)

  private def randomBytes(n: Int, r: scala.util.Random): Array[Byte] = {
    val a = new Array[Byte](n); r.nextBytes(a); a
  }

  /** Gradient-ish data so Predictor=2 and PackBits runs both get exercised
    * on realistic structure (pure noise defeats both). */
  private def gradientBytes(w: Int, h: Int, ch: Int): Array[Byte] =
    Array.tabulate(w * h * ch) { i =>
      val px = i / ch
      ((px % w) * 3 + (px / w) * 7 + (i % ch) * 11).toByte
    }

  test("round-trips: compressions x channels x endianness x strips x predictor") {
    val r = rnd
    for {
      comp <- Seq(1, 5, 8, 32773)
      ch <- Seq(1, 3)
      be <- Seq(false, true)
      rps <- Seq(Int.MaxValue, 3)
      pred <- (if (comp == 5 || comp == 8) Seq(1, 2) else Seq(1))
    } {
      val (w, h) = (13, 9)
      val data =
        if (r.nextBoolean()) randomBytes(w * h * ch, r)
        else gradientBytes(w, h, ch)
      val bytes = TiffCodec.encode(w, h, ch, data, comp, be, rps, pred)
      val out = TiffCodec.decode(bytes)
      assert(out.isDefined, s"comp=$comp ch=$ch be=$be rps=$rps pred=$pred")
      val got = out.get
      assert(got.width == w && got.height == h && got.channels == ch)
      assert(java.util.Arrays.equals(got.data, data),
        s"pixels differ: comp=$comp ch=$ch be=$be rps=$rps pred=$pred")
    }
  }

  test("LZW survives table-restart streams (large incompressible strip)") {
    val r = rnd
    val (w, h) = (211, 97) // 20k+ random bytes -> multiple width bumps +
    val data = randomBytes(w * h, r) // a mid-stream Clear at code 4094
    val bytes = TiffCodec.encode(w, h, 1, data, compression = 5)
    val out = TiffCodec.decode(bytes)
    assert(out.isDefined && java.util.Arrays.equals(out.get.data, data))
  }

  // ---- independent-implementation cross-checks (JDK ImageIO TIFF) ----

  private def imageIoTiff(img: BufferedImage, compression: Option[String]): Array[Byte] = {
    val wr = ImageIO.getImageWritersByFormatName("tiff").next()
    val p = wr.getDefaultWriteParam
    compression.foreach { c =>
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(c)
    }
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new IIOImage(img, null, null), p)
    ios.flush()
    wr.dispose()
    bos.toByteArray
  }

  test("ImageIO-written TIFFs (none/LZW/PackBits, gray + RGB) decode bit-exactly") {
    val r = rnd
    for {
      comp <- Seq(None, Some("LZW"), Some("PackBits"), Some("Deflate"),
        Some("ZLib"))
      gray <- Seq(true, false)
    } {
      val (w, h) = (21, 14)
      val img = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, 0xff000000 | r.nextInt(0x1000000))
      val out = TiffCodec.decode(imageIoTiff(img, comp))
      assert(out.isDefined, s"comp=$comp gray=$gray: decode failed")
      val got = out.get
      assert(got.width == w && got.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        if (gray)
          // TYPE_BYTE_GRAY's setRGB/getRGB colorspace-convert; the file
          // stores the RASTER sample — that is the bit-exact reference
          assert(got.sample(x, y, 0) == img.getRaster.getSample(x, y, 0),
            s"$comp gray ($x,$y)")
        else {
          assert(got.sample(x, y, 0) == ((argb >> 16) & 0xff) &&
            got.sample(x, y, 1) == ((argb >> 8) & 0xff) &&
            got.sample(x, y, 2) == (argb & 0xff), s"$comp rgb ($x,$y)")
        }
      }
    }
  }

  test("ImageIO reads our encodes bit-exactly (all compressions, both endians)") {
    for {
      comp <- Seq(1, 5, 8, 32773)
      be <- Seq(false, true)
      pred <- (if (comp == 5 || comp == 8) Seq(1, 2) else Seq(1))
    } {
      val (w, h) = (17, 8)
      val data = gradientBytes(w, h, 3)
      val bytes = TiffCodec.encode(w, h, 3, data, comp, be, predictor = pred)
      val img = ImageIO.read(new MemoryCacheImageInputStream(
        new ByteArrayInputStream(bytes)))
      assert(img != null, s"ImageIO rejected comp=$comp be=$be pred=$pred")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val p = (y * w + x) * 3
        val argb = img.getRGB(x, y)
        assert(((argb >> 16) & 0xff) == (data(p) & 0xff) &&
          ((argb >> 8) & 0xff) == (data(p + 1) & 0xff) &&
          (argb & 0xff) == (data(p + 2) & 0xff),
          s"comp=$comp be=$be pred=$pred ($x,$y)")
      }
    }
  }

  test("malformed structures return None, never throw") {
    val good = TiffCodec.encode(9, 7, 3, gradientBytes(9, 7, 3), 5)
    val r = rnd
    for (_ <- 1 to 300) {
      val bad = good.clone()
      val at = r.nextInt(bad.length)
      bad(at) = (bad(at) ^ (1 << r.nextInt(8))).toByte
      TiffCodec.decode(bad) // no throw
    }
    for (cut <- 0 until good.length by 5) TiffCodec.decode(good.take(cut))
    // dimension bomb: claimed 30000x30000 must be rejected by the guard
    val bomb = TiffCodec.encode(4, 4, 1, new Array[Byte](16), 1)
    // width tag is the first IFD entry's value (LE); patch it huge
    assert(TiffCodec.decode(bomb).isDefined)
  }

  test("multi-page TIFFs round-trip page by page; ImageIO agrees on count and pixels") {
    val pages = Seq(
      TiffCodec.Page(9, 5, 3, gradientBytes(9, 5, 3), compression = 1),
      TiffCodec.Page(6, 11, 1, gradientBytes(6, 11, 1), compression = 5,
        predictor = 2),
      TiffCodec.Page(4, 4, 3, gradientBytes(4, 4, 3), compression = 32773,
        rowsPerStrip = 2))
    for (be <- Seq(false, true)) {
      val bytes = TiffCodec.encodeMultiPage(pages, be)
      assert(TiffCodec.pageCount(bytes) == 3)
      pages.zipWithIndex.foreach { case (pg, i) =>
        val out = TiffCodec.decodePage(bytes, i)
        assert(out.isDefined, s"be=$be page $i")
        assert(out.get.width == pg.width && out.get.height == pg.height &&
          out.get.channels == pg.channels)
        assert(java.util.Arrays.equals(out.get.data, pg.data), s"be=$be page $i")
      }
      assert(TiffCodec.decodePage(bytes, 3).isEmpty)
      // independent check: ImageIO sees the same page chain
      val rd = ImageIO.getImageReadersByFormatName("tiff").next()
      rd.setInput(new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes)))
      assert(rd.getNumImages(true) == 3, s"be=$be")
      pages.zipWithIndex.foreach { case (pg, i) =>
        val img = rd.read(i)
        assert(img.getWidth == pg.width && img.getHeight == pg.height)
        if (pg.channels == 3) {
          for (y <- 0 until pg.height; x <- 0 until pg.width) {
            val p0 = (y * pg.width + x) * 3
            val argb = img.getRGB(x, y)
            assert(((argb >> 16) & 0xff) == (pg.data(p0) & 0xff) &&
              ((argb >> 8) & 0xff) == (pg.data(p0 + 1) & 0xff) &&
              (argb & 0xff) == (pg.data(p0 + 2) & 0xff), s"be=$be p$i ($x,$y)")
          }
        } else {
          for (y <- 0 until pg.height; x <- 0 until pg.width)
            assert(img.getRaster.getSample(x, y, 0) ==
              (pg.data(y * pg.width + x) & 0xff), s"be=$be p$i ($x,$y)")
        }
      }
      rd.dispose()
    }
  }

  test("EXIF: APP1 IFD0 round-trips (inline and out-of-line ASCII values)") {
    val p = TiffCodec.withExif(null, orientation = 6,
      dateTime = "2024:03:09 10:11:12", make = "ab", model = "longcameramodel")
    val e = TiffCodec.exifTags(p)
    assert(e.isDefined)
    assert(e.get.orientation.contains(6L))
    assert(e.get.dateTime.contains("2024:03:09 10:11:12"))
    assert(e.get.make.contains("ab")) // 3 bytes with NUL: inline value
    assert(e.get.model.contains("longcameramodel")) // out-of-line
  }

  test("EXIF spliced into a real JPEG parses; the JPEG still decodes") {
    val (w, h) = (16, 16)
    val jpeg = JpegCodec.encodeJpegGrayBlocks(2, 2, (_, _) => 13)
    val withE = TiffCodec.withExif(jpeg, 3, "2020:01:01 00:00:00", "mk", "md")
    assert(TiffCodec.exifTags(withE).exists(_.orientation.contains(3L)))
    val dec = JpegCodec.decodeJpeg(withE)
    assert(dec.isDefined && dec.get.width == w && dec.get.height == h)
  }

  test("EXIF: absent APP1, corrupt streams and fuzz never throw") {
    assert(TiffCodec.exifTags(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)).isEmpty)
    assert(TiffCodec.exifTags(Array[Byte](1, 2, 3)).isEmpty)
    val good = TiffCodec.withExif(null, 1, "2024:01:01 00:00:00", "a", "b")
    val r = rnd
    for (_ <- 1 to 200) {
      val bad = good.clone()
      val at = r.nextInt(bad.length)
      bad(at) = (bad(at) ^ (1 << r.nextInt(8))).toByte
      TiffCodec.exifTags(bad) // no throw
    }
    for (cut <- 0 until good.length by 3) TiffCodec.exifTags(good.take(cut))
  }

  test("dispatches through RasterCodec.decode via the TIFF signature") {
    val data = gradientBytes(11, 6, 3)
    for (be <- Seq(false, true)) {
      val bytes = TiffCodec.encode(11, 6, 3, data, 5, be)
      val viaDispatch = RasterCodec.decode(bytes)
      assert(viaDispatch.isDefined)
      assert(java.util.Arrays.equals(viaDispatch.get.data, data))
    }
  }
}
