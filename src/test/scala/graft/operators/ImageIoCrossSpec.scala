package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation fixtures against `javax.imageio` (in the JDK — no
  * new dependency): our PNG decode must match ImageIO's PNG encoder
  * bit-exactly (PNG is lossless, so any divergence is a bug on one side),
  * our PNG encoder must be readable by ImageIO bit-exactly, and our JPEG
  * decode must agree with ImageIO's decode of ImageIO-encoded images
  * within a small per-pixel delta (IDCT rounding and chroma-upsampling
  * filters legitimately differ between conformant decoders).
  *
  * This kills the symmetric-bug class that pure round-trip tests cannot
  * see: an encoder and decoder that share a mistaken constant still
  * round-trip clean, but cannot both agree with an independent
  * implementation (VERDICT r7 "Next #2").
  */
class ImageIoCrossSpec extends AnyFunSuite {

  private def rnd = new scala.util.Random(20260813L)

  private def randomImage(w: Int, h: Int, imageType: Int): BufferedImage = {
    val r = rnd
    val img = new BufferedImage(w, h, imageType)
    for (y <- 0 until h; x <- 0 until w) {
      val a = if (imageType == BufferedImage.TYPE_INT_ARGB) r.nextInt(256) else 0xff
      img.setRGB(x, y, (a << 24) | r.nextInt(0x1000000))
    }
    img
  }

  private def pngBytes(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  private def jpegBytes(img: BufferedImage, quality: Float): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    w.setOutput(new MemoryCacheImageOutputStream(bos))
    w.write(null, new IIOImage(img, null, null), p)
    w.dispose()
    bos.toByteArray
  }

  test("PNG: ImageIO-encoded random RGB decodes bit-exactly") {
    for ((w, h) <- Seq((16, 16), (7, 5), (1, 1), (33, 2))) {
      val img = randomImage(w, h, BufferedImage.TYPE_INT_RGB)
      val r = RasterCodec.decodePng(pngBytes(img))
      assert(r.isDefined, s"${w}x$h: decode failed")
      assert(r.get.width == w && r.get.height == h && r.get.channels == 3)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        assert(r.get.sample(x, y, 0) == ((argb >> 16) & 0xff) &&
          r.get.sample(x, y, 1) == ((argb >> 8) & 0xff) &&
          r.get.sample(x, y, 2) == (argb & 0xff), s"${w}x$h ($x,$y)")
      }
    }
  }

  test("PNG: ImageIO-encoded random RGBA decodes bit-exactly incl. alpha") {
    val (w, h) = (19, 11)
    val img = randomImage(w, h, BufferedImage.TYPE_INT_ARGB)
    val r = RasterCodec.decodePng(pngBytes(img))
    assert(r.isDefined && r.get.channels == 4)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      assert(r.get.sample(x, y, 0) == ((argb >> 16) & 0xff) &&
        r.get.sample(x, y, 1) == ((argb >> 8) & 0xff) &&
        r.get.sample(x, y, 2) == (argb & 0xff) &&
        r.get.sample(x, y, 3) == ((argb >>> 24) & 0xff), s"($x,$y)")
    }
  }

  test("PNG: ImageIO-encoded grayscale decodes bit-exactly as 1 channel") {
    val (w, h) = (13, 9)
    val r0 = rnd
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val px = Array.fill(w * h)(r0.nextInt(256))
    // write raw raster samples: TYPE_BYTE_GRAY's setRGB would route the
    // value through an sRGB->linear-gray colorspace conversion
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x))
    val r = RasterCodec.decodePng(pngBytes(img))
    assert(r.isDefined && r.get.channels == 1)
    for (y <- 0 until h; x <- 0 until w)
      assert(r.get.sample(x, y, 0) == px(y * w + x), s"($x,$y)")
  }

  test("PNG: our encoder's output is read bit-exactly by ImageIO") {
    val (w, h) = (17, 6)
    val r0 = rnd
    val raw = Array.fill(w * h * 3)(r0.nextInt(256).toByte)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(
      RasterCodec.encodePng(w, h, raw)))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val p = (y * w + x) * 3
      assert(((argb >> 16) & 0xff) == (raw(p) & 0xff) &&
        ((argb >> 8) & 0xff) == (raw(p + 1) & 0xff) &&
        (argb & 0xff) == (raw(p + 2) & 0xff), s"($x,$y)")
    }
  }

  test("JPEG: grayscale ImageIO encode — our decode within ±2 of ImageIO's") {
    val (w, h) = (40, 24)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      // smooth + textured mix so every DCT band carries energy; raw raster
      // write (setRGB on TYPE_BYTE_GRAY would gamma-convert the value)
      val v = (128 + 90 * math.sin(x * 0.3) * math.cos(y * 0.22) +
        20 * math.sin((x + y) * 1.1)).round.toInt.max(0).min(255)
      img.getRaster.setSample(x, y, 0, v)
    }
    for (q <- Seq(0.95f, 0.75f)) {
      val bytes = jpegBytes(img, q)
      val ours = JpegCodec.decodeJpeg(bytes)
      assert(ours.isDefined, s"q=$q: decode failed")
      assert(ours.get.channels == 1 && ours.get.width == w)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var maxDelta = 0
      for (y <- 0 until h; x <- 0 until w) {
        val want = ref.getRaster.getSample(x, y, 0) // raw, not gamma-mapped
        maxDelta = maxDelta.max(math.abs(ours.get.sample(x, y, 0) - want))
      }
      assert(maxDelta <= 2, s"q=$q: max per-pixel delta $maxDelta > 2")
    }
  }

  test("JPEG: color 4:2:0 ImageIO encode — luma-faithful vs ImageIO decode") {
    // ImageIO always writes 4:2:0 (luma hv=22); its decoder uses a
    // different chroma upsampling filter than our nearest-neighbor, so an
    // exact-delta bound only holds where chroma is smooth. Keep chroma
    // slowly varying and assert a tight bound; this still cross-checks
    // Huffman tables, dequantization, IDCT, and the YCbCr matrix.
    val (w, h) = (48, 32)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (128 + 100 * math.sin(x * 0.08)).round.toInt.max(0).min(255)
      val g = (128 + 100 * math.cos(y * 0.07)).round.toInt.max(0).min(255)
      val b = (128 + 80 * math.sin((x + y) * 0.05)).round.toInt.max(0).min(255)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = jpegBytes(img, 0.9f)
    val ours = JpegCodec.decodeJpeg(bytes)
    assert(ours.isDefined && ours.get.channels == 3)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxRgb = 0
    var maxLuma = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val argb = ref.getRGB(x, y)
      var oy = 0.0; var ry = 0.0
      for (c <- 0 until 3) {
        val want = (argb >> ((2 - c) * 8)) & 0xff
        val got = ours.get.sample(x, y, c)
        maxRgb = maxRgb.max(math.abs(got - want))
        val wY = Array(0.299, 0.587, 0.114)(c)
        oy += wY * got; ry += wY * want
      }
      maxLuma = maxLuma.max(math.abs(oy - ry))
    }
    // luma has no upsampling step -> tight bound; chroma channels admit
    // the nearest-vs-triangle upsampling filter difference
    assert(maxLuma <= 2.5, s"max per-pixel luma delta $maxLuma > 2.5")
    assert(maxRgb <= 8, s"max per-pixel RGB delta $maxRgb > 8")
  }

  test("BMP: ImageIO-encoded random RGB decodes bit-exactly (lossless)") {
    val img = randomImage(23, 17, BufferedImage.TYPE_INT_RGB) // odd width: row padding
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "bmp", bos))
    val ours = RasterCodec.decodeBmp(bos.toByteArray)
      .getOrElse(fail("our BMP decode rejected ImageIO output"))
    assert(ours.width == 23 && ours.height == 17 && ours.channels == 3)
    for (y <- 0 until 17; x <- 0 until 23; c <- 0 until 3) {
      val want = (img.getRGB(x, y) >> ((2 - c) * 8)) & 0xff
      assert(ours.sample(x, y, c) == want, s"($x,$y,$c)")
    }
  }

  test("BMP: our encoder's output is read bit-exactly by ImageIO") {
    val w = 21; val h = 9
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    val bytes = RasterCodec.encodeBmp(w, h, rgb)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "ImageIO could not read our BMP")
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val want = rgb((y * w + x) * 3 + c) & 0xff
      assert(((ref.getRGB(x, y) >> ((2 - c) * 8)) & 0xff) == want, s"($x,$y,$c)")
    }
  }

  test("GIF: ImageIO-encoded indexed image decodes to identical pixels") {
    // an indexed source makes the ImageIO GIF write lossless (no
    // quantization step), so our LZW decode must agree bit-exactly
    val w = 31; val h = 13
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
    val r = rnd
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, img.getColorModel.getRGB(r.nextInt(256)) | 0xff000000)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "gif", bos))
    val ours = GifCodec.decodeGif(bos.toByteArray)
      .getOrElse(fail("our GIF decode rejected ImageIO output"))
    assert(ours.width == w && ours.height == h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val want = (img.getRGB(x, y) >> ((2 - c) * 8)) & 0xff
      assert(ours.sample(x, y, if (ours.channels >= 3) c else 0) == want,
        s"($x,$y,$c)")
    }
  }

  test("WAV: our PCM encode is read sample-exactly by javax.sound") {
    val samples = Array.tabulate(400)(i =>
      (12000 * math.sin(i / 7.0)).toInt.toShort)
    val bytes = AudioCodec.encodeWavPcm16(8000, 1, samples)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    val raw = in.readAllBytes()
    assert(raw.length == samples.length * 2)
    for (i <- samples.indices) {
      val v = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
      assert(v == samples(i), s"sample $i")
    }
  }
}
