package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic fuzz pass over every dependency-free codec: random bytes,
  * truncations, and single-byte mutations of valid payloads. The contract
  * under test is the 100 TB one — a malformed payload in a distributed
  * decode yields None (or a decoded raster for harmless mutations), NEVER
  * an exception that would fail the task and kill the job. */
class CodecFuzzSpec extends AnyFunSuite {

  private def decoders: Seq[(String, Array[Byte] => Option[Any])] = Seq(
    ("bmp", RasterCodec.decodeBmp _),
    ("png", RasterCodec.decodePng _),
    ("jpeg", JpegCodec.decodeJpeg _),
    ("gif", GifCodec.decodeGif _),
    ("wav", AudioCodec.decodeWav _),
    ("sniff-img", (b: Array[Byte]) => Multimodal.sniffImageHeader(b)),
    ("sniff-wav", (b: Array[Byte]) => AudioCodec.sniffWav(b)),
    ("sniff-mp3", (b: Array[Byte]) => Multimodal.sniffMp3Header(b)),
    ("sniff-mp4", (b: Array[Byte]) => Multimodal.sniffVideoHeader(b)),
    ("dispatch", RasterCodec.decode _))

  private def validPayloads: Seq[(String, Array[Byte])] = {
    val rgb = Array.tabulate(16 * 16 * 3)(i => (i * 7 % 256).toByte)
    val palette = Array.tabulate(768)(i => (i % 256).toByte)
    val idx = Array.tabulate(256)(i => (i % 256).toByte)
    Seq(
      ("bmp", RasterCodec.encodeBmp(16, 16, rgb)),
      ("png", RasterCodec.encodePng(16, 16, rgb)),
      ("jpeg", JpegCodec.encodeJpegGrayBlocks(2, 2, (bx, by) => bx * 64 + by * 32)),
      ("jpeg-prog", JpegCodec.encodeJpegGrayBlocksProgressive(2, 2,
        (bx, by) => bx * 64 + by * 32)),
      ("gif", GifCodec.encodeGif(16, 16, palette, idx)),
      ("wav", AudioCodec.encodeWavPcm16(8000, 2,
        Array.tabulate(200)(i => (i * 331 % 65536 - 32768).toShort))))
  }

  private def exercise(name: String, bytes: Array[Byte]): Unit =
    for ((dn, d) <- decoders) {
      try d(bytes) catch {
        case e: Throwable =>
          fail(s"$dn threw ${e.getClass.getSimpleName} on $name " +
            s"(len=${bytes.length}): ${e.getMessage}")
      }
    }

  test("random byte blobs never throw in any decoder") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 300) {
      val len = rnd.nextInt(4096)
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      exercise(s"random#$trial", b)
    }
  }

  test("random blobs behind valid magic bytes never throw") {
    val rnd = new scala.util.Random(7L)
    val magics = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte),
      "GIF89a".getBytes,
      "BM".getBytes,
      "RIFF1234WAVE".getBytes,
      Array[Byte](0, 0, 0, 24) ++ "ftyp".getBytes ++ "isom".getBytes,
      "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 8),
      Array[Byte](0xff.toByte, 0xfb.toByte))
    for (magic <- magics; trial <- 0 until 80) {
      val tail = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(tail)
      exercise(s"magic+random#$trial", magic ++ tail)
    }
  }

  test("every truncation of a valid payload never throws") {
    for ((name, full) <- validPayloads;
         cut <- 0 until math.min(full.length, 200)) // all short prefixes
      exercise(s"$name truncated@$cut", full.take(cut))
    for ((name, full) <- validPayloads; frac <- 1 until 20) // longer cuts
      exercise(s"$name truncated/$frac", full.take(full.length * frac / 20))
  }

  test("single-byte mutations of valid payloads never throw") {
    val rnd = new scala.util.Random(99L)
    for ((name, full) <- validPayloads; trial <- 0 until 400) {
      val b = full.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      exercise(s"$name mutated#$trial", b)
    }
  }
}
