package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class CharsetSniffSpec extends AnyFunSuite with SparkSpec {
  import CharsetSniff._
  import java.nio.charset.StandardCharsets._

  test("BOM detection strips the BOM and decodes the tail") {
    val t = "héllo"
    assert(sniffDecode(Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      t.getBytes(UTF_8)) == (("utf8-bom", t)))
    assert(sniffDecode(Array[Byte](0xff.toByte, 0xfe.toByte) ++
      t.getBytes(UTF_16LE)) == (("utf16le-bom", t)))
    assert(sniffDecode(Array[Byte](0xfe.toByte, 0xff.toByte) ++
      t.getBytes(UTF_16BE)) == (("utf16be-bom", t)))
  }

  test("strict UTF-8 walk accepts 1-4 byte forms, rejects the RFC 3629 traps") {
    assert(isValidUtf8("plain ascii".getBytes(UTF_8), 0))
    assert(isValidUtf8("é€😀".getBytes(UTF_8), 0)) // 2,3,4-byte
    // overlong '/' (C0 AF)
    assert(!isValidUtf8(Array(0xc0.toByte, 0xaf.toByte), 0))
    // overlong 3-byte (E0 80 80)
    assert(!isValidUtf8(Array(0xe0.toByte, 0x80.toByte, 0x80.toByte), 0))
    // surrogate U+D800 (ED A0 80)
    assert(!isValidUtf8(Array(0xed.toByte, 0xa0.toByte, 0x80.toByte), 0))
    // > U+10FFFF (F4 90 80 80)
    assert(!isValidUtf8(Array(0xf4.toByte, 0x90.toByte, 0x80.toByte,
      0x80.toByte), 0))
    // bare continuation, truncated tail, F5 lead
    assert(!isValidUtf8(Array(0x80.toByte), 0))
    assert(!isValidUtf8("é".getBytes(UTF_8).take(1), 0))
    assert(!isValidUtf8(Array(0xf5.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte), 0))
  }

  test("valid UTF-8 classifies utf8; invalid falls back to latin1 totally") {
    assert(sniffDecode("naïve".getBytes(UTF_8)) == (("utf8", "naïve")))
    val latin = "café".getBytes(ISO_8859_1) // é = 0xE9, invalid UTF-8
    assert(sniffDecode(latin) == (("latin1", "café")))
    // arbitrary binary never throws
    val junk = Array.tabulate[Byte](64)(i => (i * 37 + 129).toByte)
    val (cs, s) = sniffDecode(junk)
    assert(cs == "latin1" && s.length == 64)
    assert(sniffDecode(Array.emptyByteArray) == (("empty", "")))
    assert(sniffDecode(null) == (("empty", "")))
  }

  test("decodeDocs round-trips a mixed-encoding corpus distributed") {
    import spark.implicits._
    val texts = Seq(1L -> "alpha", 2L -> "βετα", 3L -> "gamma é")
    val raw = texts.map { case (id, t) =>
      val b = id % 3 match {
        case 1 => Array[Byte](0xff.toByte, 0xfe.toByte) ++ t.getBytes(UTF_16LE)
        case 2 => t.getBytes(UTF_8)
        case _ => t.getBytes(ISO_8859_1)
      }
      (id, b)
    }.toDF("doc_id", "raw")
    val out = CharsetSniff.decodeDocs(spark, raw, "doc_id", "raw")
      .collect().sortBy(_.doc_id)
    assert(out(0) == Decoded(1L, "utf16le-bom", "alpha", 5L))
    assert(out(1) == Decoded(2L, "utf8", "βετα", 4L))
    assert(out(2) == Decoded(3L, "latin1", "gamma é", 7L))
  }
}
