package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class NpyShardSpec extends AnyFunSuite with SparkSpec {
  import NpyShard._

  private def f4bytes(vs: Float*): Array[Byte] =
    SafetensorsShard.encodeF32(vs.toArray)
  private def i8bytes(vs: Long*): Array[Byte] =
    SafetensorsShard.encodeI64(vs.toArray)

  test("npy round-trip: header fields, alignment, values") {
    val npy = encodeNpy("f4", Seq(2, 3), f4bytes(1f, 2.5f, -3.25f, 0f, 4f, 0.75f))
    // numpy v1 layout: data starts 64-byte aligned
    val Some(a) = parseNpy(npy)
    assert(a.descr == "f4" && a.shape == Seq(2L, 3L))
    assert(a.dataOff % 64 == 0)
    assert(readF4(a).toSeq == Seq(1f, 2.5f, -3.25f, 0f, 4f, 0.75f))
    val (nd, ne, sum, mn, mx) = stats(a)
    assert((nd, ne, sum, mn, mx) == ((2L, 6L, 5.0, -3.25, 4.0)))
  }

  test("1-D shape uses the (n,) tuple form numpy writes") {
    val npy = encodeNpy("i8", Seq(3), i8bytes(7, -2, 40))
    val header = new String(npy, 10, npy.length - 10 - 24, "ISO-8859-1")
    assert(header.contains("'shape': (3,)"))
    val Some(a) = parseNpy(npy)
    assert(a.shape == Seq(3L) && stats(a)._3 == 45.0)
  }

  test("damage rejects: magic, version, fortran, big-endian, descr, length") {
    val good = encodeNpy("i8", Seq(2), i8bytes(1, 2))
    assert(parseNpy(null).isEmpty)
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(parseNpy(badMagic).isEmpty)
    val badVer = good.clone(); badVer(6) = 9
    assert(parseNpy(badVer).isEmpty)
    assert(parseNpy(java.util.Arrays.copyOfRange(good, 0, good.length - 3)).isEmpty)
    def hand(hdr: String, dataLen: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(0x93); out.write('N'); out.write('U'); out.write('M')
      out.write('P'); out.write('Y'); out.write(1); out.write(0)
      out.write(hdr.length & 0xff); out.write((hdr.length >> 8) & 0xff)
      out.write(hdr.getBytes("ISO-8859-1"))
      (0 until dataLen).foreach(_ => out.write(0))
      out.toByteArray
    }
    assert(parseNpy(hand(
      "{'descr': '<i8', 'fortran_order': True, 'shape': (1,), }", 8)).isEmpty)
    assert(parseNpy(hand(
      "{'descr': '>i8', 'fortran_order': False, 'shape': (1,), }", 8)).isEmpty)
    assert(parseNpy(hand(
      "{'descr': '<c16', 'fortran_order': False, 'shape': (1,), }", 16)).isEmpty)
    assert(parseNpy(hand(
      "{'descr': '<i8', 'fortran_order': False, 'shape': (2,), }", 8)).isEmpty)
  }

  test("npz explode: per-member rows; a damaged member drops, others survive") {
    import spark.implicits._
    val npz = encodeNpz(Seq(
      ("emb", "f4", Seq(2, 2), f4bytes(1f, 2f, 3f, 4f)),
      ("ids", "i8", Seq(2), i8bytes(10, 20))))
    // a zip with one valid npy member and one junk member
    val mixed = ZipShard.encodeZip(Seq(
      ("ok.npy", encodeNpy("u1", Seq(3), Array[Byte](5, 6, 7)), false),
      ("junk.npy", Array[Byte](1, 2, 3), false)))
    val df = Seq((1L, npz), (2L, mixed), (3L, Array[Byte](9)))
      .toDF("shard_id", "payload")
    val out = NpyShard.explodeNpz(spark, df)
      .orderBy("shard_id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4),
        r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1L, "emb", "f4", 4L, 10.0),
      (1L, "ids", "i8", 2L, 30.0),
      (2L, "ok", "u1", 3L, 18.0)))
  }
}
