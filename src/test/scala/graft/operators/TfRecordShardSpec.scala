package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** [[TfRecordShard]]: masked-CRC32C framing (validated against an
  * independently-written bitwise CRC-32C reference), gzip transparency,
  * the graded failure contract (data-CRC skip vs length-CRC stop), bomb
  * guards, distributed explode, and the distributed write side. */
class TfRecordShardSpec extends AnyFunSuite with SparkSpec {

  /** Independent bitwise CRC-32C (reflected poly 0x82F63B78) — written
    * from the polynomial definition, no table, no JDK class, so agreement
    * with the operator's JDK-backed CRC is a real cross-check. */
  private def refCrc32c(bytes: Array[Byte]): Int = {
    var crc = 0xffffffff
    for (b <- bytes) {
      crc ^= (b & 0xff)
      var k = 0
      while (k < 8) {
        crc = if ((crc & 1) != 0) (crc >>> 1) ^ 0x82f63b78 else crc >>> 1
        k += 1
      }
    }
    ~crc
  }

  private def refMasked(bytes: Array[Byte]): Int =
    Integer.rotateRight(refCrc32c(bytes), 15) + 0xa282ead8

  private def recsOf(id: Long, payload: Array[Byte],
                     maxRecordBytes: Int = 64 << 20,
                     maxRecords: Int = 1 << 20): Seq[(Long, String)] =
    TfRecordShard.parseShard(id, payload, maxRecordBytes, maxRecords)
      .map(r => (r.rec_idx, new String(r.record, "UTF-8")))

  test("masked CRC32C matches the bitwise reference incl. the known vector") {
    // public CRC-32C test vector: crc32c("123456789") = 0xE3069283
    val nine = "123456789".getBytes("US-ASCII")
    assert(refCrc32c(nine) == 0xe3069283)
    assert(TfRecordShard.maskedCrc32c(nine, 0, nine.length) == refMasked(nine))
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 7, 8, 63, 1024)) {
      val b = Array.fill(n)(rnd.nextInt().toByte)
      assert(TfRecordShard.maskedCrc32c(b, 0, n) == refMasked(b),
        s"masked crc mismatch at len $n")
    }
  }

  test("round trip: plain and whole-file gzip") {
    val recs = Seq("alpha", "b", "", "gamma-gamma").map(_.getBytes("UTF-8"))
    for (gz <- Seq(false, true)) {
      val payload = TfRecordShard.encodeShard(recs, gzip = gz)
      val got = recsOf(5L, payload)
      assert(got == Seq((0L, "alpha"), (1L, "b"), (2L, ""), (3L, "gamma-gamma")),
        s"gzip=$gz")
    }
  }

  test("corrupt data CRC skips exactly that record and keeps its index slot") {
    val recs = Seq("r0", "r1", "r2").map(_.getBytes("UTF-8"))
    val bad = TfRecordShard.corruptRecordData(
      TfRecordShard.encodeShard(recs), recIdx = 1)
    assert(recsOf(1L, bad) == Seq((0L, "r0"), (2L, "r2")))
  }

  test("corrupt length CRC stops the walk (framing untrusted)") {
    val good = TfRecordShard.encodeShard(
      Seq("aa", "bb", "cc").map(_.getBytes("UTF-8")))
    // flip a byte of record 1's LENGTH field: rec0 is 2 bytes -> its frame
    // is 12+2+4=18 bytes; rec1's length starts at offset 18
    val bad = good.clone(); bad(18) = (bad(18) ^ 0x01).toByte
    assert(recsOf(1L, bad) == Seq((0L, "aa")))
    // garbage appended after the last record: header reads 12 bytes of
    // noise, length CRC fails, records before it all survive
    val trailing = good ++ Array.fill(12)(0xaa.toByte)
    assert(recsOf(1L, trailing) == Seq((0L, "aa"), (1L, "bb"), (2L, "cc")))
  }

  test("truncation keeps the complete records; short trailing header stops") {
    val payload = TfRecordShard.encodeShard(
      Seq("first", "second").map(_.getBytes("UTF-8")))
    // cut mid-way through record 1's data
    val cut = payload.take(12 + 5 + 4 + 12 + 3)
    assert(recsOf(1L, cut) == Seq((0L, "first")))
    // 4 stray bytes after a valid record: partial header, stop cleanly
    val stray = TfRecordShard.encodeShard(Seq("x".getBytes)) ++
      Array[Byte](1, 2, 3, 4)
    assert(recsOf(1L, stray) == Seq((0L, "x")))
  }

  test("bomb guards: over-guard record streamed past, record-count cap") {
    val recs = Seq("tiny", "x" * 100, "after").map(_.getBytes("UTF-8"))
    val payload = TfRecordShard.encodeShard(recs)
    assert(recsOf(1L, payload, maxRecordBytes = 10) ==
      Seq((0L, "tiny"), (2L, "after")))
    // same through gzip (the stream-skip path on a decompressor)
    val gzPayload = TfRecordShard.encodeShard(recs, gzip = true)
    assert(recsOf(1L, gzPayload, maxRecordBytes = 10) ==
      Seq((0L, "tiny"), (2L, "after")))
    assert(recsOf(1L, payload, maxRecords = 2) ==
      Seq((0L, "tiny"), (1L, "x" * 100)))
  }

  test("empty/null payloads and bit-flip fuzz never throw") {
    assert(TfRecordShard.parseShard(1L, Array.emptyByteArray).isEmpty)
    assert(TfRecordShard.parseShard(1L, null).isEmpty)
    val rnd = new scala.util.Random(13)
    val base = TfRecordShard.encodeShard(
      (0 until 5).map(i => s"record-$i-payload".getBytes("UTF-8")),
      gzip = true)
    for (_ <- 0 until 200) {
      val b = base.clone()
      b(rnd.nextInt(b.length)) = (b(rnd.nextInt(b.length)) ^ (1 << rnd.nextInt(8))).toByte
      TfRecordShard.parseShard(1L, b) // must not throw
    }
    for (n <- Seq(1, 11, 12, 13, 40)) {
      TfRecordShard.parseShard(1L, Array.fill(n)(rnd.nextInt().toByte))
    }
  }

  test("distributed explode matches local parse") {
    import spark.implicits._
    val shards = (0L until 6L).map { id =>
      val recs = (0 until (1 + id % 3).toInt)
        .map(r => s"s$id-r$r".getBytes("UTF-8"))
      (id, TfRecordShard.encodeShard(recs, gzip = id % 2 == 0))
    }
    val df = shards.toDF("shard_id", "payload")
    val got = TfRecordShard.explodeRecords(spark, df).collect()
      .map(r => (r.shard_id, r.rec_idx, new String(r.record, "UTF-8")))
      .sorted.toSeq
    val want = shards.flatMap { case (id, payload) =>
      TfRecordShard.parseShard(id, payload)
        .map(r => (id, r.rec_idx, new String(r.record, "UTF-8")))
    }.sorted
    assert(got == want)
  }

  test("writeShards: deterministic order, round-trips through the reader") {
    import spark.implicits._
    val rows = (0L until 40L).map { i =>
      (i % 5, i, s"payload-$i".getBytes("UTF-8"))
    }
    val df = rows.toDF("shard", "rec_id", "rec").repartition(7)
    for (gz <- Seq(false, true)) {
      val shards = TfRecordShard.writeShards(spark, df, "shard", "rec",
        Seq("rec_id"), gzip = gz)
      val back = TfRecordShard.explodeRecords(spark, shards).collect()
        .map(r => (r.shard_id, r.rec_idx, new String(r.record, "UTF-8")))
        .sorted.toSeq
      val want = rows.groupBy(_._1).toSeq.flatMap { case (s, rs) =>
        rs.sortBy(_._2).zipWithIndex.map { case ((_, i, _), k) =>
          (s, k.toLong, s"payload-$i")
        }
      }.sorted
      assert(back == want, s"gzip=$gz")
      // a second write of the same input is byte-identical (determinism)
      val again = TfRecordShard.writeShards(spark, df, "shard", "rec",
        Seq("rec_id"), gzip = gz)
      val h1 = shards.collect().map(r => (r.getLong(0),
        java.util.Arrays.hashCode(r.getAs[Array[Byte]](1)))).sorted.toSeq
      val h2 = again.collect().map(r => (r.getLong(0),
        java.util.Arrays.hashCode(r.getAs[Array[Byte]](1)))).sorted.toSeq
      assert(h1 == h2)
    }
  }
}
