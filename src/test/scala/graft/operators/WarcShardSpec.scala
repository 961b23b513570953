package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class WarcShardSpec extends AnyFunSuite with SparkSpec {
  import WarcShard._

  private def gz(records: Array[Byte]*): Array[Byte] =
    encodeWarcGz(records)

  private val infoBlock = "software: graft\r\n".getBytes("ISO-8859-1")
  private val body = "hello warc".getBytes("ISO-8859-1")
  private val resp = encodeRecord("response", Some("http://a.example/x"),
    encodeHttpResponse(200, "OK", body))
  private val infoRec = encodeRecord("warcinfo", None, infoBlock)

  test("record-per-member warc.gz round-trips with HTTP split") {
    val out = parseShard(7L, gz(infoRec, resp))
    assert(out.map(_.warc_type) == Seq("warcinfo", "response"))
    val i = out(0)
    assert(i.target_uri.isEmpty && i.content_length == 17L &&
      i.http_status.isEmpty && i.body_len == 17L && i.body_sum == 1520L)
    val r = out(1)
    assert(r.target_uri.contains("http://a.example/x"))
    assert(r.content_length == (45 + body.length).toLong)
    assert(r.http_status.contains(200L))
    assert(r.body_len == body.length.toLong)
    assert(r.body_sum == body.map(_ & 0xff).sum.toLong)
    assert(r.rec_idx == 1L)
  }

  test("plain (uncompressed) WARC parses identically") {
    val plain = infoRec ++ resp
    assert(parseShard(1L, plain) == parseShard(1L, gz(infoRec, resp))
      .map(_.copy(shard_id = 1L)))
  }

  test("multi-record gzip members are tolerated (concatenated walk)") {
    val oneMember = encodeWarcGz(Seq(infoRec ++ resp))
    assert(parseShard(3L, oneMember) == parseShard(3L, gz(infoRec, resp))
      .map(_.copy(shard_id = 3L)))
  }

  test("a CRC-corrupt member rejects the whole shard") {
    val p = gz(infoRec, resp)
    // flip a bit inside the FIRST member's deflate body (after 10-byte hdr)
    val bad = p.clone(); bad(12) = (bad(12) ^ 0x40).toByte
    assert(parseShard(1L, bad).isEmpty)
  }

  test("framing damage rejects the whole shard") {
    // truncated block
    val short = resp.dropRight(6)
    assert(parseShard(1L, gz(short)).isEmpty)
    // bad version line
    val badV = ("WARX/1.0\r\n" + "Content-Length: 0\r\n\r\n\r\n\r\n")
      .getBytes("ISO-8859-1")
    assert(parseShard(1L, gz(badV)).isEmpty)
    // missing record separator
    val noSep = resp.dropRight(4) ++ "xxxx".getBytes("ISO-8859-1")
    assert(parseShard(1L, gz(noSep)).isEmpty)
    // negative / non-numeric Content-Length
    val badLen = ("WARC/1.0\r\nWARC-Type: metadata\r\n" +
      "Content-Length: nope\r\n\r\n\r\n\r\n").getBytes("ISO-8859-1")
    assert(parseShard(1L, gz(badLen)).isEmpty)
  }

  test("malformed HTTP prelude keeps the record with null status, block as body") {
    val block = "not an http payload at all".getBytes("ISO-8859-1")
    val r = parseShard(1L, gz(encodeRecord("response", Some("u"), block)))
    assert(r.size == 1)
    assert(r.head.http_status.isEmpty)
    assert(r.head.body_len == block.length.toLong)
    assert(r.head.body_sum == block.map(_ & 0xff).sum.toLong)
  }

  test("non-response records never attempt an HTTP split") {
    val httpish = encodeHttpResponse(200, "OK", body)
    val r = parseShard(1L, gz(encodeRecord("request", Some("u"), httpish)))
    assert(r.head.http_status.isEmpty)
    assert(r.head.body_len == httpish.length.toLong)
  }

  test("gzip members with FNAME/FEXTRA/FCOMMENT headers parse") {
    // hand-build a member with FLG = FEXTRA|FNAME|FCOMMENT
    val deflater = new java.util.zip.Deflater(-1, true)
    deflater.setInput(infoRec); deflater.finish()
    val comp = new Array[Byte](infoRec.length * 2 + 64)
    val n = deflater.deflate(comp); deflater.end()
    val crc = new java.util.zip.CRC32(); crc.update(infoRec)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, (4 | 8 | 16).toByte,
      0, 0, 0, 0, 0, 0))
    bos.write(Array[Byte](3, 0)); bos.write(Array[Byte](1, 2, 3)) // FEXTRA
    bos.write("name.warc".getBytes("ISO-8859-1")); bos.write(0) // FNAME
    bos.write("a comment".getBytes("ISO-8859-1")); bos.write(0) // FCOMMENT
    bos.write(comp, 0, n)
    val v = crc.getValue
    bos.write(Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte, infoRec.length.toByte, (infoRec.length >> 8).toByte,
      (infoRec.length >> 16).toByte, (infoRec.length >> 24).toByte))
    val out = parseShard(9L, bos.toByteArray)
    assert(out.size == 1 && out.head.warc_type == "warcinfo")
  }

  test("gzip bomb is bounded, not inflated") {
    // 80 MiB of zeros compresses tiny; must reject, not allocate
    val big = new Array[Byte](80 << 20)
    val wrapped = encodeWarcGz(Seq(big))
    assert(wrapped.length < (1 << 20))
    assert(parseShard(1L, wrapped).isEmpty)
  }

  test("shards inflating past 64 MiB parse when every record is in-guard (streaming walk)") {
    // 70 x 1 MiB records = 70 MiB inflated — over the old whole-shard cap;
    // the rolling buffer must stream them in O(record) memory.
    val big = new Array[Byte](1 << 20)
    val recs = (1 to 70).map(i =>
      encodeRecord("resource", Some(s"urn:blob:$i"), big))
    val out = parseShard(4L, encodeWarcGz(recs))
    assert(out.size == 70)
    assert(out.forall(_.body_len == (1L << 20)))
    assert(out.map(_.rec_idx) == (0L until 70L))
  }

  test("a single record over maxRecordBytes rejects the shard; raising the guard admits it") {
    val body = new Array[Byte](96 << 10)
    val shard = gz(encodeRecord("resource", None, body))
    assert(parseShard(1L, shard, maxRecordBytes = 64 << 10).isEmpty)
    assert(parseShard(1L, shard, maxRecordBytes = 128 << 10).size == 1)
    assert(parseShard(1L, shard).size == 1) // default 64 MiB guard
  }

  test("a crafted near-Long.MaxValue Content-Length rejects quietly (no overflow throw)") {
    val evil = ("WARC/1.0\r\nWARC-Type: metadata\r\n" +
      s"Content-Length: ${Long.MaxValue - 3}\r\n\r\n\r\n\r\n")
      .getBytes("ISO-8859-1")
    assert(parseShard(1L, gz(evil)).isEmpty)
    assert(parseShard(1L, evil).isEmpty) // plain passthrough too
  }

  test("a shard exceeding the record-count guard rejects; raising the guard admits it") {
    val tiny = encodeRecord("metadata", None, Array.emptyByteArray)
    val many = encodeWarcGz(Seq.fill(50)(tiny))
    assert(parseShard(1L, many, maxRecords = 10).isEmpty)
    assert(parseShard(1L, many, maxRecords = 50).size == 50)
    assert(parseShard(1L, many).size == 50) // default 1M guard
  }

  test("maxRecordBytes outside (0, 1 GiB] is a caller error") {
    intercept[IllegalArgumentException] {
      parseShard(1L, gz(resp), maxRecordBytes = 0)
    }
    intercept[IllegalArgumentException] {
      parseShard(1L, gz(resp), maxRecordBytes = Int.MaxValue)
    }
  }

  test("bit-flip fuzz never throws") {
    val p = gz(infoRec, resp)
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 300) {
      val bad = p.clone()
      val at = rnd.nextInt(p.length)
      bad(at) = (bad(at) ^ (1 << rnd.nextInt(8))).toByte
      parseShard(1L, bad) // any result is fine; throwing is not
    }
    for (cut <- 0 until p.length by 7) parseShard(1L, p.take(cut))
  }

  test("distributed explode emits one row per record") {
    import spark.implicits._
    val shards = Seq((1L, gz(infoRec, resp)), (2L, gz(resp)),
      (3L, Array[Byte](1, 2, 3))).toDF("shard_id", "payload")
    val out = WarcShard.explodeRecords(spark, shards).collect()
    assert(out.map(_.shard_id).sorted.toSeq == Seq(1L, 1L, 2L))
  }

  test("parseShardBodies carries the exact body bytes; stats rows agree") {
    val body = "the actual page bytes".getBytes("ISO-8859-1")
    val rec = WarcShard.encodeRecord("response", Some("http://x/y"),
      WarcShard.encodeHttpResponse(200, "OK", body))
    val shard = gz(infoRec, rec)
    val bodies = WarcShard.parseShardBodies(7L, shard)
    val stats = WarcShard.parseShard(7L, shard)
    assert(bodies.size == 2 && stats.size == 2)
    assert(bodies(1).warc_type == "response" &&
      bodies(1).http_status.contains(200L))
    assert(java.util.Arrays.equals(bodies(1).body, body))
    assert(stats(1).body_len == body.length.toLong)
    // damage anywhere rejects the body rows too
    val broken = shard.clone(); broken(12) = (broken(12) ^ 0x40).toByte
    assert(WarcShard.parseShardBodies(7L, broken).isEmpty)
  }
}
