package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class ZipShardSpec extends AnyFunSuite with SparkSpec {
  import ZipShard._

  private def members = Seq(
    ("000017.jpg", Array.tabulate(700)(i => (i * 3).toByte), true),
    ("000017.txt", "a caption with some repetition repetition".getBytes, true),
    ("000017.seg.json", "{}".getBytes, false),
    ("000018.bin", Array.tabulate(64)(i => (255 - i).toByte), false))

  test("encode -> entries -> memberBytes round trip, stored and deflated") {
    val zip = encodeZip(members)
    val es = entries(zip).get
    assert(es.map(_.name) == members.map(_._1).toVector)
    assert(es.map(_.size) == members.map(_._2.length.toLong).toVector)
    assert(es.map(_.method) == members.map(m => if (m._3) 8 else 0).toVector)
    for ((e, (_, data, _)) <- es.zip(members))
      assert(memberBytes(zip, e).get.sameElements(data), e.name)
  }

  test("a trailing archive comment does not hide the EOCD") {
    val zip = encodeZip(members)
    val comment = "some archive comment".getBytes
    val withComment = zip.clone()
    // patch comment length into EOCD and append the comment
    val eocdAt = zip.length - 22
    withComment(eocdAt + 20) = comment.length.toByte
    val full = withComment ++ comment
    assert(entries(full).get.map(_.name) == members.map(_._1).toVector)
  }

  test("CRC verification rejects corrupt member content") {
    val zip = encodeZip(Seq(("x.bin", Array.tabulate(64)(_.toByte), false)))
    val e = entries(zip).get.head
    assert(memberBytes(zip, e).isDefined)
    val bad = zip.clone()
    bad(e.offset.toInt + 30 + 5 + 10) = 99 // flip a stored data byte
    assert(memberBytes(bad, entries(bad).get.head).isEmpty)
  }

  test("malformed archives reject cleanly; fuzz never throws") {
    val zip = encodeZip(members)
    assert(entries(null).isEmpty)
    assert(entries("PK but nothing else".getBytes).isEmpty)
    for (len <- 0 until zip.length) entries(zip.take(len))
    val rnd = new scala.util.Random(9)
    for (_ <- 0 until 400) {
      val b = zip.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      entries(b).toSeq.flatten.foreach(e => memberBytes(b, e))
    }
    // giant declared sizes trip the budget
    val es = entries(zip).get
    assert(es.nonEmpty)
  }

  test("explodeMembers: CRC-verified rows, corrupt member skipped") {
    import spark.implicits._
    val zip = encodeZip(members)
    val corrupt = zip.clone()
    // damage the STORED json member's data (offset+30+name+data)
    val je = entries(zip).get.find(_.name == "000017.seg.json").get
    corrupt((je.offset + 30 + je.name.length).toInt) = 'X'
    val shards = Seq((1L, zip), (2L, corrupt),
        (3L, "junk".getBytes: Array[Byte]))
      .toDF("shard_id", "payload")
    val rows = explodeMembers(spark, shards).collect()
    assert(rows.count(_.shard_id == 1L) == 4)
    assert(rows.count(_.shard_id == 2L) == 3) // the damaged member dropped
    assert(rows.count(_.shard_id == 3L) == 0)
    val jpg = rows.find(m => m.shard_id == 1L && m.ext == "jpg").get
    assert(jpg.sample_key == "000017" && jpg.method == 8 &&
      jpg.size_bytes == 700)
    assert(jpg.byte_sum == (0 until 700).map(i => (i * 3) & 0xff).sum.toLong)
  }
}
