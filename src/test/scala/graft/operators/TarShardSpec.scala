package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class TarShardSpec extends AnyFunSuite with SparkSpec {
  import TarShard._

  private def members = Seq(
    ("000017.jpg", Array.tabulate(700)(i => (i * 3).toByte)),
    ("000017.txt", "a caption".getBytes("US-ASCII")),
    ("000017.seg.json", "{}".getBytes),
    ("000018.jpg", Array.tabulate(1)(_ => 9.toByte)))

  test("encode -> entries round trip: names, sizes, offsets, padding") {
    val tar = encodeTar(members)
    assert(tar.length % 512 == 0)
    val es = entries(tar).get
    assert(es.map(_.name) == members.map(_._1).toVector)
    assert(es.map(_.size) == members.map(_._2.length.toLong).toVector)
    assert(es.forall(_.typeflag == '0'))
    // offsets point at the real bytes
    for ((e, (_, data)) <- es.zip(members))
      assert(memberBytes(tar, e).get.sameElements(data), e.name)
    // headers occupy block boundaries: first data at 512
    assert(es.head.offset == 512)
    // 700-byte member consumes two data blocks: next header at 512*4
    assert(es(1).offset == 512 * 4)
  }

  test("gzip shards unwrap transparently; identical member table") {
    val tar = encodeTar(members)
    val gz = gzip(tar)
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b)
    assert(entries(gz).get == entries(tar).get)
    val es = entries(gz).get
    assert(memberBytes(gz, es(1)).get.sameElements(members(1)._2))
  }

  test("WebDataset sample keys: basename before the FIRST dot") {
    assert(splitKey("000017.jpg") == (("000017", "jpg")))
    assert(splitKey("d/sub/000017.seg.json") == (("d/sub/000017", "seg.json")))
    assert(splitKey("noext") == (("noext", "")))
    assert(splitKey("dir.v2/file.txt") == (("dir.v2/file", "txt")))
  }

  test("checksum corruption, truncation, and junk reject cleanly") {
    val tar = encodeTar(members)
    // flip a name byte: checksum no longer matches
    val bad = tar.clone(); bad(1) = 'X'
    assert(entries(bad).isEmpty)
    // non-512-multiple length
    assert(entries(tar.take(tar.length - 7)).isEmpty)
    // declared size beyond the archive
    val short = tar.take(512) // header only, data stripped
    assert(entries(short).isEmpty)
    assert(entries(null).isEmpty)
    // every 512-aligned truncation: None or a prefix table, never a throw
    for (blocks <- 0 until tar.length / 512) entries(tar.take(blocks * 512))
    // corrupt gzip stream
    val gz = gzip(tar)
    val gzBad = gz.clone(); gzBad(gz.length / 2) = (gzBad(gz.length / 2) ^ 0x7f).toByte
    assert(entries(gzBad).isEmpty || entries(gzBad).nonEmpty) // no throw
  }

  test("gzip bomb: decompressed size guard rejects") {
    val bomb = gzip(new Array[Byte](MaxShardBytes + 512))
    assert(bomb.length < 200000) // it IS a bomb
    assert(unwrap(bomb).isEmpty)
    assert(entries(bomb).isEmpty)
  }

  test("explodeMembers: distributed, grouped keys, plain and gzipped") {
    import spark.implicits._
    val tar = encodeTar(members)
    val shards = Seq((1L, tar), (2L, gzip(tar)),
        (3L, "not a tar at all, wrong length".getBytes: Array[Byte]),
        (4L, null: Array[Byte]))
      .toDF("shard_id", "payload")
    val rows = explodeMembers(spark, shards).collect()
      .sortBy(m => (m.shard_id, m.member_name))
    assert(rows.count(_.shard_id == 1L) == 4)
    assert(rows.count(_.shard_id == 2L) == 4) // gzip transparently
    assert(rows.count(_.shard_id >= 3L) == 0)
    val r0 = rows.find(m => m.shard_id == 1L && m.member_name == "000017.jpg").get
    assert(r0.sample_key == "000017" && r0.ext == "jpg" && r0.size_bytes == 700)
    assert(r0.byte_sum == (0 until 700).map(i => (i * 3) & 0xff).sum.toLong)
    // sample assembly: key "000017" groups three members
    assert(rows.count(m => m.shard_id == 1L && m.sample_key == "000017") == 3)
  }

  test("writeShards: deterministic archives round-trip through the " +
       "reader; raw layout is 512-blocked with the terminator") {
    import spark.implicits._
    val rows = (0L until 30L).flatMap { i =>
      Seq((i % 4, s"k$i.txt", s"text-$i".getBytes("UTF-8")),
        (i % 4, s"k$i.json", s"{}$i".getBytes("UTF-8")))
    }
    val df = rows.toDF("shard", "name", "bytes").repartition(5)
    for (gz <- Seq(false, true)) {
      val shards = TarShard.writeShards(spark, df, "shard", "name", "bytes",
        Seq("name"), gzip = gz)
      val back = TarShard.explodeMembers(spark, shards).collect()
        .map(m => (m.shard_id, m.member_name, m.size_bytes, m.byte_sum))
        .sorted.toSeq
      val want = rows.map { case (s, n, b) =>
        (s, n, b.length.toLong, b.map(x => (x & 0xff).toLong).sum)
      }.sorted
      assert(back == want, s"gzip=$gz")
      val again = TarShard.writeShards(spark, df, "shard", "name", "bytes",
        Seq("name"), gzip = gz)
      val h1 = shards.collect().map(r => (r.getLong(0),
        java.util.Arrays.hashCode(r.getAs[Array[Byte]](1)))).sorted.toSeq
      val h2 = again.collect().map(r => (r.getLong(0),
        java.util.Arrays.hashCode(r.getAs[Array[Byte]](1)))).sorted.toSeq
      assert(h1 == h2, s"nondeterministic write gzip=$gz")
      if (!gz) shards.collect().foreach { r =>
        val p = r.getAs[Array[Byte]](1)
        assert(p.length % 512 == 0, "archive not 512-blocked")
        assert(p.takeRight(1024).forall(_ == 0), "missing terminator")
      }
    }
  }
}
