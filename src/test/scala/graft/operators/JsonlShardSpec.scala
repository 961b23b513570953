package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** [[JsonlShard]]: streaming decode of gzip/zstd/plain JSONL shard
  * payloads — codec dispatch by magic, line framing (CRLF, blanks, final
  * unterminated line), both bomb guards, and the codec-family no-throw
  * contract on corrupt payloads. */
class JsonlShardSpec extends AnyFunSuite with SparkSpec {

  private def lines(payload: Array[Byte],
                    maxLineBytes: Int = 4 << 20,
                    maxLines: Int = 1 << 20): Seq[String] =
    JsonlShard.parseShard(1L, payload, maxLineBytes, maxLines).map(_.line)

  test("gzip and zstd round-trips; plain bytes pass through") {
    val src = Seq("""{"a":1}""", """{"a":2}""", """{"a":3}""")
    assert(lines(JsonlShard.encodeGz(src)) == src)
    assert(lines(JsonlShard.encodeZst(src)) == src)
    assert(lines("x\ny\nz\n".getBytes("UTF-8")) == Seq("x", "y", "z"))
  }

  test("multi-member gzip concatenation reads as one stream") {
    val payload = JsonlShard.encodeGz(Seq("a", "b")) ++
      JsonlShard.encodeGz(Seq("c", "d"))
    assert(lines(payload) == Seq("a", "b", "c", "d"))
  }

  test("line framing: CRLF stripped, blanks skipped, unterminated tail kept") {
    assert(lines("a\r\nb\r\n".getBytes("UTF-8")) == Seq("a", "b"))
    assert(lines("a\n\n\nb\n".getBytes("UTF-8")) == Seq("a", "b"))
    assert(lines("a\nb".getBytes("UTF-8")) == Seq("a", "b"))
    // indices stay consecutive over skipped blanks
    val idx = JsonlShard.parseShard(1L, "a\n\nb\n".getBytes("UTF-8"))
      .map(_.line_idx)
    assert(idx == Seq(0L, 1L))
  }

  test("bomb guards: oversized lines dropped, line-count cap stops the walk") {
    val big = "x" * 100
    val payload = s"a\n$big\nb\n".getBytes("UTF-8")
    assert(lines(payload, maxLineBytes = 10) == Seq("a", "b"))
    assert(lines("a\nb\nc\nd\n".getBytes("UTF-8"), maxLines = 2) ==
      Seq("a", "b"))
  }

  test("corrupt payloads keep complete lines and never throw") {
    val gz = JsonlShard.encodeGz(Seq("first", "second", "third"))
    // truncating mid-stream: whatever lines fully decoded stay; no throw
    val cut = JsonlShard.parseShard(1L, gz.take(gz.length / 2))
    assert(cut.map(_.line).forall(Seq("first", "second", "third").contains))
    // zstd magic with garbage body -> no rows, no throw
    val fakeZst = Array(0x28, 0xb5, 0x2f, 0xfd, 0x00, 0x11, 0x22).map(_.toByte)
    assert(JsonlShard.parseShard(1L, fakeZst).isEmpty)
    assert(JsonlShard.parseShard(1L, Array.emptyByteArray).isEmpty)
    assert(JsonlShard.parseShard(1L, null).isEmpty)
  }

  test("distributed explode: both codecs, exact line indices") {
    import spark.implicits._
    val df = Seq(
      (0L, JsonlShard.encodeGz(Seq("g0", "g1"))),
      (1L, JsonlShard.encodeZst(Seq("z0", "z1", "z2")))
    ).toDF("shard_id", "payload")
    val got = JsonlShard.explodeLines(spark, df).collect()
      .map(r => (r.shard_id, r.line_idx, r.line)).sorted.toSeq
    assert(got == Seq((0L, 0L, "g0"), (0L, 1L, "g1"),
      (1L, 0L, "z0"), (1L, 1L, "z1"), (1L, 2L, "z2")))
  }

  test("writeShards: all three codecs round-trip deterministically " +
       "through the reader in order") {
    import spark.implicits._
    val rows = (0L until 25L).map(i => (i % 3, i, s"""{"n":$i}"""))
    val df = rows.toDF("shard", "ord", "line").repartition(4)
    for (codec <- Seq("none", "gzip", "zstd")) {
      val shards = JsonlShard.writeShards(spark, df, "shard", "line",
        Seq("ord"), codec)
      val got = JsonlShard.explodeLines(spark, shards).collect()
        .map(r => (r.shard_id, r.line_idx, r.line)).sorted.toSeq
      val want = rows.groupBy(_._1).toSeq.flatMap { case (s, rs) =>
        rs.sortBy(_._2).zipWithIndex.map { case ((_, i, _), k) =>
          (s, k.toLong, s"""{"n":$i}""")
        }
      }.sorted
      assert(got == want, s"codec=$codec")
      val again = JsonlShard.writeShards(spark, df, "shard", "line",
        Seq("ord"), codec).collect()
        .map(r => (r.getLong(0),
          java.util.Arrays.hashCode(r.getAs[Array[Byte]](1)))).sorted.toSeq
      val first = shards.collect()
        .map(r => (r.getLong(0),
          java.util.Arrays.hashCode(r.getAs[Array[Byte]](1)))).sorted.toSeq
      assert(again == first, s"nondeterministic write codec=$codec")
    }
    intercept[IllegalArgumentException] {
      JsonlShard.writeShards(spark, df, "shard", "line", Seq("ord"), "lz4")
    }
  }
}
