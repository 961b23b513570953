package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class DocChunkSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], size: Int, stride: Int) =
    DocChunk.chunks(rows.toDF("doc_id", "text"), "doc_id", "text",
        size, stride)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        ((r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_len"),
          r.getAs[String]("chunk_md5"))))
      .toMap

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("hand-checked chunking: overlap, short tail, sub-window doc, empty doc") {
    val text = "abcdefghij" // len 10
    val got = run(Seq((1L, text), (2L, "xy"), (3L, "")), size = 6, stride = 4)
    // doc1: n = 1 + ceil((10-6)/4) = 2 -> [1,6]="abcdef", [5,10]="efghij"
    assert(got.keySet == Set((1L, 0L), (1L, 1L), (2L, 0L)))
    assert(got((1L, 0L)) == ((1L, 6L, md5hex("abcdef"))))
    assert(got((1L, 1L)) == ((5L, 6L, md5hex("efghij"))))
    // doc2 shorter than one window: one short chunk
    assert(got((2L, 0L)) == ((1L, 2L, md5hex("xy"))))
  }

  test("randomized: gap-free coverage, correct counts, exact content") {
    val rnd = new scala.util.Random(53)
    val rows = (0L until 60L).map(i =>
      (i, rnd.alphanumeric.take(rnd.nextInt(50)).mkString))
    for ((size, stride) <- Seq((8, 8), (8, 3), (16, 5))) {
      val got = run(rows, size, stride)
      rows.foreach { case (id, t) =>
        val expected =
          if (t.isEmpty) Seq.empty
          else {
            val n = 1 + math.max(0,
              (t.length - size + stride - 1) / stride)
            (0 until n).map { i =>
              val start = i * stride
              val chunk = t.substring(start, math.min(start + size, t.length))
              (id, i.toLong) -> ((start + 1L, chunk.length.toLong, md5hex(chunk)))
            }
          }
        expected.foreach { case (k, v) =>
          assert(got(k) == v, s"size=$size stride=$stride doc=$id $k") }
        assert(got.keys.count(_._1 == id) == expected.size)
        // gap-free: consecutive chunk starts differ by stride <= size
        if (t.length > size)
          assert(expected.size >= 2)
      }
    }
  }
}
