package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SuffixArraySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ranksOf(rows: (Long, String)*): Map[(Long, Long), Long] =
    SuffixArray.suffixRanks(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("p")) ->
        r.getAs[Long]("suffix_rank"))
      .toMap

  /** In-memory truth: dense rank of each suffix string across all docs. */
  private def bruteForce(rows: (Long, String)*): Map[(Long, Long), Long] = {
    val sufs = for ((id, t) <- rows; p <- 1 to t.length)
      yield ((id, p.toLong), t.substring(p - 1))
    val order = sufs.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1).toLong }.toMap
    sufs.map { case (key, s) => key -> order(s) }.toMap
  }

  test("banana: the textbook suffix array") {
    val out = ranksOf(1L -> "banana")
    // suffixes sorted: a(6) ana(4) anana(2) banana(1) na(5) nana(3)
    assert(out == Map(
      (1L, 6L) -> 1L, (1L, 4L) -> 2L, (1L, 2L) -> 3L,
      (1L, 1L) -> 4L, (1L, 5L) -> 5L, (1L, 3L) -> 6L))
  }

  test("identical cross-doc suffixes share a dense rank") {
    val out = ranksOf(1L -> "xab", 2L -> "yab")
    // suffix "ab" and "b" appear in both docs -> same rank each
    assert(out((1L, 2L)) == out((2L, 2L)))
    assert(out((1L, 3L)) == out((2L, 3L)))
    assert(out((1L, 1L)) != out((2L, 1L)))
    assert(out == bruteForce(1L -> "xab", 2L -> "yab"))
  }

  test("prefix-of-suffix ordering: shorter prefix sorts first") {
    // "ab" < "abc" lexicographically — doubling must not rank them equal
    val out = ranksOf(1L -> "abcab")
    assert(out == bruteForce(1L -> "abcab"))
    // suffix at p=4 is "ab", at p=1 is "abcab": "ab" < "abcab"
    assert(out((1L, 4L)) < out((1L, 1L)))
  }

  test("randomized corpora match the brute force (small alphabet, repeats)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val docs = (0L until 10L).map { i =>
        val len = 5 + rnd.nextInt(60)
        i -> (0 until len).map(_ => "abz"(rnd.nextInt(3))).mkString
      }
      assert(ranksOf(docs: _*) == bruteForce(docs: _*), s"trial $trial")
    }
  }

  test("single-char docs and empty docs") {
    val out = ranksOf(1L -> "b", 2L -> "", 3L -> "a", 4L -> "b")
    assert(out == Map((3L, 1L) -> 1L, (1L, 1L) -> 2L, (4L, 1L) -> 2L))
  }

  test("non-ASCII corpus takes the 3-char BMP pack and matches brute force") {
    // one non-ASCII doc flips the whole corpus off the 9-char ASCII pack;
    // ranks must still match the Java-char-code suffix sort exactly
    val docs = Seq(1L -> "банан", 2L -> "банка", 3L -> ("ab" * 40),
      4L -> "κόσμος κόσμε", 5L -> "plain ascii text here")
    assert(ranksOf(docs: _*) == bruteForce(docs: _*))
  }

  test("long periodic doc needs the full doubling depth") {
    // 200 chars of "ab" -> suffixes differ only at the very tail
    val out = ranksOf(1L -> ("ab" * 100))
    assert(out == bruteForce(1L -> ("ab" * 100)))
  }

  test("walk pairing path (forced) == broadcast pairing path == brute force") {
    // broadcastPairLimit = -1 forces the doc-keyed walk in EVERY round;
    // the default small-corpus path is all-broadcast — both must match
    // the brute force bit for bit
    val rnd = new scala.util.Random(7)
    val docs = (0L until 8L).map { i =>
      val len = 10 + rnd.nextInt(80)
      i -> (0 until len).map(_ => "abz"(rnd.nextInt(3))).mkString
    } :+ (8L -> ("ab" * 90)) :+ (9L -> "shared suffix tail") :+
      (10L -> "another shared suffix tail")
    val walk = SuffixArray
      .suffixRanks(docs.toDF("doc_id", "text"), "doc_id", "text",
        broadcastPairLimit = -1L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("p")) ->
        r.getAs[Long]("suffix_rank")).toMap
    assert(walk == bruteForce(docs: _*))
    assert(walk == ranksOf(docs: _*))
  }
}
