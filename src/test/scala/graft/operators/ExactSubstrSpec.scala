package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ExactSubstrSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def statsOf(minLen: Int, rows: (Long, String)*) =
    ExactSubstr.dupSpanStats(rows.toDF("doc_id", "text"), "doc_id", "text", minLen)
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_positions"), r.getAs[Long]("n_dup_positions"),
          r.getAs[Long]("n_spans"), r.getAs[Long]("chars_dup"),
          r.getAs[Long]("clean_len"))).toMap

  test("cross-doc duplicated run becomes one maximal span") {
    // "abcdefgh" shared by both docs; L=4 -> dup starts 1..5 in d1,
    // 3..7 in d2 -> one span each covering the whole 8-char run
    val out = statsOf(4,
      1L -> "abcdefghXYZW",
      2L -> "QRabcdefghST")
    assert(out(1L) == ((9L, 5L, 1L, 8L, 4L)))
    assert(out(2L) == ((9L, 5L, 1L, 8L, 4L)))
  }

  test("within-doc repeat is detected (corpus semantics, not cross-doc only)") {
    // "abcd...abcd": both occurrences are duplicated positions
    val out = statsOf(4, 1L -> "abcdXYZWabcd")
    assert(out(1L)._2 == 2L)     // two dup starts (p=1, p=9)
    assert(out(1L)._3 == 2L)     // far apart -> two spans
    assert(out(1L)._4 == 8L)
  }

  test("unique text reports zeros and full clean length") {
    val out = statsOf(4, 1L -> "abcdefgh", 2L -> "ijklmnop")
    assert(out(1L) == ((5L, 0L, 0L, 0L, 8L)))
    assert(out(2L) == ((5L, 0L, 0L, 0L, 8L)))
  }

  test("short docs (below L) appear with zero positions") {
    val out = statsOf(10, 1L -> "short", 2L -> "also-short")
    assert(out(1L) == ((0L, 0L, 0L, 0L, 5L)))
    assert(out(2L)._1 == 1L)  // exactly one 10-char position, unique
  }

  test("abutting spans merge; separated spans do not") {
    // d1 vs d2 share "aaaabbbb" (8 chars) and "ccccdddd" with a unique
    // 6-char gap in between -> two spans per doc
    val out = statsOf(8,
      1L -> ("aaaabbbb" + "KLMNOP" + "ccccdddd"),
      2L -> ("aaaabbbb" + "QRSTUV" + "ccccdddd"))
    assert(out(1L)._3 == 2L)
    assert(out(1L)._4 == 16L)
    assert(out(1L)._5 == 6L)
  }

  test("span boundaries are exact (1-based, end-exclusive)") {
    val spans = ExactSubstr.dupSpans(
        Seq(1L -> "XXabcdefYY", 2L -> "ZZabcdefWW").toDF("doc_id", "text"),
        "doc_id", "text", 6)
      .orderBy("doc_id").collect()
    assert(spans.length == 2)
    for (r <- spans) {
      assert(r.getAs[Long]("span_start") == 3L)
      assert(r.getAs[Long]("span_end") == 9L)
      assert(r.getAs[Long]("n_positions") == 1L)
    }
  }

  test("removeDupSpans cuts exactly the spans and keeps the rest") {
    val cleaned = ExactSubstr.removeDupSpans(
        Seq(1L -> "XXabcdefYY", 2L -> "ZZabcdefWW", 3L -> "nodupshere")
          .toDF("doc_id", "text"),
        "doc_id", "text", 6)
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(cleaned(1L) == "XXYY")
    assert(cleaned(2L) == "ZZWW")
    assert(cleaned(3L) == "nodupshere")
  }

  test("removeDupSpans handles spans at the very start and end") {
    val cleaned = ExactSubstr.removeDupSpans(
        Seq(1L -> "abcdefMID", 2L -> "MIDabcdef", 3L -> "abcdef")
          .toDF("doc_id", "text"),
        "doc_id", "text", 6)
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(cleaned(1L) == "MID")
    assert(cleaned(2L) == "MID")
    assert(cleaned(3L) == "")
  }

  test("stats agree with an independent brute-force recompute") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcd"
    val docs = (0L until 24L).map { i =>
      i -> (0 until (30 + rnd.nextInt(40)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    val l = 8
    // brute force: global substring multiset, then per-doc dup positions
    val all = scala.collection.mutable.Map.empty[String, Int]
    for ((_, t) <- docs; p <- 0 to t.length - l)
      all(t.substring(p, p + l)) = all.getOrElse(t.substring(p, p + l), 0) + 1
    val expected = docs.map { case (id, t) =>
      val dupPs = (0 to t.length - l).filter(p => all(t.substring(p, p + l)) >= 2)
      // merge with gap rule p - prev <= l
      var spans = 0; var covered = 0; var prevEnd = -1
      for (p <- dupPs) {
        if (p > prevEnd) spans += 1
        covered += (p + l) - math.max(p, math.min(prevEnd, p + l))
        prevEnd = math.max(prevEnd, p + l)
      }
      id -> (dupPs.size.toLong, spans.toLong, covered.toLong)
    }.toMap
    val out = statsOf(l, docs: _*)
    for ((id, (ndp, nsp, cov)) <- expected)
      assert((out(id)._2, out(id)._3, out(id)._4) == ((ndp, nsp, cov)), s"doc $id")
  }
}
