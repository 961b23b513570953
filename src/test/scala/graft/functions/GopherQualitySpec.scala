package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class GopherQualitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def q(text: String): (Long, Long, Long, Long, Long, Long) = {
    val r = Seq(text).toDF("t")
      .select(TextFunctions.gopherQuality(col("t")).as("q"))
      .select("q.n_words", "q.mean_wlen_e2", "q.symbol_e4", "q.alpha_e4",
        "q.stop_count", "q.passed")
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))
  }

  test("a clean sentence passes every rule with hand-checked stats") {
    // 8 words, 30 chars -> mean 3.75 -> 375; stopwords: the, with, of
    val (n, mean, sym, alpha, stops, passed) =
      q("the quick brown fox runs with lots of")
    assert(n == 8 && mean == 375 && sym == 0 && alpha == 10000 &&
      stops == 3 && passed == 1)
  }

  test("each rule fails independently") {
    // word count: 4 words < 5
    assert(q("the of and that")._6 == 0)
    // mean word length > 10 (stopwords present, counts fine otherwise)
    assert(q("the of supercalifragilistic expialidocious extraordinarily " +
      "incomprehensibilities")._6 == 0)
    // symbol ratio: 2 symbol words of 7 -> 2857 >= 1000
    val s = q("the of one two three # #")
    assert(s._3 == 2857L && s._6 == 0)
    // alpha ratio: 3 numeric of 7 -> 5714 < 8000
    val a = q("the of eleven 12 34 56 x")
    assert(a._4 < 8000L && a._6 == 0)
    // stopwords: only 1 from the Gopher list
    assert(q("the quick brown foxes jump over lazy dogs")._5 == 1L)
    assert(q("the quick brown foxes jump over lazy dogs")._6 == 0)
  }

  test("empty and whitespace-only text yields zeros, never a throw") {
    assert(q("") == ((0L, 0L, 0L, 0L, 0L, 0L)))
    assert(q("   ") == ((0L, 0L, 0L, 0L, 0L, 0L)))
  }

  private def lr(text: String): (Long, Long, Long, Long, Long) = {
    val r = Seq(text).toDF("t")
      .select(TextFunctions.gopherLineRules(col("t")).as("q"))
      .select("q.n_lines", "q.dup_line_e4", "q.ellipsis_e4", "q.bullet_e4",
        "q.passed")
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("line rules: a clean multi-line doc passes with hand-checked stats") {
    // 3 distinct lines, none ellipsis-terminated, none bulleted
    assert(lr("alpha beta\ngamma delta\nepsilon") == ((3L, 0L, 0L, 0L, 1L)))
  }

  test("line rules: each rule fails independently") {
    // dup: 4 lines, 2 distinct -> 5000 > 3000 (lines trim-compare)
    val d = lr("same line\n same line \nsame line\nother")
    assert(d == ((4L, 5000L, 0L, 0L, 0L)))
    // ellipsis: 2 of 4 lines end in "..." or U+2026 -> 5000 > 3000
    val e = lr("read more...\nplain\nelided…\nlast")
    assert(e == ((4L, 0L, 5000L, 0L, 0L)))
    // bullets: ALL lines bulleted (each marker form) -> 10000 > 9000
    val b = lr("• one\n- two\n* three")
    assert(b == ((3L, 0L, 0L, 10000L, 0L)))
    // bullets under the 90% line pass: 2 of 3 -> 6666
    assert(lr("• one\n- two\nprose three")._5 == 1L)
  }

  test("line rules: empty text and blank lines never throw") {
    assert(lr("") == ((0L, 0L, 0L, 0L, 1L)))
    assert(lr("\n\n  \n") == ((0L, 0L, 0L, 0L, 1L)))
    assert(lr("one\n\n\ntwo")._1 == 2L)
  }
}
