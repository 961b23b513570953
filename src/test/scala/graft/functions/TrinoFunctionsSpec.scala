package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the Trino-semantics corners (SURVEY §7.4 risk #2): truncating
  * date_diff, negative substring, whitespace macros, year expansion. */
class TrinoFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect().head.getAs[T]("r")

  test("normalizeWhitespace collapses runs and trims") {
    assert(one[String](TrinoFunctions.normalizeWhitespace(lit("  a \t b\n  c "))) == "a b c")
  }

  test("categoryKey lowers the normalized string") {
    assert(one[String](TrinoFunctions.categoryKey(lit(" Fast   PUMP "))) == "fast pump")
  }

  test("dateDiffMinutesTrunc truncates toward zero like Trino date_diff") {
    val a = lit("2024-01-01 00:00:00").cast("timestamp")
    val b90 = lit("2024-01-01 00:01:30").cast("timestamp")
    assert(one[Long](TrinoFunctions.dateDiffMinutesTrunc(a, b90)) == 1L) // +90s -> 1
    assert(one[Long](TrinoFunctions.dateDiffMinutesTrunc(b90, a)) == -1L) // -90s -> -1 (not -2)
  }

  test("lastChars takes the trailing n characters (Trino negative substring)") {
    assert(one[String](TrinoFunctions.lastChars(lit("blue anvil"), 8)) == "ue anvil")
  }

  test("expandTwoDigitYear maps 9x->19xx else 20xx") {
    assert(one[String](TrinoFunctions.expandTwoDigitYear(lit("97"))) == "1997")
    assert(one[String](TrinoFunctions.expandTwoDigitYear(lit("03"))) == "2003")
  }

  test("charFlag: only 'Y' is true") {
    assert(one[Boolean](TrinoFunctions.charFlag(lit("Y"))))
    assert(!one[Boolean](TrinoFunctions.charFlag(lit("N"))))
    assert(!one[Boolean](TrinoFunctions.charFlag(lit(null).cast("string"))))
  }

  test("parseUtcTimestamp converts source-zone wall time to UTC") {
    val r = Seq(1).toDF("x").select(
      TrinoFunctions.parseUtcTimestamp(lit("2000-07-01"), lit("12:00:00"),
        "Europe/London").cast("long").as("r")).collect().head.getLong(0)
    assert(r == 962449200L) // 11:00 UTC (BST)
  }

  test("isqrt is exact across fp-rounding boundaries") {
    // small exhaustive range + the treacherous cases: perfect squares,
    // squares +-1, and huge values where sqrt's double rounding drifts
    val boundary = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 15L, 16L, 24L, 25L) ++
      (1L to 2000L) ++
      Seq(67108864L, 67108865L, // 8192^2, +1
        4503599627370496L, 4503599627370495L, // 2^52, -1
        (1L << 31) * (1L << 31) - 1L, // (2^31)^2 - 1
        999999999999999999L)
    val df = boundary.toDF("x")
      .select(col("x"), TrinoFunctions.isqrt(col("x")).as("r"))
    df.collect().foreach { row =>
      val (x, r) = (row.getLong(0), row.getLong(1))
      val expected = java.math.BigInteger.valueOf(x).sqrt().longValueExact()
      assert(r == expected, s"isqrt($x) = $r, want $expected")
    }
  }
}
