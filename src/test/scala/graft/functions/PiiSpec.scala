package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** PII detection/redaction: counts and placeholders per category, pass
  * ordering (email before phone before IPv4), and no-PII passthrough. */
class PiiSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import TextFunctions._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(piiRedact(col("t"))).head().getString(0)

  private def counts(s: String): (Long, Long, Long) = {
    val r = Seq(s).toDF("t").select(
      piiCount(col("t"), EmailPattern), piiCount(col("t"), PhonePattern),
      piiCount(col("t"), Ipv4Pattern)).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("each category redacts with its placeholder") {
    assert(redact("mail a.b+c@host.co.uk now") == "mail [EMAIL] now")
    assert(redact("call 555-867-5309 or 555.123.4567") == "call [PHONE] or [PHONE]")
    assert(redact("host 192.168.0.1 down") == "host [IP] down")
  }

  test("email keeps its dots and digits away from the narrower patterns") {
    // the address contains a dotted digit run an IPv4 pass could half-match
    assert(redact("x 1.2.3.4u@d.com y") == "x [EMAIL] y")
    assert(counts("x 1.2.3.4u@d.com y") == (1L, 0L, 0L))
  }

  test("phone digits never feed the IPv4 pattern") {
    assert(redact("555.867.5309") == "[PHONE]")
    assert(counts("555.867.5309") == (0L, 1L, 0L))
  }

  test("word boundaries stop partial matches") {
    assert(counts("version 1.2.3.4567 is not an ip") == (0L, 0L, 0L))
    assert(redact("a 10.0.0.7, end") == "a [IP], end")
  }

  test("text without PII passes through unchanged") {
    val s = "plain text with numbers 12345 and a dot. nothing else"
    assert(redact(s) == s)
    assert(counts(s) == (0L, 0L, 0L))
  }
}
