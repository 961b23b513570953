package graft.expressions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** [[RedactKernels.redactPii]]: the documented grammar, matcher by
  * matcher, including the boundary cases that decide whether a scanner
  * over- or under-fires on real crawl text. */
class RedactSpec extends AnyFunSuite {

  private def red(s: String): String =
    RedactKernels.redactPii(UTF8String.fromString(s)).toString

  test("emails: basic, subdomains, local-part symbols, boundaries") {
    assert(red("mail bob@example.com now") == "mail [EMAIL] now")
    assert(red("a.b_c%d+e-f@x-1.y.example") == "[EMAIL]")
    // trailing dot stays outside the match
    assert(red("see bob@example.com.") == "see [EMAIL].")
    // single-label domain is not an email
    assert(red("not bob@localhost here") == "not bob@localhost here")
    // final label must be alphabetic and >= 2 chars
    assert(red("v1 bob@x.99 v1") == "v1 bob@x.99 v1")
    assert(red("x bob@y.a x") == "x bob@y.a x")
    // anchored: a local char immediately before the candidate blocks it
    // (the run started earlier and failed — no mid-token re-match)
    assert(red("weird@@example.com") == "weird@@example.com")
  }

  test("ipv4: octet range, adjacency, five-part sequences") {
    assert(red("ip 10.0.255.1 end") == "ip [IP] end")
    assert(red("ip 256.1.1.1 end") == "ip 256.1.1.1 end")
    // version-like five-part dotted sequences are not addresses
    assert(red("v 1.2.3.4.5 v") == "v 1.2.3.4.5 v")
    // alphanumeric adjacency on either side blocks the match
    assert(red("x91.2.3.4 y") == "x91.2.3.4 y")
    assert(red("1.2.3.45x6") == "1.2.3.45x6")
  }

  test("phones: digit count window, separators, trailing dash") {
    assert(red("call +4415550001 now") == "call [PHONE] now")
    assert(red("call +44-155-500-01 now") == "call [PHONE] now")
    // 6 digits: too short; 16 digits: not a phone (falls to NUMBER at
    // the digit run, which needs 13+ — here it has 16, so it redacts
    // as a NUMBER with the '+' kept)
    assert(red("a +123456 b") == "a +123456 b")
    assert(red("a +1234567890123456 b") == "a +[NUMBER] b")
    // a trailing dash is not part of the number
    assert(red("a +1234567- b") == "a [PHONE]- b")
    // double dash stops the match at the first dash
    assert(red("a +1234567--8 b") == "a [PHONE]--8 b")
  }

  test("long numbers: 13-digit threshold, left anchoring") {
    assert(red("id 1234567890123 x") == "id [NUMBER] x")
    assert(red("id 123456789012 x") == "id 123456789012 x")
    assert(red("id 12345678901234567890 x") == "id [NUMBER] x")
  }

  test("mixed text redacts every entity once, in one pass") {
    val s = "u u7x@h0b.example plus +44155500042 net 10.7.49.7 acct 0000000000042 z"
    assert(red(s) == "u [EMAIL] plus [PHONE] net [IP] acct [NUMBER] z")
  }

  test("clean text is byte-identical; empty input safe") {
    val clean = "the quick brown fox jumps over the lazy dog"
    assert(red(clean) == clean)
    assert(red("") == "")
  }
}
