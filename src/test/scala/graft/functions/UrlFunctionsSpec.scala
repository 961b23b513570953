package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class UrlFunctionsSpec extends AnyFunSuite with SparkSpec {
  import UrlFunctions._

  test("scheme/host case, default ports, fragments") {
    assert(canonicalizeUrl("HTTP://WWW.Example.COM:80/Path#frag")
      .contains("http://www.example.com/Path"))
    assert(canonicalizeUrl("https://Example.com:443/")
      .contains("https://example.com/"))
    // non-default port survives
    assert(canonicalizeUrl("http://example.com:8080/x")
      .contains("http://example.com:8080/x"))
    // path CASE is preserved (paths are case-sensitive resources)
    assert(canonicalizeUrl("http://a.com/CaseSensitive")
      .contains("http://a.com/CaseSensitive"))
  }

  test("dot-segment resolution and empty path") {
    assert(canonicalizeUrl("http://a.com/a/b/../c/./d")
      .contains("http://a.com/a/c/d"))
    assert(canonicalizeUrl("http://a.com")
      .contains("http://a.com/"))
  }

  test("query parameter sort + tracking-parameter removal") {
    assert(canonicalizeUrl("http://a.com/p?z=1&a=2&m=0")
      .contains("http://a.com/p?a=2&m=0&z=1"))
    assert(canonicalizeUrl("http://a.com/p?utm_source=x&a=1&utm_medium=y&gclid=123")
      .contains("http://a.com/p?a=1"))
    // all params tracking: query removed entirely
    assert(canonicalizeUrl("http://a.com/p?utm_source=x")
      .contains("http://a.com/p"))
    // duplicate keys: stable by (key, full pair)
    assert(canonicalizeUrl("http://a.com/p?b=2&b=1&a=9")
      .contains("http://a.com/p?a=9&b=1&b=2"))
    // no percent-decoding (dedup keys must not change the resource)
    assert(canonicalizeUrl("http://a.com/p%2Fq")
      .contains("http://a.com/p%2Fq"))
  }

  test("unparseable / non-http URLs are None, never a throw") {
    assert(canonicalizeUrl(null).isEmpty)
    assert(canonicalizeUrl("").isEmpty)
    assert(canonicalizeUrl("not a url at all ::").isEmpty)
    assert(canonicalizeUrl("ftp://example.com/x").isEmpty)
    assert(canonicalizeUrl("http://").isEmpty)
    assert(canonicalizeUrl("mailto:a@b.com").isEmpty)
  }

  test("urlHost extracts the lowercased host") {
    assert(urlHost("HTTPS://Sub.Example.COM/x?a=1").contains("sub.example.com"))
    assert(urlHost("http://example.com:8080/x").contains("example.com"))
    assert(urlHost("garbage").isEmpty)
  }

  test("withCanonicalUrls: shuffle-free projection, nulls for junk") {
    import spark.implicits._
    val df = Seq(
      ("HTTP://A.com:80/x/../y?utm_source=t&b=1", 1),
      ("nonsense", 2),
      (null: String, 3)).toDF("url", "id")
    val out = UrlFunctions.withCanonicalUrls(df, "url")
      .select("id", "canonical_url", "url_host").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), Option(r.getString(2))))
      .sortBy(_._1)
    assert(out(0) == ((1, Some("http://a.com/y?b=1"), Some("a.com"))))
    assert(out(1) == ((2, None, None)))
    assert(out(2) == ((3, None, None)))
    val plan = UrlFunctions.withCanonicalUrls(df, "url")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(300))
  }

  test("hostSuffixes yields the dot-boundary chain, most-specific first") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq("a.b.com", "com", "x.y").toDF("h")
      .select(UrlFunctions.hostSuffixes(col("h")).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a.b.com", "b.com", "com"))
    assert(out(1) == Seq("com"))
    assert(out(2) == Seq("x.y", "y"))
  }

  test("blocklistFilter: suffix-at-dot-boundary, case-folded, " +
       "subdomain blocked, lookalike label NOT blocked") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Ads.Example.com"),      // exact listed domain (case folded)
      (2L, "x.ads.example.com"),    // subdomain of listed -> blocked
      (3L, "notads.example.com"),   // label boundary: NOT a suffix match
      (4L, "example.com"),          // parent of listed -> clean
      (5L, "clean.org")).toDF("doc_id", "host")
    val bl = Seq("ads.example.com").toDF("domain")
    val out = UrlFunctions.blocklistFilter(docs, "doc_id", "host", bl)
      .orderBy("doc_id")
      .select("doc_id", "matched_domain", "blocked").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, Some("ads.example.com"), 1L),
      (2L, Some("ads.example.com"), 1L),
      (3L, None, 0L), (4L, None, 0L), (5L, None, 0L)))
  }
}
