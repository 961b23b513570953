package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class HtmlExtractSpec extends AnyFunSuite with SparkSpec {
  import HtmlExtract._

  test("blocks: boundaries at block tags, inline tags pass, whitespace collapses") {
    val bs = blocks("<p>hello  <b>bold</b>\n world</p><div>second block</div>")
    assert(bs.map(_.text) == Seq("hello bold world", "second block"))
    assert(bs.map(_.idx) == Seq(0, 1))
    assert(bs.head.n_chars == "hello bold world".length)
  }

  test("script/style/comment bodies are not page text") {
    val bs = blocks("<script>var x = '<p>trap</p>';</script><style>p{}</style>" +
      "<!-- <p>ghost</p> --><p>real text here</p>" +
      "<SCRIPT>UPPER.case()</SCRIPT><p>after</p>")
    assert(bs.map(_.text) == Seq("real text here", "after"))
  }

  test("anchor text attributes to link mass, nesting-safe") {
    val bs = blocks("<p><a href=x>link</a> and prose words</p>" +
      "<p><a><span>all</span> link</a></p>")
    assert(bs(0).link_chars == 4)
    assert(bs(0).n_chars == "link and prose words".length)
    assert(bs(1).link_chars == bs(1).n_chars) // whole block is anchor text
  }

  test("entities decode; unknown entities pass literally") {
    val bs = blocks("<p>a &amp; b &lt;c&gt; &quot;d&quot; &#65;&#x42; &bogus; e&nbsp;f</p>")
    assert(bs.head.text == "a & b <c> \"d\" AB &bogus; e f")
  }

  test("hostile input never throws: truncated tags, junk, empty, null") {
    assert(blocks("<p>ok<div").map(_.text) == Seq("ok"))
    assert(blocks("<script>never closed").isEmpty)
    assert(blocks("").isEmpty)
    assert(blocks(null).isEmpty)
    assert(blocks("plain no tags").map(_.text) == Seq("plain no tags"))
    assert(blocks("< 5 > x <<< &&").nonEmpty) // soup still yields something
  }

  test("extractMain keeps long link-sparse blocks, drops nav/short/link-heavy") {
    val html =
      "<nav><a href=/>Home</a> <a href=/a>About us</a></nav>" +
      "<h1>Hi</h1>" +
      "<p>This is the first real paragraph of the article body.</p>" +
      "<div><a href=x>sponsored advertisement link</a></div>" +
      "<p>Second paragraph with a <a href=y>small link</a> inside a lot of " +
      "surrounding prose text that dominates the block.</p>" +
      "<footer><a>contact</a> <a>imprint</a></footer>"
    val (text, nb, nc) = extractMain(html)
    assert(nc == 2 && nb == 6)
    assert(text ==
      "This is the first real paragraph of the article body.\n" +
      "Second paragraph with a small link inside a lot of surrounding " +
      "prose text that dominates the block.")
  }

  test("links: href forms, entities, nesting, script non-leak, totality") {
    val ls = links("""<a href="/a">first link</a> text""" +
      """<a href = 'b.html'>second</a>""" +
      """<a href=plain?x=1&amp;y=2>third &amp; co</a>""" +
      """<a name="no-href">skipped</a>""" +
      """<script>var a = '<a href="/ghost">g</a>';</script>""" +
      """<a href="/outer">out <a href="/inner">in</a>""")
    assert(ls.map(l => (l.link_idx, l.href, l.anchor_text)) == Seq(
      (0, "/a", "first link"),
      (1, "b.html", "second"),
      (2, "plain?x=1&y=2", "third & co"),
      (3, "/outer", "out"),     // nested <a> closes the outer
      (4, "/inner", "in")))     // unclosed trailing anchor still counts
    assert(links(null).isEmpty && links("").isEmpty)
    assert(links("<a href=>empty</a>").map(_.href) == Seq(""))
  }

  test("extractLinks runs distributed") {
    import spark.implicits._
    val df = Seq(
      (1L, """<p><a href="/x">one</a><a href="/y">two</a></p>"""),
      (2L, "<p>no links at all</p>")).toDF("doc_id", "html")
    val out = HtmlExtract.extractLinks(spark, df, "doc_id", "html")
      .collect().sortBy(r => (r.doc_id, r.link_idx))
    assert(out.toSeq == Seq(
      HtmlExtract.PageLink(1L, 0L, "/x", "one"),
      HtmlExtract.PageLink(1L, 1L, "/y", "two")))
  }

  test("extractDocs runs distributed") {
    import spark.implicits._
    val df = Seq(
      (1L, "<p>a paragraph easily long enough to keep here</p><nav><a>x</a></nav>"),
      (2L, "<div><a href=q>only a link block present</a></div>"))
      .toDF("doc_id", "html")
    val out = HtmlExtract.extractDocs(spark, df, "doc_id", "html")
      .collect().sortBy(_.doc_id)
    assert(out(0).main_text == "a paragraph easily long enough to keep here")
    assert(out(0).n_blocks == 2 && out(0).n_content == 1)
    assert(out(1).main_text == "" && out(1).n_content == 0)
  }
}
