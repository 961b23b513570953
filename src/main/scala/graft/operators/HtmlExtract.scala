package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** HTML main-content extraction (boilerplate removal) — the step that
  * turns a crawled page into training text: navigation, ads, footers and
  * script junk must go, the article must stay. The approach is the
  * published jusText/Arc90 family's core signal, deterministic and
  * threshold-based (no trained model): segment the page into BLOCKS at
  * block-level tag boundaries, score each block's LINK DENSITY (chars of
  * anchor text / chars of text) and LENGTH, keep blocks that read like
  * prose (long enough, link-sparse).
  *
  * The tokenizer is a real character walk, not a regex pile: comments
  * and `<script>/<style>/<noscript>/<template>` bodies are skipped
  * whole (their text is NOT page text), block-level open/close tags cut
  * block boundaries, `<a>` nesting depth attributes text to link mass,
  * entities (`&amp; &lt; &gt; &quot; &#39; &nbsp; &#NNN; &#xHH;`)
  * decode, whitespace collapses per block. Total: any byte soup yields
  * SOME block list, never a throw (crawled HTML is hostile).
  *
  * Scale shape: a per-row char walk in `mapPartitions` — zero shuffle,
  * scan speed at 100 TB; the thresholds are data-independent so the
  * operator composes with the admission gates (D58/D60 first, this
  * next, quality scoring after).
  */
object HtmlExtract {

  /** One segmented block: 0-based index, collapsed text, total text
    * chars, chars inside anchors. */
  final case class Block(idx: Int, text: String, n_chars: Int, link_chars: Int)

  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "td", "th", "tr", "table", "article", "section", "header", "footer",
    "nav", "aside", "blockquote", "pre", "br", "hr", "form", "main",
    "figure", "figcaption", "dl", "dt", "dd", "body", "html", "title")

  private val RawTextTags: Set[String] = Set("script", "style", "noscript",
    "template")

  /** Decode one entity starting at `i` (at '&'); returns (char, next
    * index) or (null, i+1) when not a recognized entity (the '&' then
    * passes through literally, the browser-lenient stance). */
  private def entity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return (null, i + 1)
    val name = s.substring(i + 1, semi)
    val out = name match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case _ if name.startsWith("#x") || name.startsWith("#X") =>
        try {
          val cp = Integer.parseInt(name.substring(2), 16)
          if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp))
          else null
        } catch { case _: NumberFormatException => null }
      case _ if name.startsWith("#") =>
        try {
          val cp = Integer.parseInt(name.substring(1))
          if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp))
          else null
        } catch { case _: NumberFormatException => null }
      case _ => null
    }
    if (out == null) (null, i + 1) else (out, semi + 1)
  }

  /** Segment HTML into blocks. Never throws. */
  def blocks(html: String): Seq[Block] = {
    if (html == null || html.isEmpty) return Seq.empty
    val out = Seq.newBuilder[Block]
    val sb = new StringBuilder
    var linkChars = 0
    var linkDepth = 0
    var idx = 0
    var lastWasSpace = true

    def flush(): Unit = {
      val text = sb.toString.trim
      if (text.nonEmpty) {
        out += Block(idx, text, text.length, math.min(linkChars, text.length))
        idx += 1
      }
      sb.clear(); linkChars = 0; lastWasSpace = true
    }
    def emit(str: String): Unit = str.foreach { ch =>
      if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r') {
        if (!lastWasSpace) {
          sb.append(' '); lastWasSpace = true
          if (linkDepth > 0) linkChars += 1 // anchor-internal spaces are link mass
        }
        // leading spaces drop via trim at flush
      } else {
        sb.append(ch); lastWasSpace = false
        if (linkDepth > 0) linkChars += 1
      }
    }

    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val close = html.indexOf('>', i + 1)
          if (close < 0) i = n // truncated tag: drop the tail
          else {
            val inner = html.substring(i + 1, close).trim
            val isEnd = inner.startsWith("/")
            val nameRaw = (if (isEnd) inner.drop(1) else inner)
              .takeWhile(ch => ch.isLetterOrDigit)
            val name = nameRaw.toLowerCase
            i = close + 1
            if (!isEnd && RawTextTags(name) && !inner.endsWith("/")) {
              // skip the raw-text body to the matching close tag
              // (case-insensitive scan in place — no lowercased copy of
              // the page per script tag)
              val endTag = s"</$name"
              var at = -1
              var j = i
              while (at < 0 && j <= n - endTag.length) {
                if (html.regionMatches(true, j, endTag, 0, endTag.length)) at = j
                j += 1
              }
              if (at < 0) i = n
              else {
                val gt = html.indexOf('>', at)
                i = if (gt < 0) n else gt + 1
              }
            } else if (name == "a") {
              if (isEnd) linkDepth = math.max(0, linkDepth - 1)
              else if (!inner.endsWith("/")) linkDepth += 1
            } else if (BlockTags(name)) {
              flush()
            }
            // inline tags (b, i, span, img, ...) pass through silently
          }
        }
      } else if (c == '&') {
        val (str, next) = entity(html, i)
        if (str == null) { emit("&"); i = next }
        else { emit(str); i = next }
      } else {
        emit(c.toString)
        i += 1
      }
    }
    flush()
    out.result()
  }

  /** Keep blocks that read like prose: >= `minChars` collapsed chars and
    * link density < `maxLinkDensityPct`/100 (integer threshold so the
    * decision is exactly restatable in SQL: 100*link < pct*total). */
  def extractMain(html: String, minChars: Int = 25,
                  maxLinkDensityPct: Int = 33): (String, Long, Long) = {
    val bs = blocks(html)
    val content = bs.filter(b =>
      b.n_chars >= minChars && 100L * b.link_chars < maxLinkDensityPct.toLong * b.n_chars)
    (content.map(_.text).mkString("\n"), bs.size.toLong, content.size.toLong)
  }

  final case class Extracted(doc_id: Long, main_text: String,
                             n_blocks: Long, n_content: Long)

  /** One outgoing link: 0-based within-page index, href as written
    * (entity-decoded), collapsed anchor text. */
  final case class Link(link_idx: Int, href: String, anchor_text: String)

  /** Extract (href, anchor text) pairs — the LINK GRAPH feeder (D42's
    * host PageRank and anchor-text retrieval both stand on this table).
    * Same tokenizer walk as [[blocks]]: script/style/comment bodies
    * cannot contribute links, entities in href and anchor decode,
    * nested `<a>` closes the outer anchor first (the browser-lenient
    * reading), anchors without an href are skipped. Total on hostile
    * input. */
  def links(html: String): Seq[Link] = {
    if (html == null || html.isEmpty) return Seq.empty
    val out = Seq.newBuilder[Link]
    var idx = 0
    var href: String = null
    val anchor = new StringBuilder
    var lastWasSpace = true

    def decodeAll(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '&') {
          val (str, next) = entity(s, i)
          if (str == null) { sb.append('&'); i = next }
          else { sb.append(str); i = next }
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
    def closeAnchor(): Unit = {
      if (href != null) {
        out += Link(idx, href, anchor.toString.trim)
        idx += 1
      }
      href = null; anchor.clear(); lastWasSpace = true
    }
    /** The href attribute value of an `<a ...>` tag body, or null. */
    def hrefOf(inner: String): String = {
      val lower = inner.toLowerCase
      var at = lower.indexOf("href")
      while (at >= 0) {
        // must be a standalone attribute name
        val beforeOk = at == 0 || !lower.charAt(at - 1).isLetterOrDigit
        var j = at + 4
        while (j < inner.length && inner.charAt(j).isWhitespace) j += 1
        if (beforeOk && j < inner.length && inner.charAt(j) == '=') {
          j += 1
          while (j < inner.length && inner.charAt(j).isWhitespace) j += 1
          if (j < inner.length && (inner.charAt(j) == '"' || inner.charAt(j) == '\'')) {
            val q = inner.charAt(j)
            val end = inner.indexOf(q, j + 1)
            return decodeAll(
              if (end < 0) inner.substring(j + 1) else inner.substring(j + 1, end))
          }
          // unquoted value: runs to whitespace
          val end0 = inner.indexWhere(_.isWhitespace, j)
          val end = if (end0 < 0) inner.length else end0
          if (end > j) return decodeAll(inner.substring(j, end))
          return ""
        }
        at = lower.indexOf("href", at + 4)
      }
      null
    }

    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val close = html.indexOf('>', i + 1)
          if (close < 0) i = n
          else {
            val inner = html.substring(i + 1, close).trim
            val isEnd = inner.startsWith("/")
            val name = (if (isEnd) inner.drop(1) else inner)
              .takeWhile(_.isLetterOrDigit).toLowerCase
            i = close + 1
            if (!isEnd && RawTextTags(name) && !inner.endsWith("/")) {
              val endTag = s"</$name"
              var at = -1
              var j = i
              while (at < 0 && j <= n - endTag.length) {
                if (html.regionMatches(true, j, endTag, 0, endTag.length)) at = j
                j += 1
              }
              if (at < 0) i = n
              else {
                val gt = html.indexOf('>', at)
                i = if (gt < 0) n else gt + 1
              }
            } else if (name == "a") {
              if (isEnd) { if (href != null) closeAnchor() }
              else {
                if (href != null) closeAnchor() // nested <a>: close outer
                href = hrefOf(inner)
                anchor.clear(); lastWasSpace = true
              }
            }
          }
        }
      } else if (href != null) {
        if (c == '&') {
          val (str, next) = entity(html, i)
          val s = if (str == null) "&" else str
          s.foreach { ch =>
            if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r') {
              if (!lastWasSpace) { anchor.append(' '); lastWasSpace = true }
            } else { anchor.append(ch); lastWasSpace = false }
          }
          i = next
        } else {
          if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
            if (!lastWasSpace) { anchor.append(' '); lastWasSpace = true }
          } else { anchor.append(c); lastWasSpace = false }
          i += 1
        }
      } else i += 1
    }
    if (href != null) closeAnchor() // unclosed trailing anchor still counts
    out.result()
  }

  final case class PageLink(doc_id: Long, link_idx: Long, href: String,
                            anchor_text: String)

  /** Partition-parallel link extraction — one (doc, link) row per anchor
    * with an href; the input table of every link-graph operator. */
  def extractLinks(spark: SparkSession, df: DataFrame, idCol: String,
                   htmlCol: String): Dataset[PageLink] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, html) =>
        // NULL html = no fetched body (a crawl-table reality): no links.
        if (html == null) Iterator.empty
        else links(html).iterator.map(l => PageLink(id, l.link_idx.toLong,
          l.href, l.anchor_text))
      })
  }

  /** Partition-parallel extraction over (id, html) rows. A NULL html cell
    * (no fetched body — a crawl-table reality) contributes no output row:
    * unlike an empty-after-classification page (which reports text="" and
    * its block counts), an absent body has nothing to classify. */
  def extractDocs(spark: SparkSession, df: DataFrame, idCol: String,
                  htmlCol: String, minChars: Int = 25,
                  maxLinkDensityPct: Int = 33): Dataset[Extracted] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, html) =>
        if (html == null) Iterator.empty
        else {
          val (text, nb, nc) = extractMain(html, minChars, maxLinkDensityPct)
          Iterator.single(Extracted(id, text, nb, nc))
        }
      })
  }
}
