package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML -> markdown-ish conversion for log-entry comments (F5: the
  * reference maps `html2text` over `AdditionalComment`,
  * `warehouses/.../opralogweb/opralogweb.py:108-121`). Composed from
  * codegen'd regexp_replace calls — a deterministic, documented subset of
  * html2text: line breaks, bold/italic, tag stripping, entity unescape,
  * whitespace collapse.
  */
object HtmlFunctions {
  def htmlToMarkdown(c: Column): Column = {
    val breaks = regexp_replace(c, "(?i)<br\\s*/?>|</p>", "\n")
    val bold = regexp_replace(breaks, "(?i)</?(b|strong)>", "**")
    val italic = regexp_replace(bold, "(?i)</?(i|em)>", "*")
    val stripped = regexp_replace(italic, "<[^>]+>", "")
    val entities = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(stripped, "&nbsp;", " "),
          "&lt;", "<"),
        "&gt;", ">"),
      "&amp;", "&")
    trim(regexp_replace(entities, "[ \\t]+", " "))
  }
}
