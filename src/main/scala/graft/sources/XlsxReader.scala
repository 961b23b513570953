package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipFile

import scala.collection.mutable.ArrayBuffer

import javax.xml.XMLConstants
import javax.xml.parsers.DocumentBuilderFactory

import org.w3c.dom.{Document, Element}

/** Dependency-free minimal XLSX reader (F4). The reference reads real Excel
  * workbooks via pandas (`accelerator_sharepoint.py:26-38`,
  * `electricity_sharepoint.py:168-173`); no POI-style jar exists on a Spark
  * classpath by default, but an .xlsx file is only a zip of small XML parts,
  * all parseable with the JDK's built-in DOM parser:
  *
  *   - `xl/workbook.xml`            sheet names -> relationship ids
  *   - `xl/_rels/workbook.xml.rels` relationship ids -> worksheet parts
  *   - `xl/sharedStrings.xml`       the interned string table
  *   - `xl/worksheets/sheetN.xml`   rows of `<c r="A1" t="s"><v>..</v></c>`
  *
  * Scope is the reference's usage: text, numeric, boolean, shared/inline
  * string cells; sparse rows padded to rectangular. Styled date serials are
  * NOT converted (the reference's sheets carry text timestamps); formula
  * cells yield their cached `<v>` result, matching what pandas reads.
  *
  * This is a driver-side parse of a small single file (like pandas), not a
  * data-path operator — the output feeds the same Spark CSV parse as the
  * CSV-declared sheet path, so every `SheetConfig` option behaves
  * identically over either format.
  */
object XlsxReader {

  /** All cell texts of one sheet, row-major, padded rectangular. */
  def readRows(path: String, sheet: Option[String] = None): Seq[Seq[String]] = {
    val zip = new ZipFile(path)
    try {
      val sheetPart = resolveSheetPart(zip, sheet)
      val shared = sharedStrings(zip)
      val doc = parse(zip, sheetPart)
      val rows = ArrayBuffer.empty[ArrayBuffer[String]]
      var width = 0
      val rowNodes = doc.getElementsByTagName("row")
      for (i <- 0 until rowNodes.getLength) {
        val cells = ArrayBuffer.empty[String]
        val cellNodes = rowNodes.item(i).asInstanceOf[Element].getElementsByTagName("c")
        for (j <- 0 until cellNodes.getLength) {
          val c = cellNodes.item(j).asInstanceOf[Element]
          // `r="BC12"` places the cell; gaps between refs are empty cells
          val at = colIndex(c.getAttribute("r"))
          while (cells.length < at) cells += ""
          cells += cellText(c, shared)
        }
        width = math.max(width, cells.length)
        rows += cells
      }
      rows.map(r => (r ++ Seq.fill(width - r.length)("")).toSeq).toSeq
    } finally zip.close()
  }

  /** Sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] = {
    val zip = new ZipFile(path)
    try {
      val doc = parse(zip, "xl/workbook.xml")
      val ns = doc.getElementsByTagName("sheet")
      (0 until ns.getLength).map(i => ns.item(i).asInstanceOf[Element].getAttribute("name"))
    } finally zip.close()
  }

  private def resolveSheetPart(zip: ZipFile, sheet: Option[String]): String = {
    val wb = parse(zip, "xl/workbook.xml")
    val sheets = wb.getElementsByTagName("sheet")
    require(sheets.getLength > 0, "workbook has no sheets")
    var rid: String = null
    sheet match {
      case None => rid = relId(sheets.item(0).asInstanceOf[Element])
      case Some(name) =>
        for (i <- 0 until sheets.getLength) {
          val e = sheets.item(i).asInstanceOf[Element]
          if (e.getAttribute("name") == name) rid = relId(e)
        }
        require(rid != null, s"no sheet named '$name' " +
          s"(have: ${(0 until sheets.getLength).map(i => sheets.item(i).asInstanceOf[Element].getAttribute("name")).mkString(", ")})")
    }
    val rels = parse(zip, "xl/_rels/workbook.xml.rels")
    val relNodes = rels.getElementsByTagName("Relationship")
    var target: String = null
    for (i <- 0 until relNodes.getLength) {
      val e = relNodes.item(i).asInstanceOf[Element]
      if (e.getAttribute("Id") == rid) target = e.getAttribute("Target")
    }
    require(target != null, s"workbook.xml.rels has no relationship '$rid'")
    if (target.startsWith("/")) target.drop(1)
    else "xl/" + target
  }

  /** r-attribute namespaced as r:id; DOM getAttribute needs the raw name. */
  private def relId(sheetEl: Element): String = {
    val a = sheetEl.getAttributes
    (0 until a.getLength)
      .map(a.item(_))
      .find(n => n.getNodeName == "r:id" || n.getNodeName.endsWith(":id"))
      .map(_.getNodeValue)
      .getOrElse(sheetEl.getAttribute("sheetId"))
  }

  private def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    if (zip.getEntry("xl/sharedStrings.xml") == null) return IndexedSeq.empty
    val doc = parse(zip, "xl/sharedStrings.xml")
    val items = doc.getElementsByTagName("si")
    (0 until items.getLength).map { i =>
      // rich-text runs split one string across several <t>; concatenate
      val ts = items.item(i).asInstanceOf[Element].getElementsByTagName("t")
      (0 until ts.getLength).map(ts.item(_).getTextContent).mkString
    }
  }

  private def cellText(c: Element, shared: IndexedSeq[String]): String = {
    def v: String = {
      val ns = c.getElementsByTagName("v")
      if (ns.getLength == 0) "" else ns.item(0).getTextContent
    }
    c.getAttribute("t") match {
      case "s"         => val i = v.trim.toInt
                          require(i >= 0 && i < shared.length, s"shared string #$i out of range")
                          shared(i)
      case "inlineStr" => val ts = c.getElementsByTagName("t")
                          (0 until ts.getLength).map(ts.item(_).getTextContent).mkString
      case "b"         => if (v.trim == "1") "true" else "false"
      case "e"         => "" // error cells (#N/A etc.) read as missing, like pandas
      case _           => v  // "n", "str" (formula cache), or untyped numeric
    }
  }

  /** "BC12" -> 0-based column 54. */
  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    if (letters.isEmpty) 0
    else letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1
  }

  private def parse(zip: ZipFile, entry: String): Document = {
    val e = zip.getEntry(entry)
    require(e != null, s"xlsx is missing part '$entry'")
    val bytes = zip.getInputStream(e).readAllBytes()
    val f = DocumentBuilderFactory.newInstance()
    // OOXML needs no DTD/external entities; locking them out also makes the
    // parse safe on untrusted workbook bytes
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setAttribute(XMLConstants.ACCESS_EXTERNAL_DTD, "")
    f.setAttribute(XMLConstants.ACCESS_EXTERNAL_SCHEMA, "")
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }
}
