package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** F4 over real .xlsx bytes: a genuine zip-of-XML workbook (built here with
  * ZipOutputStream — shared strings, inline strings, sparse cells, booleans,
  * two sheets) must read byte-for-byte identically to the CSV-declared path
  * under every `SheetConfig` option (`accelerator_sharepoint.py:26-38` reads
  * the same workbooks via pandas). */
class XlsxReaderSpec extends AnyFunSuite with SparkSpec {

  /** A minimal but spec-complete workbook. Sheet1 mirrors the accelerator
    * export: 2 junk preamble rows, header, data rows with a numeric column.
    * Sheet2 exercises inline strings, booleans, and a sparse row. */
  private def writeFixture(dir: String): Path = {
    val p = Paths.get(dir, "export.xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(p))
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n" + body).getBytes("UTF-8"))
      zos.closeEntry()
    }
    part("[Content_Types].xml",
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |</Types>""".stripMargin)
    part("_rels/.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |<sheet name="Export" sheetId="1" r:id="rId1"/>
        |<sheet name="Flags" sheetId="2" r:id="rId2"/>
        |</sheets>
        |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    // index 3 is a rich-text run split across two <t> elements
    part("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="6" uniqueCount="6">
        |<si><t>junk preamble</t></si>
        |<si><t>Time</t></si>
        |<si><t>Power</t></si>
        |<si><r><t>10:</t></r><r><t>00:00</t></r></si>
        |<si><t>11:00:00</t></si>
        |<si><t xml:space="preserve">has, comma</t></si>
        |<si><t xml:space="preserve">say "hi", ok</t></si>
        |</sst>""".stripMargin)
    part("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>0</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>1</v></c><c r="B3" t="s"><v>2</v></c></row>
        |<row r="4"><c r="A4" t="s"><v>3</v></c><c r="B4"><v>120.5</v></c></row>
        |<row r="5"><c r="A5" t="s"><v>4</v></c><c r="B5"><v>121</v></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin)
    // sparse row (C only), inline string, boolean, comma-bearing shared string
    part("xl/worksheets/sheet2.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>name</t></is></c><c r="B1" t="inlineStr"><is><t>ok</t></is></c><c r="C1" t="inlineStr"><is><t>note</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>5</v></c><c r="B2" t="b"><v>1</v></c><c r="C2" t="inlineStr"><is><t>x</t></is></c></row>
        |<row r="3"><c r="A3" t="s"><v>6</v></c><c r="C3" t="inlineStr"><is><t>only c</t></is></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin)
    zos.close()
    p
  }

  test("raw rows: shared/inline strings, booleans, sparse cells, rich runs") {
    val dir = tmpDir("xlsx_raw")
    val p = writeFixture(dir)
    assert(XlsxReader.sheetNames(p.toString) == Seq("Export", "Flags"))
    val s1 = XlsxReader.readRows(p.toString)
    assert(s1(2) == Seq("Time", "Power"))
    assert(s1(3) == Seq("10:00:00", "120.5")) // rich-text run concatenated
    val s2 = XlsxReader.readRows(p.toString, Some("Flags"))
    assert(s2(1) == Seq("has, comma", "true", "x"))
    assert(s2(2) == Seq("say \"hi\", ok", "", "only c")) // sparse middle cell
    val e = intercept[IllegalArgumentException] {
      XlsxReader.readRows(p.toString, Some("Nope"))
    }
    assert(e.getMessage.contains("no sheet named"), e.getMessage)
  }

  test("xlsx reads byte-for-byte equal to the CSV-declared path") {
    val dir = tmpDir("xlsx_eq")
    val xlsx = writeFixture(dir)
    val csv = Paths.get(dir, "export.csv")
    Files.write(csv,
      """junk preamble
        |junk preamble
        |Time,Power
        |10:00:00,120.5
        |11:00:00,121
        |""".stripMargin.getBytes)
    val cfg = SheetSource.SheetConfig(skipRows = 2, rename = Map("Time" -> "date_time"))
    val fromXlsx = SheetSource.read(spark, xlsx.toString, cfg)
    val fromCsv = SheetSource.read(spark, csv.toString, cfg)
    assert(fromXlsx.schema == fromCsv.schema)
    assert(fromXlsx.collect().toSeq.sortBy(_.toString) ==
      fromCsv.collect().toSeq.sortBy(_.toString))
    assert(fromXlsx.columns.toSeq == Seq("date_time", "Power"))
    assert(fromXlsx.count() == 2)
  }

  test("sheet selection + header-less names + forceString over xlsx") {
    val dir = tmpDir("xlsx_cfg")
    val xlsx = writeFixture(dir)
    val df = SheetSource.read(spark, xlsx.toString,
      SheetSource.SheetConfig(
        skipRows = 1, // drop the header row; names supplied explicitly
        columnNames = Seq("who", "flag", "note"),
        forceString = Set("flag"),
        sheet = Some("Flags")))
    assert(df.columns.toSeq == Seq("who", "flag", "note"))
    assert(df.schema("flag").dataType.typeName == "string")
    val rows = df.orderBy("note").collect()
    assert(rows.length == 2)
    // comma- and quote-bearing cells survive the funnel through the CSV
    // parse intact (round-6 ADVICE: the read must use the doubled-quote
    // escape convention csvEscape writes, not Spark's default backslash)
    assert(rows.find(_.getString(2) == "x").get.getString(0) == "has, comma")
    assert(rows.find(_.getString(2) == "only c").get.getString(0) ==
      "say \"hi\", ok")
    assert(rows.find(_.getString(2) == "only c").get.isNullAt(1))
  }
}
