package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** F4: skiprows / header-less names / dtype-str overrides / renames
  * (`accelerator_sharepoint.py:26-81`, `electricity_sharepoint.py:168-173`). */
class SheetSourceSpec extends AnyFunSuite with SparkSpec {

  test("skiprows + rename, header row preserved after the skip") {
    val dir = tmpDir("sheet1")
    val f = Paths.get(dir, "export.csv")
    Files.write(f,
      """junk preamble line 1
        |junk preamble line 2
        |Time,Power
        |10:00:00,120.5
        |11:00:00,121.0
        |""".stripMargin.getBytes)
    val df = SheetSource.read(spark, f.toString,
      SheetSource.SheetConfig(skipRows = 2, rename = Map("Time" -> "date_time")))
    assert(df.columns.toSeq == Seq("date_time", "Power"))
    assert(df.count() == 2)
  }

  test("header-less read with explicit names and forced string dtypes") {
    val dir = tmpDir("sheet2")
    val f = Paths.get(dir, "plain.csv")
    Files.write(f, "Pump A,96/1,5.5\nPump B,03/2,4.0\n".getBytes)
    val df = SheetSource.read(spark, f.toString,
      SheetSource.SheetConfig(
        columnNames = Seq("equipment", "user_run", "downtime"),
        forceString = Set("user_run", "downtime")))
    assert(df.columns.toSeq == Seq("equipment", "user_run", "downtime"))
    assert(df.schema("user_run").dataType.typeName == "string")
    assert(df.schema("downtime").dataType.typeName == "string")
    // '96/1' survives as text (format-drift protection, not a date/number)
    assert(df.orderBy("equipment").collect().head.getString(1) == "96/1")
  }

  test("column-count mismatch on header-less read raises") {
    val dir = tmpDir("sheet3")
    val f = Paths.get(dir, "bad.csv")
    Files.write(f, "a,b\n".getBytes)
    intercept[IllegalArgumentException] {
      SheetSource.read(spark, f.toString,
        SheetSource.SheetConfig(columnNames = Seq("only_one")))
    }
  }
}
