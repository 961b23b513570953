package graft.sources

import java.time.format.DateTimeFormatter
import java.time.{LocalDateTime, ZoneId, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The electricity-meter CSV family (F1/F2/F3,
  * `warehouses/.../electricity_sharepoint/electricity_sharepoint.py:45-165`):
  *
  *  - F1: one file holds multiple sections, each introduced by a header line
  *    whose first column is `time`-anchored; `site information` preamble
  *    blocks are dropped.
  *  - F2: three header variants, dispatched on the SECOND column name:
  *    `Date` => automated format (separate `dd/MM/yy` date + `HH:mm:ss` time
  *    columns); otherwise manual format (single `dd/MM/yy HH:mm:ss` column).
  *    The power column is the following column.
  *  - F3: timestamps are naive Europe/London wall time -> UTC; sections
  *    containing DST-ambiguous or nonexistent times are DROPPED with a
  *    warning (the reference's pandas `tz_localize` raises and the section
  *    is skipped) — Spark's `to_utc_timestamp` would pick an offset
  *    silently, so ambiguity detection is explicit here.
  */
object ElectricityCsv {

  final case class Reading(dateTimeUtc: java.sql.Timestamp, powerMw: Double,
                           fileName: String)

  private val London = ZoneId.of("Europe/London")
  private val DateFmt = DateTimeFormatter.ofPattern("dd/MM/yy")
  private val TimeFmt = DateTimeFormatter.ofPattern("HH:mm:ss")
  private val ManualFmt = DateTimeFormatter.ofPattern("dd/MM/yy HH:mm:ss")

  private def isHeader(line: String): Boolean =
    line.split(",").headOption.exists(_.trim.equalsIgnoreCase("time"))

  private def isPreamble(line: String): Boolean =
    line.toLowerCase.contains("site information")

  /** Split on header lines, dropping preamble blocks (F1). Returns
    * (headerColumns, dataLines) per section. */
  def sections(content: String): Seq[(Seq[String], Seq[String])] = {
    val lines = content.split("\r?\n").toSeq
    val result = scala.collection.mutable.ListBuffer.empty[(Seq[String], scala.collection.mutable.ListBuffer[String])]
    var inPreamble = false
    lines.foreach { line =>
      if (isPreamble(line)) inPreamble = true
      else if (isHeader(line)) {
        inPreamble = false
        result += ((line.split(",").map(_.trim).toSeq,
          scala.collection.mutable.ListBuffer.empty[String]))
      } else if (!inPreamble && line.trim.nonEmpty && result.nonEmpty) {
        result.last._2 += line
      }
    }
    result.map { case (h, b) => (h, b.toSeq) }.toSeq
  }

  /** Parse one section to naive London wall times + power (F2 dispatch). */
  def parseSection(header: Seq[String], rows: Seq[String]): Seq[(LocalDateTime, Double)] = {
    require(header.size >= 3 || (header.size >= 2 && !isAutomated(header)),
      s"Section header too narrow: $header")
    if (isAutomated(header)) {
      // time, Date, <power>: dd/MM/yy in col 1... reference: col0 time
      // (HH:mm:ss), col1 Date (dd/MM/yy), col2 power
      rows.map { r =>
        val f = r.split(",").map(_.trim)
        val ldt = LocalDateTime.of(
          java.time.LocalDate.parse(f(1), DateFmt),
          java.time.LocalTime.parse(f(0), TimeFmt))
        (ldt, f(2).toDouble)
      }
    } else {
      // time (dd/MM/yy HH:mm:ss), <power>
      rows.map { r =>
        val f = r.split(",").map(_.trim)
        (LocalDateTime.parse(f(0), ManualFmt), f(1).toDouble)
      }
    }
  }

  private def isAutomated(header: Seq[String]): Boolean =
    header.lift(1).exists(_.equalsIgnoreCase("Date"))

  /** True iff the wall time is DST-ambiguous (clock overlap) or nonexistent
    * (spring-forward gap) in Europe/London. */
  def isDstProblem(ldt: LocalDateTime): Boolean =
    London.getRules.getValidOffsets(ldt).size != 1

  /** Parse a whole file; sections with any DST-problem rows are dropped
    * (F3). Returns readings plus the number of dropped sections. */
  def parseContent(fileName: String, content: String): (Seq[Reading], Int) = {
    var dropped = 0
    val readings = sections(content).flatMap { case (header, rows) =>
      val parsed = parseSection(header, rows)
      if (parsed.exists { case (ldt, _) => isDstProblem(ldt) }) {
        dropped += 1
        Nil
      } else parsed.map { case (ldt, p) =>
        Reading(java.sql.Timestamp.from(
          ldt.atZone(London).toInstant), p, fileName)
      }
    }
    (readings, dropped)
  }

  /** F6: parse many files cluster-parallel into one DataFrame
    * (`date_time` UTC, `isis_elec_total_power_mw`, `file_name` — the
    * rdm_data landing schema, FIXTURES.md §5). */
  def readFiles(spark: SparkSession, files: Seq[String],
                parallelism: Int = 8): DataFrame = {
    import spark.implicits._
    FileSources.parseFiles(spark, files, parallelism) { path =>
      val content = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)))
      val name = java.nio.file.Paths.get(path).getFileName.toString
      parseContent(name, content)._1.iterator
    }.toDF("date_time", "isis_elec_total_power_mw", "file_name")
  }
}
