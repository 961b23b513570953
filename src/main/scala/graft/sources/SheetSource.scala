package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Spreadsheet-style tabular reads (F4): the reference reads Excel workbooks
  * with `skiprows`, header-less sheets with explicit column names, forced
  * string dtypes (format drift protection), and column renames
  * (`accelerator_sharepoint.py:26-81`, `electricity_sharepoint.py:168-173`).
  * Two physical formats feed one logical read:
  *
  *   - CSV sheet exports (SURVEY §2.2 F4's declared form), and
  *   - real `.xlsx` workbooks via [[XlsxReader]] (zip + JDK DOM, no new
  *     dependency), whose cells are rendered to the same line shape.
  *
  * Both funnel through one Spark CSV parse, so every `SheetConfig` option
  * behaves identically over either format.
  */
object SheetSource {

  final case class SheetConfig(
      skipRows: Int = 0,
      columnNames: Seq[String] = Nil, // non-empty => header-less read
      forceString: Set[String] = Set.empty, // dtype=str overrides
      rename: Map[String, String] = Map.empty,
      sheet: Option[String] = None) // xlsx only: sheet name (default first)

  def read(spark: SparkSession, path: String, config: SheetConfig): DataFrame = {
    import spark.implicits._
    val body: Dataset[String] =
      if (path.toLowerCase.endsWith(".xlsx")) {
        // Driver-side parse of a small single workbook (like pandas), then
        // the rows join the distributed CSV parse below. skiprows counts
        // sheet rows, same as physical lines on the CSV path.
        val rows = XlsxReader.readRows(path, config.sheet).drop(config.skipRows)
        spark.createDataset(rows.map(_.map(csvEscape).mkString(",")))
      } else {
        // skiprows: drop the first N physical lines before parsing.
        // coalesce(1) makes "first N lines" well-defined —
        // monotonically_increasing_id is only line-ordered within one
        // partition. Sheet exports are small single files by nature; this
        // is not a big-data path.
        spark.read.textFile(path).coalesce(1)
          .withColumn("__idx", monotonically_increasing_id())
          .where(col("__idx") >= config.skipRows)
          .orderBy("__idx").select("value").as[String]
      }

    val hasHeader = config.columnNames.isEmpty
    var df = spark.read
      .option("header", hasHeader.toString)
      .option("inferSchema", "true")
      // csvEscape doubles embedded quotes (RFC 4180); Spark's default
      // escape is backslash, so the read must be told the same doubled-
      // quote convention or a literal '"' in a cell fails to round-trip.
      .option("escape", "\"")
      .csv(body)
    if (!hasHeader) {
      require(df.columns.length == config.columnNames.length,
        s"Expected ${config.columnNames.length} columns, found ${df.columns.length}")
      df = df.toDF(config.columnNames: _*)
    }
    // forced string dtypes, like pandas dtype=str overrides
    config.forceString.foreach { c =>
      if (df.columns.contains(c)) df = df.withColumn(c, col(c).cast("string"))
    }
    config.rename.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
  }

  private def csvEscape(s: String): String =
    if (s.exists(ch => ch == ',' || ch == '"' || ch == '\n' || ch == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
