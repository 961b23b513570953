package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spreadsheet-style tabular reads (F4): the reference reads Excel exports
  * with `skiprows`, header-less sheets with explicit column names, forced
  * string dtypes (format drift protection), and column renames
  * (`accelerator_sharepoint.py:26-81`, `electricity_sharepoint.py:168-173`).
  * There is no Excel reader on a Spark classpath by design — sheet exports
  * are declared as CSV (SURVEY §2.2 F4) and this source reproduces the same
  * read options over them.
  */
object SheetSource {

  final case class SheetConfig(
      skipRows: Int = 0,
      columnNames: Seq[String] = Nil, // non-empty => header-less read
      forceString: Set[String] = Set.empty, // dtype=str overrides
      rename: Map[String, String] = Map.empty)

  def read(spark: SparkSession, path: String, config: SheetConfig): DataFrame = {
    import spark.implicits._
    // skiprows: drop the first N physical lines before parsing. coalesce(1)
    // makes "first N lines" well-defined — monotonically_increasing_id is
    // only line-ordered within one partition. Sheet exports are small
    // single files by nature; this is not a big-data path.
    val lines = spark.read.textFile(path).coalesce(1)
      .withColumn("__idx", monotonically_increasing_id())
    val body = lines.where(col("__idx") >= config.skipRows)
      .orderBy("__idx").select("value").as[String]

    val hasHeader = config.columnNames.isEmpty
    var df = spark.read
      .option("header", hasHeader.toString)
      .option("inferSchema", "true")
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
}
