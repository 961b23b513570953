package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.runner.{Resource, ResourceWriteProperties}

/** The accelerator_sharepoint ingest pipeline (F4,
  * `warehouses/facility_ops_landing/ingest/accelerator/accelerator_sharepoint/accelerator_sharepoint.py:25-81`):
  * two sheet exports pulled from a SharePoint site and landed with
  * write_disposition=replace —
  *
  *  - `Equipment downtime data 11_08_24`: read with a header row;
  *    FaultDate/FaultTime forced to text (the source mixes timestamp
  *    formats, `accelerator_sharepoint.py:43-49`); column names are
  *    dlt-normalized to snake_case.
  *  - `EDR Equipment Mapping`: header-less, explicit column names
  *    (`accelerator_sharepoint.py:74`).
  *
  * Sheet exports are declared as CSV here (SURVEY §2.2 F4 — no Excel
  * reader on a Spark classpath by design); the SharePoint fetch itself is
  * the file listing of the source directory.
  */
final class SharepointSheetSource(spark: SparkSession, sourceDir: String) {

  /** dlt's column normalizer (snake_case): camelCase boundaries and
    * whitespace/punctuation become underscores, lowercased — the rule that
    * turns `FaultDate` into `fault_date` and `User Run` into `user_run`. */
  def normalizeColumn(name: String): String =
    name.trim
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("_+", "_")
      .stripPrefix("_").stripSuffix("_")
      .toLowerCase

  private def snakeColumns(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, normalizeColumn(c)))

  def downtimeData(): DataFrame =
    snakeColumns(SheetSource.read(spark,
      s"$sourceDir/Equipment downtime data 11_08_24.csv",
      SheetSource.SheetConfig(forceString = Set("FaultDate", "FaultTime"))))

  def edrMapping(): DataFrame =
    SheetSource.read(spark, s"$sourceDir/EDR Equipment Mapping.csv",
      SheetSource.SheetConfig(
        columnNames = Seq("equipment_name", "equipment_category")))

  def resources: Seq[Resource] = Seq(
    Resource("equipment_downtime_data_11_08_24", _ => Iterator(downtimeData()),
      ResourceWriteProperties(writeMode = "replace"), dltColumns = true),
    Resource("edr_equipment_mapping", _ => Iterator(edrMapping()),
      ResourceWriteProperties(writeMode = "replace"), dltColumns = true))
}
