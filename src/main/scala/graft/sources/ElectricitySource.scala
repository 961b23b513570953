package graft.sources

import java.time.ZoneOffset

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.runner.{Resource, ResourceWriteProperties, Watermark, WatermarkValue}

/** The electricity_sharepoint ingest pipeline
  * (`warehouses/facility_ops_landing/ingest/estates/electricity_sharepoint/electricity_sharepoint.py:176-241`):
  * meter CSV exports on a SharePoint drive parsed into the `rdm_data`
  * landing table, upserted on the `date_time` primary key.
  *
  *  - incremental (default): only `*-ISIS.csv` files modified after the
  *    latest loaded `date_time` are fetched (`:239-241`) — here the stored
  *    ingest watermark carries that timestamp, and the file listing's
  *    mtime filter applies it, so unchanged files are never re-parsed.
  *  - backfill: the historical `*-daily.csv` / `*-manual-export.csv`
  *    globs with no mtime filter (`:230-237`; the `.xlsx` glob is declared
  *    as CSV per SURVEY §2.2 F4).
  *
  * Parsing (multi-section headers, schema-variant dispatch, DST-drop
  * London->UTC) is [[ElectricityCsv]]; files parse cluster-parallel.
  */
final class ElectricitySource(spark: SparkSession, sourceDir: String,
                              backfill: Boolean = false,
                              parallelism: Int = 8) {

  val IncrementalGlob = "*-ISIS.csv"
  val BackfillGlobs: Seq[String] = Seq("**/*-daily.csv", "**/*-manual-export.csv")

  def listFiles(wm: Option[Watermark]): Seq[String] = {
    if (backfill)
      BackfillGlobs.flatMap(g => FileSources.globFiles(sourceDir, g)).distinct.sorted
    else {
      val modifiedAfter = wm.map(_.value).collect {
        case WatermarkValue.T(v) => v.toInstant(ZoneOffset.UTC).toEpochMilli
      }
      FileSources.globFiles(sourceDir, IncrementalGlob, modifiedAfter)
    }
  }

  def read(wm: Option[Watermark]): DataFrame = {
    val files = listFiles(wm)
    if (files.isEmpty) {
      import spark.implicits._
      Seq.empty[ElectricityCsv.Reading]
        .toDF("date_time", "isis_elec_total_power_mw", "file_name")
    } else ElectricityCsv.readFiles(spark, files, parallelism)
  }

  def resources: Seq[Resource] = Seq(
    Resource("rdm_data", wm => Iterator(read(wm)),
      ResourceWriteProperties(writeMode = "merge", mergeOn = Seq("date_time")),
      watermarkColumn = Some("date_time"), dltColumns = true))
}
