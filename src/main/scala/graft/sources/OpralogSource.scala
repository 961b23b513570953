package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HtmlFunctions
import graft.runner.{IngestRunner, Resource, ResourceWriteProperties, Watermark}

/** The opralogweb ingest pipeline re-expressed over a parquet-backed fake
  * source directory (the reference extracts from SQL Server via SQLAlchemy;
  * the e2e tier uses a fake SQLite DB —
  * `warehouses/facility_ops_landing/ingest/accelerator/opralogweb/opralogweb.py:66-150`,
  * `tests/fake_source/opralogmodel.py`).
  *
  * Semantics replicated:
  *  - small dimension tables replace wholesale; ChapterEntry appends with a
  *    LogbookEntryId cursor; Entries upserts on EntryId with a
  *    LastChangedDate cursor (epoch 2017-04-25, `opralogweb.py:28`)
  *  - AdditionalComment HTML -> markdown at extract time (F5)
  *  - MoreEntryColumns has no cursor column: rows are selected by
  *    `EntryId IN (ids extracted from Entries THIS run)` — the dependent
  *    semi-join extract (S6, `opralogweb.py:124-150`), relying on FIFO
  *    resource order like the reference's `next_item_mode="fifo"`
  *  - destination tables are snake_cased (dlt's normalizer)
  *  - chunked extraction: each resource yields `chunkSize`-row chunks
  *    (S1, default 5000 `sources/sqldatabase/__init__.py:32-33`)
  */
final class OpralogSource(spark: SparkSession, sourceDir: String,
                          chunkSize: Int = 5000) {

  val EntriesEpoch = "2017-04-25 00:00:00"

  private def src(table: String): DataFrame =
    spark.read.parquet(s"$sourceDir/$table.parquet")

  private def snake(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, toSnakeCase(c)))

  def toSnakeCase(name: String): String =
    name.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase

  /** Chunk a DataFrame into cursor-range slices ([[Chunker.rangeChunks]]) —
    * the Spark shape of SQLAlchemy's `yield_per(chunk_size)` streaming, with
    * every chunk predicate pushed into the scan. */
  private def chunks(df: DataFrame, orderCol: String): Iterator[DataFrame] =
    Chunker.rangeChunks(df, orderCol, chunkSize.toLong).map(snake)

  /** EntryIds captured from the Entries extraction of THIS run, consumed by
    * the MoreEntryColumns semi-join (reference: dlt `add_map` capture,
    * `opralogweb.py:124-133`). */
  private var extractedEntryIds: Option[DataFrame] = None

  def resources: Seq[Resource] = Seq(
    Resource("logbooks",
      _ => chunks(src("Logbooks"), "LogbookId"),
      ResourceWriteProperties(writeMode = "replace")),
    Resource("logbook_chapter",
      _ => chunks(src("LogbookChapter"), "LogbookChapterNo"),
      ResourceWriteProperties(writeMode = "replace")),
    Resource("additional_columns",
      _ => chunks(src("AdditionalColumns"), "AdditionalColumnId"),
      ResourceWriteProperties(writeMode = "replace")),
    Resource("chapter_entry",
      wm => {
        val base = src("ChapterEntry")
        val filtered = wm.map(w =>
          base.where(col("LogbookEntryId") > lit(wmLong(w)))).getOrElse(base)
        chunks(filtered, "LogbookEntryId")
      },
      ResourceWriteProperties(writeMode = "append"),
      watermarkColumn = Some("logbook_entry_id")),
    Resource("entries",
      wm => {
        val base = src("Entries")
          .withColumn("AdditionalComment",
            HtmlFunctions.htmlToMarkdown(col("AdditionalComment")))
        val cutoff = wm.map(wmTimestamp)
          .getOrElse(java.sql.Timestamp.valueOf(EntriesEpoch))
        val filtered = base.where(col("LastChangedDate") > lit(cutoff))
        extractedEntryIds = Some(filtered.select("EntryId"))
        chunks(filtered, "EntryId")
      },
      ResourceWriteProperties(writeMode = "merge", mergeOn = Seq("entry_id")),
      watermarkColumn = Some("last_changed_date")),
    Resource("more_entry_columns",
      _ => {
        // S6: no cursor on the child table; select rows of entries touched
        // this run via a left-semi join
        val ids = extractedEntryIds.getOrElse(
          spark.emptyDataFrame.select(lit(0L).as("EntryId")).limit(0))
        val filtered = src("MoreEntryColumns")
          .join(ids, Seq("EntryId"), "left_semi")
        chunks(filtered, "EntryId")
      },
      ResourceWriteProperties(writeMode = "merge",
        mergeOn = Seq("entry_id", "additional_column_id"))))

  private def wmLong(w: Watermark): Long = w.value match {
    case graft.runner.WatermarkValue.I(v) => v
    case other => throw new IllegalStateException(s"expected int watermark, got $other")
  }
  private def wmTimestamp(w: Watermark): java.sql.Timestamp = w.value match {
    case graft.runner.WatermarkValue.T(v) => java.sql.Timestamp.valueOf(v)
    case other => throw new IllegalStateException(s"expected ts watermark, got $other")
  }

  /** Run the whole job FIFO through the ingest runner. */
  def run(catalog: graft.tables.LakeCatalog, warehouse: String,
          namespace: String): Map[String, Long] =
    IngestRunner.runIngest(spark, catalog, warehouse, namespace, resources)
}
