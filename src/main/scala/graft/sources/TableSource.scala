package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.runner.{IngestRunner, Resource, ResourceWriteProperties, Watermark}

/** Generic chunked table source (S1/S2/S3,
  * `elt-common/src/elt_common/sources/sqldatabase/__init__.py:163-195`):
  * a `SELECT *` scan streamed in `chunkSize`-row chunks with an optional
  * `rowLimit`, a strictly-greater watermark predicate pushed into the scan
  * (S2, `:178-181`), an arbitrary query-adapter rewrite hook (S3,
  * `:169,183-184`), and per-table destination renaming. Backed by parquet
  * fixtures here; the same shape maps onto `spark.read.jdbc` with
  * `fetchsize`/partitioned reads against a real database.
  */
final case class TableSourceConfig(
    table: String,
    destination: Option[String] = None, // destination table renaming
    chunkSize: Int = 5000, // reference default `:32-33`
    rowLimit: Option[Long] = None,
    watermarkColumn: Option[String] = None,
    queryAdapter: DataFrame => DataFrame = identity,
    writeProperties: ResourceWriteProperties = ResourceWriteProperties())

final class TableSource(spark: SparkSession, sourceDir: String) {

  def scan(config: TableSourceConfig): Option[Watermark] => Iterator[DataFrame] = {
    wm =>
      var df = spark.read.parquet(s"$sourceDir/${config.table}.parquet")
      // S2: watermark pushdown — lands in the scan's PushedFilters
      wm.foreach(w => df = IngestRunner.watermarkFilter(df, w))
      // S3: adapter hook (the reference's Select -> Select rewrite)
      df = config.queryAdapter(df)
      // row_limit after adapter, like `query.limit(row_limit)` (`:186`)
      config.rowLimit.foreach(n => df = df.limit(n.toInt))
      chunked(df, config)
  }

  private def chunked(df: DataFrame, config: TableSourceConfig): Iterator[DataFrame] = {
    val orderCol = config.watermarkColumn.getOrElse(df.columns.head)
    Chunker.rangeChunks(df, orderCol, config.chunkSize.toLong)
  }

  def resource(config: TableSourceConfig): Resource =
    Resource(
      name = config.destination.getOrElse(config.table),
      extractor = scan(config),
      writeProperties = config.writeProperties,
      watermarkColumn = config.watermarkColumn)
}
