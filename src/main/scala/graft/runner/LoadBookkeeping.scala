package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.LakeCatalog

/** The dlt system tables (L8,
  * `elt-common/src/elt_common/dlt_destinations/pyiceberg/pyiceberg.py:160-293`):
  * `_dlt_loads` gets one row per completed load (load_id, schema name,
  * status 0, timestamp, schema-version hash); `_dlt_version` records schema
  * history; `_dlt_pipeline_state` carries serialized pipeline state, synced
  * by filter + sort desc + first.
  */
object LoadBookkeeping {
  val LoadsTable = "_dlt_loads"
  val VersionTable = "_dlt_version"
  val StateTable = "_dlt_pipeline_state"

  def completeLoad(spark: SparkSession, catalog: LakeCatalog, warehouse: String,
                   namespace: String, loadId: String, schemaName: String,
                   versionHash: String,
                   nowMs: Long = System.currentTimeMillis()): Unit = {
    import spark.implicits._
    val row = Seq((loadId, schemaName, 0, new java.sql.Timestamp(nowMs), versionHash))
      .toDF("load_id", "schema_name", "status", "inserted_at", "schema_version_hash")
    catalog.ensureTable(spark, warehouse, namespace, LoadsTable, row.schema)
      .write(row, "append")
  }

  def recordSchemaVersion(spark: SparkSession, catalog: LakeCatalog,
                          warehouse: String, namespace: String,
                          schemaName: String, version: Long, versionHash: String,
                          schemaJson: String,
                          nowMs: Long = System.currentTimeMillis()): Unit = {
    import spark.implicits._
    val row = Seq((version, new java.sql.Timestamp(nowMs), schemaName,
      versionHash, schemaJson))
      .toDF("version", "inserted_at", "schema_name", "version_hash", "schema")
    catalog.ensureTable(spark, warehouse, namespace, VersionTable, row.schema)
      .write(row, "append")
  }

  def writeState(spark: SparkSession, catalog: LakeCatalog, warehouse: String,
                 namespace: String, pipelineName: String, version: Long,
                 stateJson: String, loadId: String,
                 nowMs: Long = System.currentTimeMillis()): Unit = {
    import spark.implicits._
    val row = Seq((version, pipelineName, stateJson,
      new java.sql.Timestamp(nowMs), loadId))
      .toDF("version", "pipeline_name", "state", "created_at", "_dlt_load_id")
    catalog.ensureTable(spark, warehouse, namespace, StateTable, row.schema)
      .write(row, "append")
  }

  /** State sync read-back (`pyiceberg.py:221-293`): newest state row for the
    * pipeline whose load completed (semi-join to _dlt_loads), ordered by
    * load id descending — filter + sort desc + limit 1. */
  def readLatestState(spark: SparkSession, catalog: LakeCatalog, warehouse: String,
                      namespace: String, pipelineName: String): Option[String] = {
    if (!catalog.tableExists(warehouse, namespace, StateTable)) return None
    val state = catalog.loadTable(spark, warehouse, namespace, StateTable).read()
    val completed =
      if (catalog.tableExists(warehouse, namespace, LoadsTable))
        catalog.loadTable(spark, warehouse, namespace, LoadsTable).read()
          .where(col("status") === 0).select(col("load_id").as("_dlt_load_id"))
      else return None
    state.where(col("pipeline_name") === pipelineName)
      .join(completed, Seq("_dlt_load_id"), "left_semi")
      .orderBy(col("_dlt_load_id").desc)
      .limit(1)
      .select("state")
      .collect()
      .headOption.map(_.getString(0))
  }

  def lastLoadId(spark: SparkSession, catalog: LakeCatalog, warehouse: String,
                 namespace: String): Option[String] = {
    if (!catalog.tableExists(warehouse, namespace, LoadsTable)) return None
    catalog.loadTable(spark, warehouse, namespace, LoadsTable).read()
      .orderBy(col("load_id").desc).limit(1).select("load_id")
      .collect().headOption.map(_.getString(0))
  }
}
