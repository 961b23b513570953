package graft.tables

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Warehouse -> namespace -> table directory catalog, mirroring the
  * reference's Lakekeeper/warehouse layout (`docs-devel/data-architecture/
  * catalogs.md`; namespace creation on demand `iceberg/io.py:35-39`;
  * landing-warehouse naming `pipeline_types.py:55-61`).
  */
final class LakeCatalog(val root: String) {

  def warehousePath(warehouse: String): Path = Paths.get(root, warehouse)
  def namespacePath(warehouse: String, namespace: String): Path =
    warehousePath(warehouse).resolve(namespace)
  def tableLocation(warehouse: String, namespace: String, table: String): String =
    namespacePath(warehouse, namespace).resolve(table).toString

  /** `{warehouse}_landing` convention (`pipeline_types.py:55-57`). */
  def landingWarehouse(warehouse: String): String = s"${warehouse}_landing"

  /** `{domain}_{name}` namespace convention (`pipeline_types.py:59-61`). */
  def namespaceName(domain: String, pipeline: String): String = s"${domain}_$pipeline"

  def ensureNamespace(warehouse: String, namespace: String): Unit =
    Files.createDirectories(namespacePath(warehouse, namespace))

  def namespaceExists(warehouse: String, namespace: String): Boolean =
    Files.isDirectory(namespacePath(warehouse, namespace))

  def listTables(warehouse: String, namespace: String): Seq[String] = {
    val p = namespacePath(warehouse, namespace)
    if (!Files.isDirectory(p)) Nil
    else {
      val s = Files.list(p)
      try s.iterator().asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).toList.sorted
      finally s.close()
    }
  }

  def tableExists(warehouse: String, namespace: String, table: String): Boolean =
    LakeTable.exists(tableLocation(warehouse, namespace, table))

  def loadTable(spark: SparkSession, warehouse: String, namespace: String,
                table: String): LakeTable =
    LakeTable.load(spark, tableLocation(warehouse, namespace, table))

  def ensureTable(spark: SparkSession, warehouse: String, namespace: String,
                  table: String, schema: StructType,
                  partitionSpec: Seq[PartitionField] = Nil,
                  sortOrder: Seq[SortField] = Nil): LakeTable = {
    ensureNamespace(warehouse, namespace)
    LakeTable.ensure(spark, tableLocation(warehouse, namespace, table),
      schema, partitionSpec, sortOrder)
  }

  /** Purge all tables then drop the namespace
    * (`dlt_destinations/pyiceberg/pyiceberg.py:101-111`). */
  def dropNamespace(warehouse: String, namespace: String): Unit = {
    val p = namespacePath(warehouse, namespace)
    if (Files.exists(p)) deleteRecursively(p)
  }

  private def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.deleteIfExists(_))
    finally s.close()
  }
}
