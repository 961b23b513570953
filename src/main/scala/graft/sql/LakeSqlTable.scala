package graft.sql

import java.util.{Collections, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.tables.{LakeFileIndex, LakeTable, PartitionTransform, TableMetadata}

/** DataSourceV2 `Table` over a [[graft.tables.LakeTable]] — the SQL face of
  * the lake format. The reference's whole consumption surface is SQL over
  * the Iceberg catalog (dbt models compile to Trino SQL,
  * `warehouses/facility_ops/transform/profiles.yml:1-16`; ad-hoc users
  * attach DuckDB, `infra/scripts/duckdb-attach-lakehouses.sh`); this class
  * plus [[LakeSparkCatalog]] gives our tables the same addressability:
  * `SELECT ... FROM lake.ns.table`.
  *
  * Reads do NOT go through a v2 scan: [[LakeRelationRule]] (installed by
  * `GraftSparkSessionExtensions`) replaces the relation with a
  * `HadoopFsRelation` over the manifest-backed [[LakeFileIndex]], so SQL
  * reads share the exact scan path — metadata partition pruning +
  * manifest-bounds file skipping in one scan node — as programmatic
  * `LakeTable.read()`. Writes use the public V1 write fallback
  * (`V1_BATCH_WRITE` -> [[InsertableRelation]]) routed through the
  * transactional commit protocol: INSERT INTO appends, INSERT OVERWRITE
  * replaces, both land as real snapshots.
  *
  * The snapshot (schema + file list) is pinned at load time, so one SQL
  * statement sees one consistent table version; `VERSION AS OF` pins a
  * historical snapshot the same way.
  */
final class LakeSqlTable(
    val identName: String,
    val location: String,
    val meta: TableMetadata) extends Table with SupportsRead with SupportsWrite {

  override def name(): String = identName

  /** The DATA schema only — derived transform columns (`ts_year`, …) are
    * partition metadata, not table columns (Iceberg semantics): they must
    * not be INSERT targets. Identity partition columns ARE data columns
    * and stay in schema position. [[LakeRelationRule]] re-maps read
    * attributes onto the relation's data+partition layout by name. File
    * skipping on the transform's SOURCE column (via manifest bounds)
    * covers partition pruning for SQL filters. */
  override lazy val schema: StructType =
    StructType(meta.schema.fields.map(_.copy(nullable = true)))

  override def partitioning(): Array[Transform] =
    meta.partitionSpec.map { p =>
      p.parsed match {
        case PartitionTransform.Identity => Expressions.identity(p.column)
        case PartitionTransform.Year => Expressions.years(p.column)
        case PartitionTransform.Month => Expressions.months(p.column)
        case PartitionTransform.Day => Expressions.days(p.column)
        case PartitionTransform.Hour => Expressions.hours(p.column)
        case PartitionTransform.Bucket(n) => Expressions.bucket(n, p.column)
        case PartitionTransform.Truncate(w) =>
          Expressions.apply("truncate", Expressions.column(p.column), Expressions.literal(w))
      }
    }.toArray

  override def properties(): java.util.Map[String, String] =
    meta.properties.asJava

  override def capabilities(): JSet[TableCapability] =
    Collections.unmodifiableSet(java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER))

  /** Never reached when the extensions are installed — [[LakeRelationRule]]
    * converts the relation before scan planning. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    throw new IllegalStateException(
      "Reading lake tables via SQL requires " +
        "spark.sql.extensions=graft.expressions.GraftSparkSessionExtensions")

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                                ovr: Boolean): Unit = {
              val t = LakeTable.load(SparkSession.active, location)
              t.write(data, if (overwrite || ovr) "replace" else "append")
            }
          }
      }
    }
}
