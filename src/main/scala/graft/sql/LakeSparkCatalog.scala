package graft.sql

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.tables.{LakeTable, PartitionField}

/** Spark `TableCatalog` over the lake warehouse directory tree — registers
  * the warehouse the way the reference registers its Iceberg warehouses
  * with a REST catalog (Lakekeeper,
  * `docs-devel/data-architecture/catalogs.md`), making every lake table
  * SQL-addressable:
  *
  * {{{
  * spark.sql.catalog.lake      = graft.sql.LakeSparkCatalog
  * spark.sql.catalog.lake.root = /path/to/warehouses
  *
  * SELECT * FROM lake.facility_ops.accelerator_opralog.cycles
  * SELECT * FROM lake.ns.t VERSION AS OF 3        -- snapshot time travel
  * INSERT INTO lake.ns.t SELECT ...               -- transactional append
  * INSERT OVERWRITE lake.ns.t SELECT ...          -- transactional replace
  * CREATE TABLE lake.ns.t (...) PARTITIONED BY (years(ts))
  * }}}
  *
  * Namespaces are directory paths under the root (arbitrary depth — the
  * reference's `{warehouse}/{domain}_{pipeline}` layout maps to a
  * two-level namespace). Tables are directories holding a `metadata/`
  * commit log.
  */
class LakeSparkCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"Catalog '$name' requires spark.sql.catalog.$name.root"))
  }

  override def name(): String = catalogName

  private def tablePath(ident: Identifier): String =
    (root +: ident.namespace.toSeq :+ ident.name).mkString("/")

  private def nsPath(namespace: Array[String]) =
    Paths.get((root +: namespace.toSeq).mkString("/"))

  // ---- tables ---------------------------------------------------------

  override def loadTable(ident: Identifier): Table = {
    val loc = tablePath(ident)
    if (!LakeTable.exists(loc)) throw new NoSuchTableException(ident)
    val meta = LakeTable.load(SparkSession.active, loc).metadata
    new LakeSqlTable(ident.toString, loc, meta)
  }

  /** `VERSION AS OF <snapshotId>`: pin a retained snapshot — its file list
    * AND its schema (same semantics as `LakeTable.readAt`). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val loc = tablePath(ident)
    if (!LakeTable.exists(loc)) throw new NoSuchTableException(ident)
    val meta = LakeTable.load(SparkSession.active, loc).metadata
    val snapId = try version.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"Lake table version must be a snapshot id, got '$version'")
    }
    val snap = meta.snapshots.find(_.id == snapId).getOrElse(
      throw new IllegalArgumentException(
        s"Snapshot $snapId not found (retained: ${meta.snapshots.map(_.id).mkString(", ")})"))
    val pinned = meta.copy(schema = snap.schema.getOrElse(meta.schema),
      currentSnapshotId = snap.id)
    new LakeSqlTable(ident.toString, loc, pinned)
  }

  /** `TIMESTAMP AS OF`: newest retained snapshot at or before the given
    * time (micros since epoch, per the DSv2 contract). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val loc = tablePath(ident)
    if (!LakeTable.exists(loc)) throw new NoSuchTableException(ident)
    val meta = LakeTable.load(SparkSession.active, loc).metadata
    val snap = meta.snapshots.filter(_.timestampMs * 1000L <= timestampMicros)
      .sortBy(_.id).lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"No retained snapshot at or before timestamp $timestampMicros"))
    val pinned = meta.copy(schema = snap.schema.getOrElse(meta.schema),
      currentSnapshotId = snap.id)
    new LakeSqlTable(ident.toString, loc, pinned)
  }

  override def tableExists(ident: Identifier): Boolean =
    LakeTable.exists(tablePath(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!Files.isDirectory(p)) throw new NoSuchNamespaceException(namespace)
    val s = Files.list(p)
    try s.iterator().asScala
      .filter(d => LakeTable.exists(d.toString))
      .map(d => Identifier.of(namespace, d.getFileName.toString))
      .toArray.sortBy(_.name)
    finally s.close()
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val spec = partitions.map(toPartitionField).toSeq
    val props = properties.asScala.toMap -
      (TableCatalog.PROP_OWNER, TableCatalog.PROP_LOCATION,
        TableCatalog.PROP_PROVIDER, TableCatalog.PROP_COMMENT,
        TableCatalog.PROP_EXTERNAL)
    LakeTable.ensure(SparkSession.active, tablePath(ident), schema,
      partitionSpec = spec, properties = props)
    loadTable(ident)
  }

  private def toPartitionField(t: Transform): PartitionField = {
    def ref = t.references().head.fieldNames().mkString(".")
    def intArg = t.arguments().collectFirst {
      case l: V2Literal[_] => l.value().toString.toInt
    }.getOrElse(throw new UnsupportedOperationException(
      s"Transform ${t.describe()} needs an integer argument"))
    t.name() match {
      case "identity" => PartitionField(ref, "identity")
      case "year" | "years" => PartitionField(ref, "year")
      case "month" | "months" => PartitionField(ref, "month")
      case "day" | "days" => PartitionField(ref, "day")
      case "hour" | "hours" => PartitionField(ref, "hour")
      case "bucket" => PartitionField(ref, s"bucket[$intArg]")
      case "truncate" => PartitionField(ref, s"truncate[$intArg]")
      case other => throw new UnsupportedOperationException(
        s"Unsupported partition transform: $other")
    }
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val loc = tablePath(ident)
    if (!LakeTable.exists(loc)) throw new NoSuchTableException(ident)
    val t = LakeTable.load(SparkSession.active, loc)
    val setProps = changes.collect {
      case s: TableChange.SetProperty => s.property -> s.value
    }
    val addCols = changes.collect {
      case a: TableChange.AddColumn =>
        if (a.fieldNames.length != 1) throw new UnsupportedOperationException(
          s"Nested ADD COLUMN not supported: ${a.fieldNames.mkString(".")}")
        if (a.position != null) throw new UnsupportedOperationException(
          "ADD COLUMN FIRST/AFTER not supported (columns append)")
        StructType(Seq.empty).add(a.fieldNames.head, a.dataType, a.isNullable).head
    }
    val dropCols = changes.collect {
      case d: TableChange.DeleteColumn =>
        if (d.fieldNames.length != 1) throw new UnsupportedOperationException(
          s"Nested DROP COLUMN not supported: ${d.fieldNames.mkString(".")}")
        d.fieldNames.head
    }
    val renames = changes.collect {
      case r: TableChange.RenameColumn =>
        if (r.fieldNames.length != 1) throw new UnsupportedOperationException(
          s"Nested RENAME COLUMN not supported: ${r.fieldNames.mkString(".")}")
        r.fieldNames.head -> r.newName
    }
    val handled = setProps.size + addCols.size + dropCols.size + renames.size
    if (handled != changes.size)
      throw new UnsupportedOperationException(
        "Supported ALTER TABLE changes: SET TBLPROPERTIES, ADD COLUMNS, " +
          "DROP COLUMN, RENAME COLUMN (via scan-time name-mapping; " +
          "type changes are not supported)")
    if (addCols.nonEmpty) t.addColumns(addCols)
    if (dropCols.nonEmpty) t.dropColumns(dropCols)
    renames.foreach { case (o, n) => t.renameColumn(o, n) }
    if (setProps.nonEmpty) t.writeProperties(setProps.toMap)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val loc = Paths.get(tablePath(ident))
    if (!LakeTable.exists(loc.toString)) return false
    LakeTable.deleteRecursively(loc)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(nsPath(newIdent.namespace))
    Files.move(Paths.get(tablePath(oldIdent)), Paths.get(tablePath(newIdent)))
  }

  // ---- procedures (CALL lake.system.<proc>) ---------------------------

  override def loadProcedure(ident: Identifier):
      org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (!ident.namespace.sameElements(LakeProcedures.Namespace))
      throw new UnsupportedOperationException(
        s"Procedures live under the 'system' namespace: " +
          s"CALL $catalogName.system.${ident.name}(...)")
    LakeProcedures.load(root, ident.name).getOrElse(
      throw new UnsupportedOperationException(
        s"Unknown procedure '${ident.name}'. Available: " +
          LakeProcedures.names.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(LakeProcedures.Namespace))
      LakeProcedures.names.map(n =>
        Identifier.of(LakeProcedures.Namespace, n)).toArray
    else Array.empty

  // ---- namespaces -----------------------------------------------------

  override def namespaceExists(namespace: Array[String]): Boolean =
    Files.isDirectory(nsPath(namespace))

  override def listNamespaces(): Array[Array[String]] = listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val p = nsPath(namespace)
    if (!Files.isDirectory(p)) throw new NoSuchNamespaceException(namespace)
    val s = Files.list(p)
    // a directory is a namespace (not a table) if it has no commit log
    try s.iterator().asScala
      .filter(d => Files.isDirectory(d) && !LakeTable.exists(d.toString))
      .map(d => namespace :+ d.getFileName.toString)
      .toArray.sortBy(_.mkString("."))
    finally s.close()
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: JMap[String, String]): Unit = {
    Files.createDirectories(nsPath(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("Namespace properties not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!Files.isDirectory(p)) return false
    if (!cascade) {
      val s = Files.list(p)
      val nonEmpty = try s.iterator().hasNext finally s.close()
      if (nonEmpty) throw new IllegalStateException(
        s"Namespace ${namespace.mkString(".")} is not empty")
    }
    LakeTable.deleteRecursively(p)
    true
  }
}
