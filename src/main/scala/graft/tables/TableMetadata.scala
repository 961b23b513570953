package graft.tables

import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Column bounds for one data file: canonical-string min/max (see
  * [[FileStats]]), the file's null count for the column, and the file row
  * count (so an all-null column is distinguishable from missing stats).
  * min/max both None with nullCount == valueCount means all-null; both None
  * with nullCount < valueCount means the bounds were unencodable. */
final case class ColumnStats(
    min: Option[String],
    max: Option[String],
    nullCount: Long,
    valueCount: Long)

/** One data file of a snapshot: path relative to the table location, row
  * count, byte size (Iceberg's `file_size_in_bytes` — scan planning needs
  * real lengths), Hive-style partition values parsed from its directory
  * names (None = null partition value), and per-column bounds — the
  * manifest entry that lets merges and scans touch only files that can
  * contain matching keys (Iceberg manifests' role for PyIceberg's upsert
  * and `row_filter` scans). Files from pre-stats metadata parse with
  * rowCount/sizeBytes -1 and empty stats: never prunable, always
  * readable (size is stat'ed at scan planning when absent). */
final case class DataFile(
    path: String,
    rowCount: Long = -1L,
    partitionValues: Map[String, Option[String]] = Map.empty,
    stats: Map[String, ColumnStats] = Map.empty,
    sizeBytes: Long = -1L)

/** One committed snapshot: an operation plus the complete list of data files
  * (relative to the table location) that make up the table AFTER this
  * snapshot, and the table schema AT this snapshot (so time travel reads a
  * snapshot with its own schema, like Iceberg's schema-id per snapshot).
  * Complete-file-list snapshots make every commit a simple atomic
  * metadata swap and give time travel / expiry / orphan GC for free.
  * Mirrors the role of Iceberg snapshots used by the reference
  * (pyiceberg transactions in `elt-common/src/elt_common/iceberg/io.py:92-113`). */
final case class Snapshot(
    id: Long,
    timestampMs: Long,
    operation: String, // append | replace | merge | compact
    files: Seq[DataFile],
    schemaJson: Option[String] = None) {
  def paths: Seq[String] = files.map(_.path)
  def schema: Option[StructType] =
    schemaJson.map(DataType.fromJson(_).asInstanceOf[StructType])
}

final case class PartitionField(column: String, transform: String) {
  def parsed: PartitionTransform = PartitionTransform.parse(transform)
  def fieldName: String = parsed.fieldName(column)
}

final case class SortField(column: String, ascending: Boolean)

/** Table metadata: schema, partition spec, sort order (write-layout only,
  * like the reference's `helpers.py:251-256`), identifier (primary-key)
  * fields persisted on the table like Iceberg's `identifier_field_ids`
  * (reference stores merge keys at create time, `helpers.py:184-187`, and
  * reads them back to drive upserts, `pyiceberg.py:358-361`), free-form
  * properties (used for ingestion watermarks, `runner.py:24-25`), and the
  * snapshot log. */
final case class TableMetadata(
    formatVersion: Int,
    schema: StructType,
    partitionSpec: Seq[PartitionField],
    sortOrder: Seq[SortField],
    properties: Map[String, String],
    snapshots: Seq[Snapshot],
    currentSnapshotId: Long,
    identifierFields: Seq[String] = Nil) {

  def currentSnapshot: Option[Snapshot] = snapshots.find(_.id == currentSnapshotId)

  /** RENAME COLUMN name-mapping (current name -> the physical names older
    * data files carry), parsed from the `schema.name-mapping.default`
    * property — Iceberg's answer to renames over formats without field
    * ids, stored the way Iceberg stores it (a table property applied at
    * scan time). Only mappings whose current name exists in this
    * metadata's schema apply (a time-travel read at a pre-rename snapshot
    * sees the old name as a REAL column and must not alias it).
    *
    * Time travel to a MID-CHAIN snapshot (RENAME a->b, INSERT, RENAME
    * b->c, then read the middle snapshot whose schema has 'b') resolves
    * through the chain: the stored olds list is ordered oldest-first
    * (renameColumn appends), so a snapshot-schema name found INSIDE a
    * chain aliases to exactly the olds that precede it — files written
    * under the names that came AFTER it don't exist in that snapshot. */
  def columnAliases: Map[String, Seq[String]] = {
    val all = TableMetadata.parseNameMapping(properties)
    val present = schema.fieldNames.map(_.toLowerCase).toSet
    val direct = all.filter { case (cur, _) => present.contains(cur.toLowerCase) }
    val chained = for {
      (cur, olds) <- all.toSeq
      if !present.contains(cur.toLowerCase)
      i <- olds.indices
      if i > 0 && present.contains(olds(i).toLowerCase)
    } yield olds(i) -> olds.take(i)
    direct ++ chained.toMap
  }

  def toJson: String = {
    def fileJson(f: DataFile): JValue =
      JObject(List(
        "path" -> JString(f.path),
        "rowCount" -> JInt(f.rowCount)) ++
        (if (f.sizeBytes < 0) Nil else List("sizeBytes" -> JInt(f.sizeBytes))) ++
        (if (f.partitionValues.isEmpty) Nil
         else List("partitionValues" -> JObject(f.partitionValues.toList.sortBy(_._1)
           .map { case (k, v) => k -> v.map(JString(_)).getOrElse(JNull) }))) ++
        (if (f.stats.isEmpty) Nil
         else List("stats" -> JObject(f.stats.toList.sortBy(_._1).map { case (c, s) =>
           c -> JObject(List(
             "nullCount" -> JInt(s.nullCount),
             "valueCount" -> JInt(s.valueCount)) ++
             s.min.map(m => "min" -> JString(m)).toList ++
             s.max.map(m => "max" -> JString(m)).toList)
         }))))
    // Format v2: snapshots share one deduplicated file registry and
    // reference entries by index. Complete-file-list snapshots otherwise
    // re-inline every carried file per retained snapshot — O(snapshots x
    // files) metadata where the table itself is O(files); at 100 TB with
    // a 7-day retention that amplification is the difference between a
    // manifest and a runaway JSON (Iceberg's shared manifest files solve
    // the same problem the same way).
    val registry = snapshots.flatMap(_.files).distinct
    val indexOf: Map[DataFile, Int] = registry.zipWithIndex.toMap
    val j = JObject(
      "formatVersion" -> JInt(2),
      "schema" -> JsonMethods.parse(schema.json),
      "partitionSpec" -> JArray(partitionSpec.toList.map(p =>
        JObject("column" -> JString(p.column), "transform" -> JString(p.transform)))),
      "sortOrder" -> JArray(sortOrder.toList.map(s =>
        JObject("column" -> JString(s.column), "ascending" -> JBool(s.ascending)))),
      "identifierFields" -> JArray(identifierFields.toList.map(JString(_))),
      "properties" -> JObject(properties.toList.map { case (k, v) => k -> JString(v) }),
      "fileRegistry" -> JArray(registry.toList.map(fileJson)),
      "snapshots" -> JArray(snapshots.toList.map(s => JObject(List(
        "id" -> JInt(s.id),
        "timestampMs" -> JInt(s.timestampMs),
        "operation" -> JString(s.operation),
        "files" -> JArray(s.files.toList.map(f => JInt(indexOf(f))))) ++
        s.schemaJson.map(sj => "schema" -> JsonMethods.parse(sj)).toList))),
      "currentSnapshotId" -> JInt(currentSnapshotId))
    JsonMethods.pretty(JsonMethods.render(j))
  }
}

object TableMetadata {
  /** The Iceberg-published property key for scan-time column name
    * mapping. Value: a JSON object `{"current": ["old1", "old2"], ...}`
    * (ours is name-keyed — plain parquet has no field ids to key by). */
  val NameMappingProp = "schema.name-mapping.default"

  /** Names permanently unavailable for reuse: a DROPPED column (and any
    * physical aliases it carried) lives on inside old data files — a later
    * ADD COLUMNS or RENAME ... TO that name would silently resurrect the
    * dropped bytes into an unrelated column. Stored as a JSON array of
    * lowercase names. */
  val RetiredNamesProp = "schema.retired-names"

  def parseRetiredNames(properties: Map[String, String]): Set[String] =
    properties.get(RetiredNamesProp) match {
      case None => Set.empty
      case Some(json) =>
        JsonMethods.parse(json) match {
          case JArray(items) => items.collect { case JString(s) => s.toLowerCase }.toSet
          case _ => Set.empty
        }
    }

  def renderRetiredNames(names: Set[String]): String =
    JsonMethods.compact(JsonMethods.render(
      JArray(names.map(_.toLowerCase).toList.sorted.map(JString(_)))))

  def parseNameMapping(properties: Map[String, String]): Map[String, Seq[String]] =
    properties.get(NameMappingProp) match {
      case None => Map.empty
      case Some(json) =>
        JsonMethods.parse(json) match {
          case JObject(fields) => fields.map {
            case (cur, JArray(olds)) =>
              cur -> olds.collect { case JString(s) => s }
            case (cur, _) => cur -> Nil
          }.toMap
          case _ => Map.empty
        }
    }

  def renderNameMapping(m: Map[String, Seq[String]]): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      m.toList.sortBy(_._1).map { case (cur, olds) =>
        cur -> JArray(olds.toList.map(JString(_))) })))

  def empty(schema: StructType,
            partitionSpec: Seq[PartitionField] = Nil,
            sortOrder: Seq[SortField] = Nil,
            properties: Map[String, String] = Map.empty,
            identifierFields: Seq[String] = Nil): TableMetadata =
    TableMetadata(1, schema, partitionSpec, sortOrder, properties, Nil, -1L,
      identifierFields)

  def fromJson(json: String): TableMetadata = {
    val j = JsonMethods.parse(json)
    def str(v: JValue): String = v match { case JString(s) => s; case other => other.values.toString }
    def long(v: JValue): Long = v match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case other => other.values.toString.toLong
    }
    val schema = DataType.fromJson(JsonMethods.compact(JsonMethods.render(j \ "schema")))
      .asInstanceOf[StructType]
    val spec = (j \ "partitionSpec") match {
      case JArray(items) => items.map(i => PartitionField(str(i \ "column"), str(i \ "transform")))
      case _ => Nil
    }
    val sort = (j \ "sortOrder") match {
      case JArray(items) => items.map(i => SortField(str(i \ "column"),
        (i \ "ascending").asInstanceOf[JBool].value))
      case _ => Nil
    }
    val props = (j \ "properties") match {
      case JObject(fields) => fields.map { case (k, v) => k -> str(v) }.toMap
      case _ => Map.empty[String, String]
    }
    def dataFile(v: JValue): DataFile = v match {
      case JString(path) => DataFile(path) // pre-stats metadata: path only
      case obj =>
        val pvs = (obj \ "partitionValues") match {
          case JObject(fields) => fields.map { case (k, pv) =>
            k -> (pv match { case JNull => None; case s => Some(str(s)) })
          }.toMap
          case _ => Map.empty[String, Option[String]]
        }
        val stats = (obj \ "stats") match {
          case JObject(fields) => fields.map { case (c, s) =>
            c -> ColumnStats(
              (s \ "min") match { case JString(m) => Some(m); case _ => None },
              (s \ "max") match { case JString(m) => Some(m); case _ => None },
              long(s \ "nullCount"), long(s \ "valueCount"))
          }.toMap
          case _ => Map.empty[String, ColumnStats]
        }
        val size = (obj \ "sizeBytes") match {
          case JNothing | JNull => -1L
          case v => long(v)
        }
        DataFile(str(obj \ "path"), long(obj \ "rowCount"), pvs, stats, size)
    }
    // v2 registry: snapshot file entries are indices into it; v1 inlined
    // full objects (or bare path strings in the earliest format) — all
    // three shapes parse, so any on-disk table keeps loading
    val registry: IndexedSeq[DataFile] = (j \ "fileRegistry") match {
      case JArray(items) => items.map(dataFile).toIndexedSeq
      case _ => IndexedSeq.empty
    }
    def fileRef(v: JValue): DataFile = v match {
      case JInt(idx) => registry(idx.toInt)
      case JLong(idx) => registry(idx.toInt)
      case other => dataFile(other)
    }
    val snaps = (j \ "snapshots") match {
      case JArray(items) => items.map { i =>
        Snapshot(
          long(i \ "id"),
          long(i \ "timestampMs"),
          str(i \ "operation"),
          (i \ "files") match {
            case JArray(fs) => fs.map(fileRef)
            case _ => Nil
          },
          (i \ "schema") match {
            case JNothing | JNull => None
            case s => Some(JsonMethods.compact(JsonMethods.render(s)))
          })
      }
      case _ => Nil
    }
    val idFields = (j \ "identifierFields") match {
      case JArray(items) => items.map(str) // absent in pre-round-3 metadata
      case _ => Nil
    }
    TableMetadata(
      (j \ "formatVersion").asInstanceOf[JInt].num.toInt,
      schema, spec, sort, props, snaps,
      long(j \ "currentSnapshotId"),
      idFields)
  }
}
