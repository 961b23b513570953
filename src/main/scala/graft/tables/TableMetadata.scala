package graft.tables

import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** One committed snapshot: an operation plus the complete list of data files
  * (relative to the table location) that make up the table AFTER this
  * snapshot. Complete-file-list snapshots make every commit a simple atomic
  * metadata swap and give time travel / expiry / orphan GC for free.
  * Mirrors the role of Iceberg snapshots used by the reference
  * (pyiceberg transactions in `elt-common/src/elt_common/iceberg/io.py:92-113`). */
final case class Snapshot(
    id: Long,
    timestampMs: Long,
    operation: String, // append | replace | merge | compact
    files: Seq[String])

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

  def toJson: String = {
    val j = JObject(
      "formatVersion" -> JInt(formatVersion),
      "schema" -> JsonMethods.parse(schema.json),
      "partitionSpec" -> JArray(partitionSpec.toList.map(p =>
        JObject("column" -> JString(p.column), "transform" -> JString(p.transform)))),
      "sortOrder" -> JArray(sortOrder.toList.map(s =>
        JObject("column" -> JString(s.column), "ascending" -> JBool(s.ascending)))),
      "identifierFields" -> JArray(identifierFields.toList.map(JString(_))),
      "properties" -> JObject(properties.toList.map { case (k, v) => k -> JString(v) }),
      "snapshots" -> JArray(snapshots.toList.map(s => JObject(
        "id" -> JInt(s.id),
        "timestampMs" -> JInt(s.timestampMs),
        "operation" -> JString(s.operation),
        "files" -> JArray(s.files.toList.map(JString(_)))))),
      "currentSnapshotId" -> JInt(currentSnapshotId))
    JsonMethods.pretty(JsonMethods.render(j))
  }
}

object TableMetadata {
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
    val snaps = (j \ "snapshots") match {
      case JArray(items) => items.map { i =>
        Snapshot(
          (i \ "id").asInstanceOf[JInt].num.toLong,
          (i \ "timestampMs").asInstanceOf[JInt].num.toLong,
          str(i \ "operation"),
          (i \ "files") match {
            case JArray(fs) => fs.map(str)
            case _ => Nil
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
      (j \ "currentSnapshotId").asInstanceOf[JInt].num.toLong,
      idFields)
  }
}
