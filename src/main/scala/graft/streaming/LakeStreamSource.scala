package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftShims, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => SourceOffset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.tables.LakeTable

/** Lake tables as a Structured Streaming SOURCE — the complement of the
  * streaming ingest path (T1/CDC write INTO tables; this reads appends
  * OUT of them), Delta's `readStream.table` economics over our manifest
  * layer:
  *
  * {{{
  * spark.readStream
  *   .format(classOf[LakeStreamProvider].getName)
  *   .option("path", "/warehouse/ns/events")
  *   .load()
  * }}}
  *
  * Offsets are snapshot ids — the commit log IS the stream. Each
  * micro-batch reads exactly the manifest entries added between two
  * snapshots (a set difference of file lists, no directory listing, no
  * per-file modification-time heuristics), served through the same
  * manifest-backed relation as batch reads. A snapshot produced by a
  * non-append operation (merge/delete/update/replace/compact) makes the
  * file diff not mean "new rows", so the stream fails with a clear error
  * unless `ignoreChanges=true` (Delta's contract: rewritten files may
  * then re-emit their surviving rows).
  *
  * At 100 TB the per-batch planning cost is O(files in the two
  * manifests) on the driver, and executors read only the appended files.
  */
final class LakeStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "lake-stream"

  private def location(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "lake-stream requires .option(\"path\", <table location>)"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val loc = location(parameters)
    (shortName(), LakeTable.load(ctx.sparkSession, loc).metadata.schema)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new LakeStreamSource(ctx.sparkSession, location(parameters),
      ignoreChanges = parameters.get("ignoreChanges").exists(_.toBoolean))
}

final class LakeStreamSource(spark: SparkSession, location: String,
                             ignoreChanges: Boolean) extends Source {

  private val table = LakeTable.load(spark, location)
  // the stream's schema is fixed at start (add-only evolution keeps these
  // columns readable from every later snapshot)
  override val schema: StructType = table.metadata.schema

  override def getOffset: Option[SourceOffset] = {
    val id = table.metadata.currentSnapshotId
    if (id < 0) None else Some(LongOffset(id))
  }

  private def snapId(o: SourceOffset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getBatch(start: Option[SourceOffset], end: SourceOffset): DataFrame = {
    val meta = table.metadata
    val endId = snapId(end)
    val endSnap = meta.snapshots.find(_.id == endId).getOrElse(
      throw new IllegalStateException(
        s"Snapshot $endId expired from '$location' while the stream " +
          s"needed it (retained: ${meta.snapshots.map(_.id).mkString(", ")})"))
    val startFiles = start.map(snapId) match {
      case None => Set.empty[String]
      case Some(sid) =>
        if (!ignoreChanges) {
          val nonAppend = meta.snapshots
            .filter(s => s.id > sid && s.id <= endId && s.operation != "append")
          if (nonAppend.nonEmpty) throw new IllegalStateException(
            s"Table '$location' had non-append commits " +
              s"(${nonAppend.map(s => s"${s.id}:${s.operation}").mkString(", ")}); " +
              "a file diff no longer means new rows. Restart from scratch " +
              "or set ignoreChanges=true to accept re-emitted rows.")
        }
        meta.snapshots.find(_.id == sid).map(_.files.map(_.path).toSet)
          .getOrElse(throw new IllegalStateException(
            s"Start snapshot $sid expired from '$location'"))
    }
    val newFiles = endSnap.files.filterNot(f => startFiles.contains(f.path))
    if (newFiles.isEmpty) return GraftShims.emptyStreamingDf(spark, schema)
    // snapshot-time schema keeps the batch well-typed even if the table
    // evolved concurrently; the stream projects its fixed columns
    val snapMeta = meta.copy(
      schema = endSnap.schema.getOrElse(meta.schema),
      currentSnapshotId = endId)
    GraftShims.streamingDfFromRelation(spark,
        table.baseRelation(snapMeta, newFiles))
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*)
  }

  override def stop(): Unit = ()

  override def toString: String = s"LakeStreamSource[$location]"
}
