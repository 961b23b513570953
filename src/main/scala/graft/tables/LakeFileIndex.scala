package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileStatus, Path => HadoopPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Spark `FileIndex` served entirely from a snapshot's manifest — the role
  * Iceberg's metadata layer plays for PyIceberg scans
  * (`dlt_destinations/pyiceberg/pyiceberg.py:230-233`): file listing,
  * partition values, and per-file column bounds all come from table
  * metadata, so
  *
  *  - the whole table is ONE scan node no matter how many commits
  *    accumulated (no per-era directory discovery, no union),
  *  - partition pruning evaluates against metadata partition values
  *    (no filesystem listing on the driver), and
  *  - data filters skip files whose manifest [min,max] bounds cannot
  *    match, before Spark opens (or even stats) them.
  *
  * At 100 TB this is the difference between a metadata operation and a
  * filesystem crawl: planning cost is O(#files in manifest), and pruned
  * files cost nothing at all.
  */
final class LakeFileIndex(
    spark: SparkSession,
    location: String,
    meta: TableMetadata,
    files: Seq[DataFile]) extends FileIndex {

  /** Partition columns (identity + derived), directory-encoded at write. */
  override val partitionSchema: StructType =
    StructType(meta.partitionSpec.map(p =>
      StructField(p.fieldName, LakeFileIndex.partitionType(p, meta.schema),
        nullable = true)))

  /** Columns physically present in the data files: the table schema minus
    * partition fields (those live in directory names only), PLUS the
    * retired physical names from the RENAME name-mapping — files written
    * before a rename carry the old name, so the scan requests both and
    * parquet null-fills whichever a given file lacks; the read projection
    * COALESCEs them back into the current column. */
  val dataSchema: StructType = {
    val partNames = meta.partitionSpec.map(_.fieldName).toSet
    val base = meta.schema.fields.filterNot(f => partNames.contains(f.name))
    val present = base.map(_.name.toLowerCase).toSet
    val aliasFields = meta.columnAliases.toSeq.sortBy(_._1).flatMap {
      case (cur, olds) =>
        base.find(_.name.equalsIgnoreCase(cur)).toSeq.flatMap(f =>
          olds.filterNot(o => present.contains(o.toLowerCase))
            .map(o => StructField(o, f.dataType, nullable = true)))
    }
    StructType(base ++ aliasFields)
  }

  override def rootPaths: Seq[HadoopPath] = Seq(new HadoopPath(location))

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // manifest-bounds file skipping from the pushed-down data filters
    val bounded = files.filter(f =>
      dataFilters.forall(FileStats.mayMatchExpr(_, f, dataSchema)))
    // transform-projection pruning: equality/IN filters on a transform's
    // source column pin the partition value (bucket/truncate/date buckets
    // are invisible to min/max bounds — this is the only skip for them)
    val kept = TransformPruning.prune(bounded,
      TransformPruning.allowedValues(dataFilters, meta,
        spark.sessionState.conf.sessionLocalTimeZone))

    if (partitionSchema.isEmpty)
      return Seq(PartitionDirectory(InternalRow.empty, kept.map(fileStatus).toArray))

    // legacy bare-path manifest entries carry no partitionValues; re-parse
    // them from the Hive-style path so their rows keep real partition
    // values (grouping them under the null partition would both return
    // nulls and let identity-partition filters prune their rows away)
    def valuesOf(f: DataFile): Map[String, Option[String]] =
      if (f.partitionValues.nonEmpty) f.partitionValues
      else LakeTable.partitionValuesOf(f.path)
    val groups = kept.groupBy(f =>
      partitionSchema.fieldNames.toSeq.map(valuesOf(f).getOrElse(_, None)))
    val dirs = groups.toSeq.map { case (vals, fs) => (partitionRow(vals), fs) }
    val pruned =
      if (partitionFilters.isEmpty) dirs
      else {
        // bind by name against the partition schema (the filter expressions
        // reference the relation's partition output attributes)
        val bound = partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldIndex(a.name)
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        }
        val predicate = Predicate.create(bound)
        predicate.initialize(0)
        dirs.filter { case (row, _) => predicate.eval(row) }
      }
    pruned.map { case (row, fs) =>
      PartitionDirectory(row, fs.map(fileStatus).toArray)
    }
  }

  /** Typed partition-value row from the manifest's directory-string values. */
  private def partitionRow(vals: Seq[Option[String]]): InternalRow =
    InternalRow.fromSeq(vals.zipWithIndex.map { case (v, i) =>
      v.map(LakeFileIndex.castPartitionValue(_, partitionSchema(i).dataType,
        spark.sessionState.conf.sessionLocalTimeZone)).orNull
    })

  private def fileStatus(f: DataFile): FileStatus = {
    val p = Paths.get(location, f.path)
    val len = if (f.sizeBytes >= 0) f.sizeBytes
              else try Files.size(p) catch { case _: Exception => 0L }
    new FileStatus(len, false, 1, 0L, 0L, new HadoopPath(p.toUri))
  }

  override def inputFiles: Array[String] =
    files.map(f => s"$location/${f.path}").toArray

  override def refresh(): Unit = ()

  override lazy val sizeInBytes: Long = {
    val sizes = files.map(f =>
      if (f.sizeBytes >= 0) f.sizeBytes
      else try Files.size(Paths.get(location, f.path)) catch { case _: Exception => 0L })
    math.max(1L, sizes.sum)
  }
}

object LakeFileIndex {
  /** Output type of a partition field's transform. */
  def partitionType(p: PartitionField, schema: StructType): DataType =
    p.parsed match {
      case PartitionTransform.Year | PartitionTransform.Month => IntegerType
      case PartitionTransform.Day | PartitionTransform.Hour => StringType
      case PartitionTransform.Bucket(_) => IntegerType
      case PartitionTransform.Truncate(_) => schema(p.column).dataType
      case PartitionTransform.Identity => schema(p.column).dataType
    }

  /** Directory string -> typed Catalyst partition value, via Cast (the same
    * string->type semantics Spark's own partition inference applies). */
  private[tables] def castPartitionValue(raw: String, dt: DataType,
                                         zoneId: String): Any = dt match {
    case _: StringType => UTF8String.fromString(raw)
    case _ => Cast(Literal(UTF8String.fromString(raw), StringType), dt,
      Some(zoneId)).eval(null)
  }
}
