package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg-style partition transforms over plain Parquet directories.
  *
  * Transform spec strings are parsed exactly like the reference
  * (`elt-common/src/elt_common/iceberg/partition.py:11-33`):
  * `identity`, `year`, `month`, `day`, `hour`, `bucket[n]`, `truncate[n]`.
  * Partition field naming follows the reference's `{col}_{transform}`
  * convention (`dlt_destinations/pyiceberg/helpers.py:286-288`).
  *
  * Partition VALUES only need self-consistency (our reader prunes on our own
  * writer's directories), so human-readable encodings are used: year as
  * yyyy, month as yyyymm, day/hour as formatted strings, bucket as
  * pmod(xxhash64, n).
  */
sealed trait PartitionTransform {
  def name: String
  def fieldName(column: String): String = s"${column}_$name"
  def apply(c: Column, dataType: DataType): Column
}

object PartitionTransform {
  case object Identity extends PartitionTransform {
    val name = "identity"
    override def fieldName(column: String): String = column
    def apply(c: Column, dt: DataType): Column = c
  }
  case object Year extends PartitionTransform {
    val name = "year"
    def apply(c: Column, dt: DataType): Column = year(c)
  }
  case object Month extends PartitionTransform {
    val name = "month"
    def apply(c: Column, dt: DataType): Column = year(c) * 100 + month(c)
  }
  case object Day extends PartitionTransform {
    val name = "day"
    def apply(c: Column, dt: DataType): Column = date_format(c, "yyyy-MM-dd")
  }
  case object Hour extends PartitionTransform {
    val name = "hour"
    def apply(c: Column, dt: DataType): Column = date_format(c, "yyyy-MM-dd-HH")
  }
  final case class Bucket(n: Int) extends PartitionTransform {
    val name = "bucket"
    def apply(c: Column, dt: DataType): Column = pmod(xxhash64(c), lit(n)).cast("int")
  }
  final case class Truncate(w: Int) extends PartitionTransform {
    val name = "truncate"
    def apply(c: Column, dt: DataType): Column = dt match {
      case _: StringType => substring(c, 1, w)
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
        c - pmod(c, lit(w))
      case other => throw new IllegalArgumentException(
        s"truncate[$w] unsupported for type $other")
    }
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** Parse a transform spec string; mirrors partition.py's accepted forms. */
  def parse(spec: String): PartitionTransform = spec.trim match {
    case "identity" => Identity
    case "year" => Year
    case "month" => Month
    case "day" => Day
    case "hour" => Hour
    case BucketRe(n) => Bucket(n.toInt)
    case TruncateRe(w) => Truncate(w.toInt)
    case other => throw new IllegalArgumentException(s"Unknown partition transform: '$other'")
  }

  /** Serialize back to the spec string form. */
  def format(t: PartitionTransform): String = t match {
    case Bucket(n) => s"bucket[$n]"
    case Truncate(w) => s"truncate[$w]"
    case other => other.name
  }
}
