package graft.types

import org.apache.spark.sql.types._

/** External type-tag <-> Spark type mapping (§1.2), the union of the
  * reference's three mapping tables
  * (`elt-common/src/elt_common/iceberg/schema.py:25-85`,
  * `dlt_destinations/pyiceberg/helpers.py:79-163`,
  * `sources/sqldatabase/schema.py:19-74`), with the same rejections:
  *
  *  - nanosecond timestamps raise (`schema.py:50-52`)
  *  - time-of-day has no Spark type -> LongType micros-of-day by convention
  *  - decimal precision > 38 (decimal256) is unrepresentable and raises
  *  - uuid -> canonical string
  *  - list element forced optional (`schema.py:66-73`)
  *  - naive timestamps -> TimestampNTZType, tz-aware -> TimestampType
  */
object TypeMapper {

  private val DecimalRe = """decimal\((\d+),\s*(\d+)\)""".r
  private val ListRe = """list<(.+)>""".r

  def toSpark(tag: String): DataType = tag.trim match {
    case "bool" | "boolean" => BooleanType
    case "int16" | "smallint" => ShortType
    case "int32" | "int" | "integer" => IntegerType
    case "int64" | "bigint" => LongType
    case "float32" | "real" => FloatType
    case "float64" | "double" => DoubleType
    case DecimalRe(p, s) =>
      val precision = p.toInt
      if (precision > DecimalType.MAX_PRECISION)
        throw new IllegalArgumentException(
          s"decimal($precision,$s) exceeds Spark's max precision 38 " +
            "(decimal256 is unsupported)")
      DecimalType(precision, s.toInt)
    case "string" | "text" | "large_string" => StringType
    case "date" | "date32" => DateType
    case "time64[us]" | "time" =>
      LongType // micros-of-day convention; no Spark time-of-day type
    case t if t.startsWith("time64[") || t.startsWith("time32[") =>
      throw new IllegalArgumentException(
        s"Unsupported time unit in '$t': only microseconds are accepted")
    case "timestamp[us]" => TimestampNTZType // naive
    case t if t.startsWith("timestamp[us,") => TimestampType // tz-aware
    case t if t.startsWith("timestamp[ns") =>
      throw new IllegalArgumentException(
        s"Nanosecond timestamps are not supported: '$t'")
    case "timestamp[ms]" => TimestampNTZType
    case "binary" | "fixed_size_binary" => BinaryType
    case "uuid" => StringType // canonical form
    case "interval" | "duration[us]" => DayTimeIntervalType()
    case ListRe(element) =>
      ArrayType(toSpark(element), containsNull = true) // element forced optional
    case other =>
      throw new IllegalArgumentException(s"Unknown type tag: '$other'")
  }

  /** Spark type -> canonical tag (round-trip for supported types). */
  def toTag(dt: DataType): String = dt match {
    case BooleanType => "bool"
    case ShortType => "int16"
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float32"
    case DoubleType => "float64"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case StringType => "string"
    case DateType => "date"
    case TimestampNTZType => "timestamp[us]"
    case TimestampType => "timestamp[us, tz=UTC]"
    case BinaryType => "binary"
    case _: DayTimeIntervalType => "duration[us]"
    case ArrayType(e, _) => s"list<${toTag(e)}>"
    case other => throw new IllegalArgumentException(s"No tag for Spark type $other")
  }

  /** Build a StructType from (name, tag, nullable) triples — the schema
    * construction path of `create_schema` (`schema.py:100-115`). */
  def schemaOf(fields: Seq[(String, String, Boolean)]): StructType =
    StructType(fields.map { case (n, tag, nullable) =>
      StructField(n, toSpark(tag), nullable)
    })
}
