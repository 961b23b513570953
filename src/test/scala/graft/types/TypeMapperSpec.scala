package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ports the parametrized type-mapping cases of the reference's
  * `iceberg/test_schema.py:86-152` (both directions + rejections). */
class TypeMapperSpec extends AnyFunSuite {

  private val roundTrips = Seq(
    "bool" -> BooleanType, "int16" -> ShortType, "int32" -> IntegerType,
    "int64" -> LongType, "float32" -> FloatType, "float64" -> DoubleType,
    "decimal(18,4)" -> DecimalType(18, 4), "string" -> StringType,
    "date" -> DateType, "timestamp[us]" -> TimestampNTZType,
    "binary" -> BinaryType, "list<int64>" -> ArrayType(LongType, containsNull = true))

  test("tag -> Spark type for every supported tag") {
    roundTrips.foreach { case (tag, dt) => assert(TypeMapper.toSpark(tag) == dt, tag) }
    assert(TypeMapper.toSpark("timestamp[us, tz=UTC]") == TimestampType)
    assert(TypeMapper.toSpark("uuid") == StringType)
    assert(TypeMapper.toSpark("time64[us]") == LongType) // micros-of-day
    assert(TypeMapper.toSpark("list<list<string>>") ==
      ArrayType(ArrayType(StringType, true), true))
  }

  test("Spark type -> tag round-trips") {
    roundTrips.foreach { case (tag, dt) => assert(TypeMapper.toTag(dt) == tag, tag) }
    assert(TypeMapper.toTag(TimestampType) == "timestamp[us, tz=UTC]")
  }

  test("nanosecond timestamps are rejected (schema.py:50-52)") {
    intercept[IllegalArgumentException](TypeMapper.toSpark("timestamp[ns]"))
    intercept[IllegalArgumentException](TypeMapper.toSpark("timestamp[ns, tz=UTC]"))
  }

  test("non-microsecond time units are rejected (schema.py:44-49)") {
    intercept[IllegalArgumentException](TypeMapper.toSpark("time64[ns]"))
    intercept[IllegalArgumentException](TypeMapper.toSpark("time32[ms]"))
  }

  test("decimal beyond precision 38 (decimal256) is rejected") {
    assert(TypeMapper.toSpark("decimal(38,10)") == DecimalType(38, 10))
    intercept[IllegalArgumentException](TypeMapper.toSpark("decimal(76,10)"))
  }

  test("unknown tags are rejected") {
    intercept[IllegalArgumentException](TypeMapper.toSpark("variant"))
  }

  test("schemaOf builds a StructType from triples") {
    val s = TypeMapper.schemaOf(Seq(
      ("id", "int64", false), ("name", "string", true)))
    assert(s == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true))))
  }
}
