package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ports the evolution-compat cases of the reference's
  * `iceberg/test_schema.py:175-216`. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private val base = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true)))

  test("identical schema evolves to None") {
    assert(SchemaEvolution.evolve(base, base).isEmpty)
  }

  test("new columns are appended, forced nullable") {
    val incoming = StructType(base.fields ++ Seq(
      StructField("extra", DoubleType, nullable = false)))
    val out = SchemaEvolution.evolve(base, incoming).get
    assert(out.fieldNames.toSeq == Seq("id", "name", "extra"))
    assert(out("extra").nullable)
    assert(out("id").nullable == false) // existing fields untouched
  }

  test("removed column raises") {
    val incoming = StructType(Seq(base.fields.head))
    val e = intercept[SchemaEvolution.IncompatibleSchemaException] {
      SchemaEvolution.evolve(base, incoming)
    }
    assert(e.incompatibilities.exists(_.contains("'name' removed")))
  }

  test("type change raises") {
    val incoming = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", DoubleType, nullable = true)))
    val e = intercept[SchemaEvolution.IncompatibleSchemaException] {
      SchemaEvolution.evolve(base, incoming)
    }
    assert(e.incompatibilities.exists(_.contains("changed type")))
  }

  test("required-flag change raises") {
    val incoming = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("name", StringType, nullable = true)))
    val e = intercept[SchemaEvolution.IncompatibleSchemaException] {
      SchemaEvolution.evolve(base, incoming)
    }
    assert(e.incompatibilities.exists(_.contains("'required' changed")))
  }

  test("all incompatibilities are listed together") {
    val incoming = StructType(Seq(
      StructField("id", DoubleType, nullable = false)))
    val e = intercept[SchemaEvolution.IncompatibleSchemaException] {
      SchemaEvolution.evolve(base, incoming)
    }
    assert(e.incompatibilities.size == 2) // type change + removal
  }
}
