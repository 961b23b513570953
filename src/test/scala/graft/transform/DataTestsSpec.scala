package graft.transform

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** §5.4: not_null / unique / accepted_values return violating rows. */
class DataTestsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val cycles = Seq(
    ("2024/1", "user-time"), ("2024/1", "run-up"),
    ("2024/2", "bogus-phase"), (null, "user-time"))
    .toDF("name", "phase")

  test("not_null flags null rows only") {
    assert(DataTests.notNull(cycles, "name").count() == 1)
    assert(DataTests.notNull(cycles, "phase").count() == 0)
  }

  test("unique flags duplicated key combinations") {
    assert(DataTests.unique(cycles, Seq("name")).count() == 1) // 2024/1 twice
    assert(DataTests.unique(cycles, Seq("name", "phase")).count() == 0)
  }

  test("accepted_values flags out-of-domain rows, ignores nulls") {
    val v = DataTests.acceptedValues(cycles, "phase",
      Seq("run-up", "user-time", "machine-physics"))
    assert(v.count() == 1)
    assert(v.select("phase").as[String].head() == "bogus-phase")
  }

  test("run evaluates a suite against built models") {
    val results = DataTests.run(Map("cycles" -> cycles), Seq(
      ("cycles", "not_null:name", DataTests.notNull(_, "name")),
      ("cycles", "accepted_values:phase",
        DataTests.acceptedValues(_, "phase", Seq("run-up", "user-time")))))
    assert(results.map(r => (r.test, r.violations)).toSet ==
      Set(("not_null:name", 1L), ("accepted_values:phase", 1L)))
    assert(!results.head.passed)
  }
}
