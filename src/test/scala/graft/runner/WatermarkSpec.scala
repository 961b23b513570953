package graft.runner

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

/** Ports the watermark codec cases of the reference's
  * `tests/unit_tests/test_extract.py:29-69`. */
class WatermarkSpec extends AnyFunSuite {

  test("round-trips string, int, double values") {
    for (w <- Seq(Watermark("c", "abc"), Watermark("c", 42L), Watermark("c", 4.5))) {
      assert(Watermark.deserialize(w.serialize) == w)
    }
  }

  test("datetime serializes to ISO and auto-parses back to datetime") {
    val w = Watermark("ts", LocalDateTime.of(2024, 1, 2, 3, 4, 5))
    val s = w.serialize
    assert(s.contains("2024-01-02T03:04:05"))
    assert(Watermark.deserialize(s) == w)
  }

  test("non-ISO strings stay strings") {
    val w = Watermark.deserialize("""{"column":"c","value":"not-a-date"}""")
    assert(w.value == WatermarkValue.S("not-a-date"))
  }

  test("missing or null column raises") {
    intercept[IllegalArgumentException](
      Watermark.deserialize("""{"value": 1}"""))
    intercept[IllegalArgumentException](
      Watermark.deserialize("""{"column": null, "value": 1}"""))
  }

  test("missing or null value raises") {
    intercept[IllegalArgumentException](
      Watermark.deserialize("""{"column": "c"}"""))
    intercept[IllegalArgumentException](
      Watermark.deserialize("""{"column": "c", "value": null}"""))
  }

  test("non-string column raises") {
    intercept[IllegalArgumentException](
      Watermark.deserialize("""{"column": 3, "value": 1}"""))
  }

  test("non-scalar value raises") {
    intercept[IllegalArgumentException](
      Watermark.deserialize("""{"column": "c", "value": [1,2]}"""))
  }
}
