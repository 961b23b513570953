package graft.expressions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class NormKernelsSpec extends AnyFunSuite with SparkSpec {
  private def nfc(s: String) = NormKernels.nfc(UTF8String.fromString(s)).toString
  private def nfkc(s: String) = NormKernels.nfkc(UTF8String.fromString(s)).toString

  // explicit escapes so composed/decomposed forms survive source transport
  private val eAcuteDecomp = "é"
  private val eAcute = "\u00e9"
  private val aRingDecomp = "Å"
  private val aRing = "\u00c5"
  private val fiLig = "\ufb01"

  test("NFC composes decomposed sequences; idempotent; ASCII untouched") {
    assert(nfc(eAcuteDecomp) == eAcute)
    assert(nfc(aRingDecomp) == aRing)
    assert(nfc(eAcute) == eAcute)
    assert(nfc("plain ascii") == "plain ascii")
    // already-NFC input returns the SAME UTF8String (zero allocation path)
    val in = UTF8String.fromString("abc")
    assert(NormKernels.nfc(in) eq in)
  }

  test("NFC preserves compatibility characters; NFKC folds them") {
    assert(nfc(s"${fiLig}le") == s"${fiLig}le") // fi ligature survives NFC
    assert(nfkc(s"${fiLig}le") == "file")       // NFKC folds it
    assert(nfkc("\uff21\uff22") == "AB")        // fullwidth -> ASCII
    assert(nfkc(eAcuteDecomp) == eAcute)        // NFKC also composes
  }

  test("graft_nfc / graft_nfkc run inside whole-stage codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // spark.range keeps the plan non-foldable so codegen actually runs
    import org.apache.spark.sql.functions.{col, lit, when}
    val df = spark.range(3).select(
        when(col("id") === 0, lit(eAcuteDecomp))
          .when(col("id") === 1, lit(s"${fiLig}x"))
          .otherwise(lit("plain")).as("s"))
      .select(expr("graft_nfc(s)").as("c"), expr("graft_nfkc(s)").as("k"))
    val rows = df.orderBy("c").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows.contains((eAcute, eAcute)))
    assert(rows.contains((s"${fiLig}x", "fix")))
    assert(rows.contains(("plain", "plain")))
    val plan = df.queryExecution.executedPlan.toString
    // "*(1) Project [graft_nfc(...)]" — the starred prefix IS the
    // whole-stage-codegen marker in the executed plan's short form
    assert(!plan.contains("Exchange") && plan.contains("*(1) Project [graft_nfc"),
      plan.take(300))
  }
}
