package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** DSIR importance weights: the d32 oracle gate pins the exact integer
  * arithmetic; this spec pins the SEMANTICS (target-like raw docs must
  * outscore off-target ones) and the scale-critical plan shape (the
  * per-bucket weight table joins by broadcast; no window, no cartesian). */
class ImportanceWeightsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // target sample: a narrow in-domain vocabulary
    (0L, "neutron beam monitor histogram fit"),
    (11L, "neutron monitor peak fit parameters"),
    // raw docs: one in-domain, one disjoint-vocabulary
    (1L, "neutron monitor histogram peak analysis"),
    (2L, "cookie recipe butter sugar flour")
  ).toDF("doc_id", "text")

  test("target-like raw docs score above off-target ones") {
    val w = ImportanceWeights.dsirWeights(corpus, "doc_id", "text",
        isTarget = col("doc_id") % 11 === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.keySet == Set(1L, 2L)) // target docs never scored
    assert(w(1L) > w(2L),
      s"in-domain doc ${w(1L)} should outscore off-domain ${w(2L)}")
  }

  test("token-bucket kernel is bitwise-identical to the HOF formulation") {
    val texts = Seq((1L, "alpha beta  gamma"), (2L, ""), (3L, "   "),
      (4L, "one"), (5L, " leading trailing "), (6L, "dup dup dup")
    ).toDF("doc_id", "text")
    val both = texts.select(
        expr("graft_token_buckets(text, 1024L)").as("kernel"),
        ImportanceWeights.hofBuckets(col("text"), 1024).as("hof"))
      .collect()
    both.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
  }

  test("scoring plan is shuffle-free: no join, no exchange, no window") {
    val p = ImportanceWeights.dsirWeights(corpus, "doc_id", "text",
        isTarget = col("doc_id") % 11 === 0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Exchange") &&
      !p.contains("WindowExec"), p.take(800))
  }
}
