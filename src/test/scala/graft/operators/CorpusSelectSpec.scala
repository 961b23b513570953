package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSelectSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, Long, Long)], budget: Long): Map[Long, Long] =
    CorpusSelect.tokenBudgetSelect(docs.toDF("doc_id", "score", "n_tokens"),
        "doc_id", "score", "n_tokens", budget)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("selected"))
      .toMap

  /** The naive global-window rule the operator must equal exactly. */
  private def naive(docs: Seq[(Long, Long, Long)], budget: Long): Map[Long, Long] = {
    var cum = 0L
    docs.sortBy { case (id, s, _) => (-s, id) }.map { case (id, _, n) =>
      cum += n
      id -> (if (cum <= budget) 1L else 0L)
    }.toMap
  }

  private val docs = Seq(
    (1L, 90L, 10L), (2L, 90L, 10L), (3L, 80L, 5L),
    (4L, 80L, 5L), (5L, 70L, 20L), (6L, 60L, 1L))

  test("budget cuts inside a bucket: doc_id breaks ties deterministically") {
    // order: 1,2 (90), 3,4 (80), 5 (70), 6 (60); cum 10,20,25,30,50,51
    assert(run(docs, 30L) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 0L, 6L -> 0L))
    // cut inside the 80-bucket: residual 5 after the 90s -> doc 3 only
    assert(run(docs, 25L) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 0L, 6L -> 0L))
    assert(run(docs, 24L) == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L,
      5L -> 0L, 6L -> 0L))
  }

  test("degenerate budgets: zero selects nothing, total selects everything") {
    assert(run(docs, 0L).values.forall(_ == 0L))
    assert(run(docs, 51L).values.forall(_ == 1L))
    assert(run(docs, Long.MaxValue).values.forall(_ == 1L))
  }

  test("zero-token docs ride along free inside their bucket") {
    val d = Seq((1L, 50L, 10L), (2L, 50L, 0L), (3L, 50L, 10L))
    // budget 10: doc 1 (cum 10) and free doc 2 (cum 10) fit; doc 3 not
    assert(run(d, 10L) == Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("randomized equivalence against the naive global-window rule") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val d = (0L until 200L).map(i =>
        (i, rnd.nextInt(12).toLong, rnd.nextInt(30).toLong))
      val total = d.map(_._3).sum
      val budget = (total * rnd.nextInt(100) / 100).toLong
      assert(run(d, budget) == naive(d, budget), s"budget=$budget")
    }
  }

  test("fractional budget matches the absolute form") {
    val total = docs.map(_._3).sum
    val frac = CorpusSelect.tokenBudgetSelectFraction(
        docs.toDF("doc_id", "score", "n_tokens"),
        "doc_id", "score", "n_tokens", 3L, 10L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("selected"))
      .toMap
    assert(frac == run(docs, total * 3 / 10))
  }
}
