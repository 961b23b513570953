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

  test("two-level boundary cumsum is exact across leaf widths, negative " +
       "doc_ids and the constant-score degenerate") {
    val rnd = new scala.util.Random(41)
    // constant score -> the boundary bucket IS the whole corpus (the x07
    // shape); shift 0 = every doc its own leaf (level-1 window does all
    // the work), 63 = two sign groups, 3 = mixed.
    for (shift <- Seq(0, 1, 3, 63)) {
      val ids = rnd.shuffle((-75L until 75L).toList)
      val d = ids.map(i => (i, 5L, rnd.nextInt(20).toLong))
      val total = d.map(_._3).sum
      for (budget <- Seq(0L, total / 3, total)) {
        val got = CorpusSelect.tokenBudgetSelect(
            d.toDF("doc_id", "score", "n_tokens"),
            "doc_id", "score", "n_tokens", budget, groupShift = shift,
            maxBucketRows = 0L)
          .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("selected"))
          .toMap
        assert(got == naive(d, budget), s"shift=$shift budget=$budget")
      }
    }
  }

  test("the adaptive switch fires on its own stats: a bucket past maxBucketRows " +
       "takes the two-level path and still equals the naive rule") {
    val rnd = new scala.util.Random(67)
    // one hot score bucket (12 rows) over a 3-row threshold, others small
    val d = (0L until 20L).map { i =>
      val score = if (i < 12) 7L else 3L + (i % 3)
      (i, score, rnd.nextInt(15).toLong)
    }
    val total = d.map(_._3).sum
    for (budget <- Seq(total / 4, total / 2, total)) {
      val got = CorpusSelect.tokenBudgetSelect(
          d.toDF("doc_id", "score", "n_tokens"),
          "doc_id", "score", "n_tokens", budget,
          groupShift = 2, maxBucketRows = 3L)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("selected"))
        .toMap
      assert(got == naive(d, budget), s"budget=$budget")
    }
  }

  private def runPerKey(docs: Seq[(Long, String, Long, Long)],
                        budget: Long): Map[Long, Long] =
    CorpusSelect.perKeyTokenBudgetSelect(
        docs.toDF("doc_id", "host", "score", "n_tokens"),
        "doc_id", "host", "score", "n_tokens", budget)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("selected"))
      .toMap

  /** Naive per-key global-window rule. */
  private def naivePerKey(docs: Seq[(Long, String, Long, Long)],
                          budget: Long): Map[Long, Long] =
    docs.groupBy(_._2).flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy { case (id, _, s, _) => (-s, id) }.map { case (id, _, _, n) =>
        cum += n
        id -> (if (cum <= budget) 1L else 0L)
      }
    }.toMap

  test("per-host budgets cut independently per key") {
    val d = Seq(
      (1L, "a", 9L, 10L), (2L, "a", 8L, 10L), (3L, "a", 7L, 10L),
      (4L, "b", 5L, 3L), (5L, "b", 5L, 3L), (6L, "b", 4L, 30L))
    // budget 20: host a keeps docs 1,2 (cum 10,20), drops 3 (30);
    // host b keeps 4,5 (3,6), drops 6 (36)
    assert(runPerKey(d, 20L) == Map(1L -> 1L, 2L -> 1L, 3L -> 0L,
      4L -> 1L, 5L -> 1L, 6L -> 0L))
    // budget 5: host a keeps nothing (first doc is 10 tokens);
    // host b keeps only doc 4 (within the tied 5-score bucket by doc_id)
    assert(runPerKey(d, 5L) == Map(1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 1L, 5L -> 0L, 6L -> 0L))
  }

  test("per-key: keys that fit entirely select everything; zero budget selects nothing sized") {
    val d = Seq((1L, "a", 3L, 5L), (2L, "a", 2L, 5L), (3L, "b", 1L, 0L))
    assert(runPerKey(d, 100L).values.forall(_ == 1L))
    // zero budget: the 0-token doc still rides (cum 0 <= 0)
    assert(runPerKey(d, 0L) == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("per-key randomized equivalence against the naive per-host rule") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 15) {
      val d = (0L until 300L).map { i =>
        // host h0 is a deliberate hot key holding ~40% of the docs
        val h = if (rnd.nextInt(5) < 2) "h0" else "h" + (1 + rnd.nextInt(8))
        (i, h, rnd.nextInt(10).toLong, rnd.nextInt(20).toLong)
      }
      val budget = rnd.nextInt(120).toLong
      assert(runPerKey(d, budget) == naivePerKey(d, budget),
        s"trial=$trial budget=$budget")
    }
  }

  test("largest-remainder allocation: exact floors + biggest remainders, " +
       "sums to the budget") {
    val totals = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("key", "tok")
    // budget 7 over masses 5/3/2 (total 10): quotas 3.5/2.1/1.4 ->
    // floors 3/2/1 (sum 6), remainders .5/.1/.4 -> the 1 leftover goes
    // to a (largest remainder) => 4/2/1
    val got = CorpusSelect.largestRemainderAlloc(totals, 7L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(got.values.sum == 7L)
  }

  test("allocated per-key budgets cut independently; zero allocation " +
       "selects nothing sized") {
    val d = Seq((1L, "a", 9L, 10L), (2L, "a", 8L, 10L),
        (3L, "b", 5L, 3L), (4L, "b", 4L, 30L))
      .toDF("doc_id", "key", "score", "n_tokens")
    val alloc = Seq(("a", 10L), ("b", 0L)).toDF("key", "budget")
    val got = CorpusSelect.perKeyTokenBudgetSelectAllocated(
        d, "doc_id", "key", "score", "n_tokens", alloc)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("selected"))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("a key missing from the allocation is a zero budget, never a " +
       "silent select-all") {
    val d = Seq((1L, "a", 9L, 10L), (2L, "b", 5L, 3L), (3L, "b", 4L, 0L))
      .toDF("doc_id", "key", "score", "n_tokens")
    val alloc = Seq(("a", 100L)).toDF("key", "budget") // no row for b
    val got = CorpusSelect.perKeyTokenBudgetSelectAllocated(
        d, "doc_id", "key", "score", "n_tokens", alloc)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("selected"))
      .toMap
    // b's boundary lands at its top score level with residual 0: the
    // sized doc drops, and the below-cutoff doc drops too
    assert(got == Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
  }

  test("allocated form with a constant budget equals the constant form") {
    val rnd = new scala.util.Random(7)
    val d = (0L until 200L).map { i =>
      (i, "k" + rnd.nextInt(6), rnd.nextInt(8).toLong, rnd.nextInt(15).toLong)
    }.toDF("doc_id", "key", "score", "n_tokens")
    val alloc = d.select("key").distinct().withColumn("budget", lit(40L))
    val a = CorpusSelect.perKeyTokenBudgetSelectAllocated(
        d, "doc_id", "key", "score", "n_tokens", alloc)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("selected"))).toMap
    val b = CorpusSelect.perKeyTokenBudgetSelect(
        d, "doc_id", "key", "score", "n_tokens", 40L)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("selected"))).toMap
    assert(a == b)
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
