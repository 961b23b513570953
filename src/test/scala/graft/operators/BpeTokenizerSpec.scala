package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class BpeTokenizerSpec extends AnyFunSuite with SparkSpec {
  import BpeTokenizer._

  test("merge learning on a hand-computed corpus") {
    // {ab x3, ac x1}: pair (a,b)=3 beats (a,c)=1; then (a,c) remains
    val merges = learnFromCounts(Seq(("ab", 3L), ("ac", 1L)), 5)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b"), ("a", "c")))
    // loop stops when no pairs remain (5 asked, 2 learnable)
    assert(merges.length == 2)
  }

  test("frequency ties break lexicographically — deterministic merges") {
    val m1 = learnFromCounts(Seq(("cd", 2L), ("ab", 2L)), 1)
    assert((m1.head.left, m1.head.right) == (("a", "b")))
  }

  test("the classic multi-round example: merged symbols pair up further") {
    // "aaab" x2: pairs (a,a)=4, (a,b)=2 -> merge (a,a) => [aa,a,b]
    // then (aa,a)=2, (a,b)=2 -> tie, (a,b) < (aa,a) lexicographically
    val merges = learnFromCounts(Seq(("aaab", 2L)), 3)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("greedy encode follows merge priority, not left-to-right scan") {
    // ranks: (b,c)=0, (a,b)=1. "abc" must merge (b,c) FIRST -> [a, bc]
    val ranks = Map(("b", "c") -> 0, ("a", "b") -> 1)
    assert(encodeWord("abc", ranks).toSeq == Seq("a", "bc"))
    // with the opposite priority the same word becomes [ab, c]
    val ranks2 = Map(("b", "c") -> 1, ("a", "b") -> 0)
    assert(encodeWord("abc", ranks2).toSeq == Seq("ab", "c"))
    // chained merges reach a single token
    val ranks3 = Map(("a", "b") -> 0, ("ab", "c") -> 1)
    assert(encodeWord("abc", ranks3).toSeq == Seq("abc"))
    assert(encodeWord("cab", ranks3).toSeq == Seq("c", "ab"))
    assert(encodeWord("x", ranks3).toSeq == Seq("x"))
  }

  test("training round trip: learned merges compress the training corpus") {
    import spark.implicits._
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, if (i % 2 == 0) "the cat sat the cat" else "the dog ran"))
      .toDF("doc_id", "text")
    val merges = learnMerges(docs, "text", numMerges = 6)
    assert(merges.nonEmpty && merges.length <= 6)
    // "the" is the most frequent word: after 6 merges it must be 1 token
    val ranks = merges.map(m => ((m.left, m.right), m.rank)).toMap
    assert(encodeWord("the", ranks).length == 1)
    val stats = encodeStats(spark, docs, "doc_id", "text", merges)
      .collect().sortBy(_.doc_id)
    assert(stats.forall(s => s.n_bpe_tokens >= s.n_words))
    assert(stats(0).n_words == 5 && stats(1).n_words == 3)
    // encode is map-side: no exchange in the plan
    val p = encodeStats(spark, docs, "doc_id", "text", merges)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(400))
  }

  test("nulls and empty text are zero-count rows, never a throw") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
    val stats = encodeStats(spark, docs, "doc_id", "text",
      Seq(Merge(0, "a", "b"))).collect().sortBy(_.doc_id)
    assert(stats(0) == BpeStats(1L, 2, 2))
    assert(stats(1) == BpeStats(2L, 0, 0))
    assert(stats(2) == BpeStats(3L, 0, 0))
  }
}
