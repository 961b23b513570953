package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NgramLmSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, Seq[String])], trainMod: Long = 3L,
                  minCount: Long = 1L) =
    NgramLm.perplexityBits(docs.toDF("doc_id", "tokens"), "doc_id", "tokens",
        isTrain = col("doc_id") % trainMod =!= 0, minCount = minCount)
      .orderBy("doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("is_train"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("bits"), r.getAs[Long]("bits_per_kilotoken")))
      .toMap

  // train slice: d1 [a b a b], d2 [a a]  (doc_id % 3 != 0)
  //   T = 6; c1: a->4 b->2; c2: (a,b)->2 (b,a)->1 (a,a)->1
  //   flog2: T->2, c1(a)->2, c1(b)->1, c2(a,b)->1, c2(b,a)->0, c2(a,a)->0
  private val corpus = Seq(
    1L -> Seq("a", "b", "a", "b"),
    2L -> Seq("a", "a"),
    3L -> Seq("a", "b", "c"))

  test("hand-computed bits on a tiny corpus (train + held-out)") {
    val out = run(corpus)
    // d3 [a b c]: first a: 2-2=0; b|a seen: flog2 c1(a) - flog2 c2(a,b) =
    // 2-1=1; c|b: bigram+unigram unseen -> 3 + 2 + 4 = 9  => 10 bits
    assert(out(3L) == ((0L, 3L, 10L, 3333L)))
    // d1: 0 + (2-1) + (flog2 c1(b) - flog2 c2(b,a) = 1-0) + 1 = 3 bits
    assert(out(1L) == ((1L, 4L, 3L, 750L)))
    // d2 [a a]: first a: 0; a|a seen: 2-0 = 2  => 2 bits
    assert(out(2L) == ((1L, 2L, 2L, 1000L)))
  }

  test("in-domain text scores below out-of-domain text") {
    val out = run(corpus)
    assert(out(1L)._4 < out(3L)._4 && out(2L)._4 < out(3L)._4)
  }

  test("pruning the LM sends rare words to the OOV path") {
    // minCount=2 prunes c1(b)=2? no: b has c1=2 >= 2, but bigrams (b,a) and
    // (a,a) (count 1) vanish, so d1's pos-3/4 transitions back off.
    val out = run(corpus, minCount = 2L)
    // d1: first a: 0; b|a (c2=2 kept): 1; a|b pruned -> 3 + (2-2) = 3;
    // b|a kept: 1  => 5 bits
    assert(out(1L)._3 == 5L)
    // d2: first a: 0; a|a pruned -> backoff 3 + (2-2) = 3  => 3 bits
    assert(out(2L)._3 == 3L)
  }

  test("empty-token docs are absent; single-token docs cost only the unigram") {
    val out = run(Seq(
      1L -> Seq("x", "x", "x"),          // train: T=3, c1(x)=3
      3L -> Seq("x"),                    // held out, 1 token
      6L -> Seq.empty[String]))          // held out, no tokens
    // flog2(3)=1, flog2(c1(x))=1 -> first-token bits 0
    assert(out(3L) == ((0L, 1L, 0L, 0L)))
    assert(!out.contains(6L))
  }

  test("every position costs at most 2*flog2(T) + backoff + oov bits") {
    val words = (0 until 40).map(i => s"w${i % 7}")
    val docs = (0L until 12L).map(i =>
      i -> words.drop((i % 5).toInt).take(20 + (i % 13).toInt))
    val out = run(docs)
    val t = docs.filter(_._1 % 3 != 0).map(_._2.size).sum
    val cap = 2 * (63 - java.lang.Long.numberOfLeadingZeros(t.toLong)) + 7
    for ((id, (_, n, bits, _)) <- out)
      assert(bits >= 0 && bits <= cap.toLong * n, s"doc $id")
  }
}
