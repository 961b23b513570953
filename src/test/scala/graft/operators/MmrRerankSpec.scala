package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** E19: hand-checked MMR greedy — the case pure top-k gets wrong (two
  * near-duplicate high-relevance hits crowding out a diverse one) plus
  * the edges: pool smaller than k, ties, rank-1 = pure relevance. */
class MmrRerankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  // query along the x axis; a and b nearly identical high-relevance hits;
  // c diverse with decent relevance
  private val query = df(50L -> Array(1f, 0f))
  private val corpus = df(
    1L -> Array(0.99f, 0.14f), // rel ~.990
    2L -> Array(0.98f, 0.20f), // rel ~.980, sim to 1 ~.998
    3L -> Array(0.70f, -0.70f)) // rel ~.707, sim to 1 ~.601

  test("diversity reorders: the near-duplicate loses to the diverse hit") {
    // lambda = 0.5: value(2 | {1}) = 5*(.980 - .998)e6 < 0;
    //              value(3 | {1}) = 5*(.707 - .601)e6 > 0 -> 3 wins rank 2
    val got = Similarity.mmrRerank(corpus, query, k = 3, pool = 3,
        lambda10 = 5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._2) == Seq(1L, 3L, 2L))
    // pure relevance (lambda = 1.0) keeps the top-k order instead
    val pure = Similarity.mmrRerank(corpus, query, k = 3, pool = 3,
        lambda10 = 10)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(pure == Seq(1L, 2L, 3L))
  }

  test("rank 1 is always the pure-relevance argmax; k > pool truncates") {
    val got = Similarity.mmrRerank(corpus, query, k = 10, pool = 2,
        lambda10 = 7)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(got.head == 1L && got.size == 2) // pool=2 -> only 2 rows
  }

  test("exact ties break on the smaller candidate id") {
    // two identical candidates: equal rel, equal pairwise sim
    val tied = df(7L -> Array(0.6f, 0.8f), 4L -> Array(0.6f, 0.8f),
      9L -> Array(1f, 0f))
    val got = Similarity.mmrRerank(tied, query, k = 3, pool = 3,
        lambda10 = 7)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(9L, 4L, 7L))
  }

  test("the selection value column carries the integer MMR objective") {
    val r1 = Similarity.mmrRerank(corpus, query, k = 1, pool = 3,
        lambda10 = 7)
      .head()
    // rank 1: value = 7 * rel_e6 (max-sim over empty selected set = 0)
    assert(r1.getLong(4) == 7L * r1.getLong(3))
  }
}
