package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, Seq[String])*) =
    rows.toDF("doc_id", "tokens")

  private def queriesOf(docs: org.apache.spark.sql.DataFrame, ids: Long*) =
    docs.where(col("doc_id").isin(ids: _*))
      .select(col("doc_id").as("query_id"), explode(col("tokens")).as("term"))
      .distinct()

  test("integer scores match the closed-form formula on a tiny corpus") {
    // N=3 docs, T=9 tokens; hand-checkable
    val docs = docsDf(
      0L -> Seq("apple", "banana", "apple"),
      1L -> Seq("banana", "cherry", "cherry"),
      2L -> Seq("apple", "durian", "durian"))
    val out = Bm25.topK(docs, queriesOf(docs, 0L), k = 3)
      .orderBy("rk").collect()

    def idf(n: Long, df: Long): Long = (1000000L * (2 * n - 2 * df + 1)) / (2 * df + 1)
    def tfn(tf: Long, dl: Long, n: Long, t: Long): Long =
      (1000L * 44 * tf * t) / (20 * tf * t + 6 * t + 18 * dl * n)
    val (n, t) = (3L, 9L)
    // query terms: apple (df=2), banana (df=2); all dl=3
    val sApple1 = idf(n, 2) * tfn(1, 3, n, t) // one apple occurrence
    val sApple2 = idf(n, 2) * tfn(2, 3, n, t)
    val sBanana1 = idf(n, 2) * tfn(1, 3, n, t)
    val expected = Map(
      0L -> (sApple2 + sBanana1), // self: apple x2 + banana x1
      1L -> sBanana1,
      2L -> sApple1)
    assert(out.length == 3)
    for (r <- out)
      assert(r.getAs[Long]("score") == expected(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}")
    // self-retrieval first (it matches the most query terms at highest tf)
    assert(out.head.getAs[Long]("doc_id") == 0L &&
      out.head.getAs[Long]("rk") == 1L)
  }

  test("ties rank by doc_id and k truncates the tail") {
    // docs 1..4 are identical, so all tie below the self-match
    val docs = docsDf(
      0L -> Seq("x", "y"), 1L -> Seq("x", "z"), 2L -> Seq("x", "z"),
      3L -> Seq("x", "z"), 4L -> Seq("x", "z"))
    val out = Bm25.topK(docs, queriesOf(docs, 0L), k = 3)
      .orderBy("rk").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L, 1L, 2L))
    assert(out.map(_.getAs[Long]("rk")).toSeq == Seq(1L, 2L, 3L))
  }

  test("maxDf drops stop-wordy query terms before scoring") {
    // "the" appears in every doc; with maxDf=2 only "rare" contributes,
    // so doc 2 (no "rare") drops out of the result entirely
    val docs = docsDf(
      0L -> Seq("the", "rare"),
      1L -> Seq("the", "rare"),
      2L -> Seq("the", "common"))
    val capped = Bm25.topK(docs, queriesOf(docs, 0L), k = 3, maxDf = 2)
      .orderBy("rk").collect()
    assert(capped.map(_.getAs[Long]("doc_id")).toSet == Set(0L, 1L))
    val uncapped = Bm25.topK(docs, queriesOf(docs, 0L), k = 3)
      .orderBy("rk").collect()
    assert(uncapped.map(_.getAs[Long]("doc_id")).toSet == Set(0L, 1L, 2L))
  }

  test("multiple queries rank independently in one pass") {
    val docs = docsDf(
      0L -> Seq("a", "b"), 1L -> Seq("a", "c"), 2L -> Seq("c", "d"),
      3L -> Seq("d", "b"))
    val out = Bm25.topK(docs, queriesOf(docs, 0L, 2L), k = 2)
      .orderBy("query_id", "rk").collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(0L, 2L))
    // each query retrieves itself first
    assert(byQuery(0L).head.getAs[Long]("doc_id") == 0L)
    assert(byQuery(2L).head.getAs[Long]("doc_id") == 2L)
    assert(out.forall(_.getAs[Long]("score") > 0L))
  }

  test("longer documents score below shorter ones at equal tf (b > 0)") {
    val docs = docsDf(
      0L -> Seq("needle"),
      1L -> Seq("needle", "pad1", "pad2", "pad3", "pad4", "pad5"),
      2L -> Seq("needle", "pad6"))
    val out = Bm25.topK(docs, queriesOf(docs, 0L), k = 3)
      .orderBy("rk").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L, 2L, 1L),
      "shorter docs must outrank longer ones at the same tf")
  }
}
