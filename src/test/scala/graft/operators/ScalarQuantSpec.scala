package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ScalarQuantSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def df(vs: Seq[(Long, Seq[Float])]) =
    vs.toDF("vec_id", "embedding")

  test("hand-checked codes: grid endpoints, midpoint, degenerate dim") {
    val index = df(Seq(
      (1L, Seq(0.0f, 7.5f)), (2L, Seq(1.0f, 7.5f)), (3L, Seq(0.5f, 7.5f))))
    val m = ScalarQuant.fit(index)
    assert(m.mins.toSeq == Seq(0.0, 7.5) && m.ranges.toSeq == Seq(1.0, 0.0))
    val codes = index
      .select(org.apache.spark.sql.functions.col("vec_id"),
        ScalarQuant.codesColumn(
          org.apache.spark.sql.functions.col("embedding"), m).as("c"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(codes(1L) == Seq(0L, 0L))    // min -> 0; degenerate dim -> 0
    assert(codes(2L) == Seq(255L, 0L))  // max -> 255
    assert(codes(3L) == Seq(127L, 0L))  // floor(0.5 * 255) = 127
  }

  test("out-of-grid query values clamp to edge codes") {
    val index = df(Seq((1L, Seq(0.0f)), (2L, Seq(1.0f))))
    val m = ScalarQuant.fit(index)
    val q = df(Seq((9L, Seq(-3.0f)), (8L, Seq(4.0f))))
      .select(org.apache.spark.sql.functions.col("vec_id"),
        ScalarQuant.codesColumn(
          org.apache.spark.sql.functions.col("embedding"), m).as("c"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(q(9L) == Seq(0L) && q(8L) == Seq(255L))
  }

  test("randomized equivalence against a naive in-memory SQ search") {
    val rnd = new scala.util.Random(13)
    val dim = 8
    val vecs = (0L until 120L).map(i =>
      (i, Seq.fill(dim)(rnd.nextFloat() * 4f - 2f)))
    val index = df(vecs)
    val m = ScalarQuant.fit(index)
    // naive mirror of the documented arithmetic
    def code(x: Float, d: Int): Long = {
      if (m.ranges(d) == 0.0) 0L
      else math.min(255L, math.max(0L,
        math.floor(((x.toDouble - m.mins(d)) * 255.0) / m.ranges(d)).toLong))
    }
    val codes = vecs.map { case (id, e) =>
      id -> e.zipWithIndex.map { case (x, d) => code(x, d) } }.toMap
    val queries = vecs.filter(_._1 < 5L)
    val expect = queries.map { case (qid, _) =>
      val qc = codes(qid)
      val scored = vecs.filter(_._1 != qid).map { case (nid, _) =>
        val d = qc.zip(codes(nid)).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, nid)
      }.sorted.take(4)
      qid -> scored.zipWithIndex.map { case ((d, nid), i) => (i + 1L, nid, d) }
    }.toMap
    val got = ScalarQuant.topK(index, df(queries), 4, m)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"),
          r.getAs[Long]("dist"))).toSeq).toMap
    assert(got == expect)
  }

  test("IVF-SQ8 equals the flat SQ search restricted to the query's cell") {
    val rnd = new scala.util.Random(17)
    val dim = 6
    val vecs = (0L until 90L).map(i =>
      (i, Seq.fill(dim)(rnd.nextFloat() * 2f), i % 4))
    val index = vecs.toDF("vec_id", "embedding", "cell")
    val m = ScalarQuant.fit(index)
    val queries = index.where(org.apache.spark.sql.functions.col("vec_id") < 6L)
    val got = ScalarQuant.topKIvf(index, queries, "cell", 3, m)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Long]("dist"))).toMap
    // reference: flat SQ over ONLY the same-cell slice, per query
    (0L until 6L).foreach { qid =>
      val cell = qid % 4
      val slice = vecs.filter(_._3 == cell).map(v => (v._1, v._2))
      val flat = ScalarQuant.topK(
          slice.toDF("vec_id", "embedding"),
          slice.filter(_._1 == qid).toDF("vec_id", "embedding"), 3, m)
        .collect()
        .map(r => r.getAs[Long]("rank") ->
          (r.getAs[Long]("neighbor_id"), r.getAs[Long]("dist"))).toMap
      flat.foreach { case (rk, exp) =>
        assert(got((qid, rk)) == exp, s"query $qid rank $rk") }
    }
  }

  test("recallAtK: perfect on on-grid vectors, bounded in general") {
    val rnd = new scala.util.Random(7)
    // integer coordinates + full-span anchors: the grid maps every value
    // to itself (code = x), so SQ and exact rankings agree EXACTLY and
    // recall must be 1.0 at any k
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(5)(rnd.nextInt(256).toFloat))) ++
      Seq((100L, Seq.fill(5)(0.0f)), (101L, Seq.fill(5)(255.0f)))
    val index = vecs.toDF("vec_id", "embedding")
    val m = ScalarQuant.fit(index)
    assert(m.mins.forall(_ == 0.0) && m.ranges.forall(_ == 255.0))
    val out = ScalarQuant.recallAtK(index,
        index.where(org.apache.spark.sql.functions.col("vec_id") < 3L), 3, m)
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_hits") == 3L)
      assert(r.getAs[Long]("recall_e6") == 1000000L)
    }
    // noisy data: recall stays a valid fraction of k
    val noisy = (0L until 60L).map(i =>
      (i, Seq.fill(6)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val m2 = ScalarQuant.fit(noisy)
    ScalarQuant.recallAtK(noisy,
        noisy.where(org.apache.spark.sql.functions.col("vec_id") < 5L), 4, m2)
      .collect().foreach { r =>
        val h = r.getAs[Long]("n_hits")
        assert(h >= 0L && h <= 4L)
        assert(r.getAs[Long]("recall_e6") == h * 1000000L / 4L)
      }
  }

  test("refine with a whole-corpus pool IS the exact search; the exact " +
       "re-rank can only improve on the coded order") {
    val rnd = new scala.util.Random(31)
    val index = df((0L until 40L).map(i =>
      i -> Seq.fill(6)(rnd.nextFloat() * 2 - 1)))
    val queries = index.where(org.apache.spark.sql.functions.col("vec_id") < 4)
    val m = ScalarQuant.fit(index)
    // cand >= corpus: the pool is everything, so the refined result must
    // equal brute-force exact L2 ranking (id set AND order)
    val refined = ScalarQuant.topKRefined(index, queries, 3, 40, m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val exact = Similarity.recallAtKExactL2(index, queries,
      ScalarQuant.topKRefined(index, queries, 3, 40, m), 3)
      .collect().map(r => r.getLong(1))
    assert(exact.forall(_ == 3L), s"whole-pool refine missed exact truth")
    // a narrow pool's recall is bounded by the coded order's recall
    val narrow = ScalarQuant.recallAtK(index, queries, 3, m)
      .collect().map(r => r.getLong(1))
    assert(refined.nonEmpty && narrow.forall(_ <= 3L))
  }

  test("refine requires the pool to cover k") {
    val index = df(Seq((1L, Seq(0.0f)), (2L, Seq(1.0f))))
    val m = ScalarQuant.fit(index)
    intercept[IllegalArgumentException] {
      ScalarQuant.topKRefined(index, index, 5, 3, m)
    }
  }

  test("SQ top-1 agrees with exact search on well-separated clusters") {
    val base = Seq(Seq.fill(4)(0.0f), Seq.fill(4)(10.0f), Seq.fill(4)(-10.0f))
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 60L).map { i =>
      val c = base((i % 3).toInt)
      (i, c.map(_ + rnd.nextFloat() * 0.1f))
    }
    val m = ScalarQuant.fit(df(vecs))
    val out = ScalarQuant.topK(df(vecs), df(vecs.filter(_._1 < 3L)), 1, m)
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") % 3 ==
        r.getAs[Long]("query_id") % 3) // nearest stays in-cluster
    }
  }
}
