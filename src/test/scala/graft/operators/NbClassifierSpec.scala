package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NbClassifierSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, Seq[String], Boolean)],
                  minCount: Long = 1L) =
    NbClassifier.classify(docs.toDF("doc_id", "tokens", "y"),
        "doc_id", "tokens", "y", isTrain = col("doc_id") % 3 =!= 0,
        minCount = minCount)
      .orderBy("doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("is_train"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("score_bits"), r.getAs[Long]("predicted")))
      .toMap

  // train slice (doc_id % 3 != 0): d1 pos [a a b], d2 neg [b b c],
  // d4 pos [a c]  =>  counts a:(3,0) b:(1,2) c:(1,1); tPos=5 tNeg=3;
  // nPos=2 nNeg=1 => normBits = L(3)-L(5) = -1, priorBits = L(2)-L(1) = 1
  // per-occurrence bits: a -> L(4)-L(1)-1 = 1; b -> L(2)-L(3)-1 = -1;
  // c -> L(2)-L(2)-1 = -1; unseen -> L(1)-L(1)-1 = -1
  private val corpus = Seq(
    (1L, Seq("a", "a", "b"), true),
    (2L, Seq("b", "b", "c"), false),
    (4L, Seq("a", "c"), true),
    (3L, Seq("a", "b"), true),
    (6L, Seq("z", "z"), false),
    (9L, Seq.empty[String], true))

  test("hand-computed quantized log-odds on a tiny corpus") {
    val out = run(corpus)
    assert(out(1L) == ((1L, 3L, 1L + (1L + 1L - 1L), 1L)))   // 2 -> pos
    assert(out(2L) == ((1L, 3L, 1L + (-1L - 1L - 1L), 0L)))  // -2 -> neg
    assert(out(4L) == ((1L, 2L, 1L + (1L - 1L), 1L)))        // 1 -> pos
    assert(out(3L) == ((0L, 2L, 1L + (1L - 1L), 1L)))        // held out
  }

  test("unseen tokens score the smoothed neutral prior; empty docs the class prior") {
    val out = run(corpus)
    // d6 [z z]: z unseen in training -> 2 * (-1) + prior 1 = -1 -> neg
    assert(out(6L) == ((0L, 2L, -1L, 0L)))
    // d9 []: no occurrences, score = priorBits = 1 -> pos
    assert(out(9L) == ((0L, 0L, 1L, 1L)))
  }

  test("separable vocabularies classify held-out docs correctly") {
    val docs = (0L until 30L).map { i =>
      val pos = i % 2 == 0
      val toks = if (pos) Seq("good", "clean", "text") else Seq("spam", "junk", "ads")
      (i, toks, pos)
    }
    val out = run(docs)
    docs.foreach { case (i, _, pos) =>
      assert(out(i)._4 == (if (pos) 1L else 0L), s"doc $i") }
  }

  test("minCount pruning reverts a decisive token to the neutral prior") {
    // train: d1 pos [d d d], d2 neg [e e e] -> tPos=tNeg=3, prior=0, norm=0
    // b(d) = L(4)-L(1) = 2 unpruned; pruned at minCount=4 -> 0
    val docs = Seq(
      (1L, Seq("d", "d", "d"), true),
      (2L, Seq("e", "e", "e"), false),
      (3L, Seq("d"), true))
    assert(run(docs)(3L) == ((0L, 1L, 2L, 1L)))
    assert(run(docs, minCount = 4L)(3L) == ((0L, 1L, 0L, 0L)))
  }

  test("fit + score composition matches classify, and the model re-scores new batches") {
    val df = corpus.toDF("doc_id", "tokens", "y")
    val model = NbClassifier.fit(df.where(col("doc_id") % 3 =!= 0),
      "doc_id", "tokens", "y")
    try {
      val scored = NbClassifier.score(df, "doc_id", "tokens", model)
        .orderBy("doc_id").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_bits")).toMap
      val oneShot = run(corpus)
      assert(scored.keySet == oneShot.keySet)
      scored.foreach { case (id, bits) => assert(bits == oneShot(id)._3) }
      // a later batch with the resident model: same per-token bits
      val batch = NbClassifier.score(
        Seq((100L, Seq("a", "a"))).toDF("doc_id", "tokens"),
        "doc_id", "tokens", model).collect()(0)
      assert(batch.getAs[Long]("score_bits") == 1L + 1L + 1L)
    } finally model.unpersist()
  }

  test("one-class training mass is rejected") {
    val df = Seq((1L, Seq("a"), true), (2L, Seq("b"), true))
      .toDF("doc_id", "tokens", "y")
    intercept[IllegalArgumentException] {
      NbClassifier.fit(df, "doc_id", "tokens", "y", cacheHook = identity)
    }
  }
}
