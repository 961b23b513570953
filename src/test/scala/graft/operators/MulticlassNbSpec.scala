package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MulticlassNbSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Seq[String], String, Boolean)]) =
    MulticlassNb.classify(rows.toDF("doc_id", "tokens", "cls", "tr"),
        "doc_id", "tokens", "cls", isTrain = col("tr"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("is_train"), r.getAs[Long]("n_tokens"),
          r.getAs[String]("predicted"), r.getAs[Long]("best_bits"))))
      .toMap

  test("hand-computed scores, smallest-label tie-break, zero-token prior-only doc") {
    val got = run(Seq(
      (1L, Seq("x", "x"), "a", true),
      (2L, Seq("y"), "b", true),
      (3L, Seq("x", "y"), "a", false),
      (4L, Seq.empty[String], "b", false)))
    // doc3: class a = 0 + (-1) = -1; class b = 0 + 1 = 1 -> b
    assert(got(3L) == ((0L, 2L, "b", 1L)))
    // doc1: both classes score 0 -> tie -> smallest label a
    assert(got(1L) == ((1L, 2L, "a", 0L)))
    assert(got(2L) == ((1L, 1L, "b", 1L)))
    // doc4: no tokens -> prior bits only (both 0) -> a
    assert(got(4L) == ((0L, 0L, "a", 0L)))
  }

  test("randomized equivalence vs an in-memory naive scorer") {
    val rnd = new scala.util.Random(47)
    val vocab = Vector("p", "q", "r", "s", "t", "u")
    val classes = Vector("c0", "c1", "c2")
    val rows = (0L until 120L).map { i =>
      val toks = Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
      (i, toks, classes(rnd.nextInt(classes.size)), i % 4 != 0)
    }
    def flog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val train = rows.filter(_._4)
    val cnt = train.flatMap(r => r._2.map(w => (w, r._3)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tc = train.flatMap(r => r._2.map(_ => r._3))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nc = train.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
    val got = run(rows)
    rows.foreach { case (id, toks, _, tr) =>
      val scored = classes.filter(tc.contains).map { c =>
        val bits = flog2(nc(c)) + toks.map(w =>
          flog2(cnt.getOrElse((w, c), 0L) + 1) - flog2(tc(c))).sum
        (c, bits)
      }
      val best = scored.maxBy { case (c, b) => (b, -classes.indexOf(c)) }
      // tie-break: smallest label among max bits
      val maxBits = scored.map(_._2).max
      val pred = scored.filter(_._2 == maxBits).map(_._1).min
      assert(got(id)._3 == pred, s"doc $id: $scored vs ${got(id)}")
      assert(got(id)._4 == maxBits, s"doc $id bits")
      assert(got(id)._1 == (if (tr) 1L else 0L))
      assert(best._2 == maxBits)
    }
  }
}
