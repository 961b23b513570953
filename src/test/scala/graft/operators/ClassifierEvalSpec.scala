package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ClassifierEvalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Boolean)]) =
    ClassifierEval.thresholdSweep(rows.toDF("s", "y"), "s", "y")
      .collect()
      .map(r => r.getAs[Long]("threshold") ->
        ((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          r.getAs[Long]("tn"), r.getAs[Long]("precision_e6"),
          r.getAs[Long]("recall_e6"))))
      .toMap

  test("hand-checked sweep: ties, all-negative threshold, extremes") {
    // scores: 5(+), 5(-), 3(+), 1(-), 1(-)
    val got = run(Seq((5L, true), (5L, false), (3L, true),
      (1L, false), (1L, false)))
    assert(got.keySet == Set(5L, 3L, 1L))
    assert(got(5L) == ((1L, 1L, 1L, 2L, 500000L, 500000L)))
    assert(got(3L) == ((2L, 1L, 0L, 2L, 666666L, 1000000L)))
    assert(got(1L) == ((2L, 3L, 0L, 0L, 400000L, 1000000L)))
  }

  test("randomized equivalence vs the naive per-threshold recount") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 400).map(_ =>
      (rnd.nextInt(20).toLong - 5, rnd.nextBoolean()))
    val got = run(rows)
    val totP = rows.count(_._2).toLong
    rows.map(_._1).distinct.foreach { t =>
      val tp = rows.count(r => r._1 >= t && r._2).toLong
      val fp = rows.count(r => r._1 >= t && !r._2).toLong
      val fn = totP - tp
      val tn = rows.count(r => r._1 < t && !r._2).toLong
      assert(got(t) == ((tp, fp, fn, tn,
        tp * 1000000L / (tp + fp), tp * 1000000L / totP)), s"t=$t")
    }
  }

  test("one-class inputs: all-positive has precision 1 everywhere, full recall at the floor; empty input yields no rows") {
    val allPos = run(Seq((2L, true), (1L, true)))
    assert(allPos.values.forall(v => v._2 == 0L && v._5 == 1000000L))
    assert(allPos(1L)._6 == 1000000L && allPos(2L)._6 == 500000L)
    assert(ClassifierEval.thresholdSweep(
      Seq.empty[(Long, Boolean)].toDF("s", "y"), "s", "y").count() == 0L)
  }
}
