package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** asofBackward must agree with the obvious quadratic reference (for every
  * left row, the max right time at-or-before for its key) on seeded random
  * inputs — duplicate left times, keys with no right rows, right rows all
  * in the future, and equal-time ties are all reachable from the
  * generator's small key/time domains. */
class AsOfJoinPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def runCase(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val leftRows = Seq.fill(1 + rnd.nextInt(25))(
      (rnd.nextInt(5).toLong, rnd.nextInt(30).toLong))
    val rightKt = Seq.fill(rnd.nextInt(25))(
      (rnd.nextInt(5).toLong, rnd.nextInt(30).toLong)).distinct
    val left = leftRows.zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, t) }
      .toDF("event_id", "k", "t")
    val right = rightKt.map { case (k, t) => (k, t, s"p$k-$t") }
      .toDF("k", "t", "payload")
    val got = AsOfJoin.asofBackward(left, right, "k", "t", Seq("payload"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4))))
      .sortBy(_._1)
    val expected = leftRows.zipWithIndex.map { case ((k, t), i) =>
      val best = rightKt.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption
      (i.toLong, best.map(_._2), best.map(b => s"p${b._1}-${b._2}"))
    }.sortBy(_._1)
    assert(got.toSeq == expected, s"seed=$seed")
  }

  test("asofBackward == quadratic reference across 20 seeded cases") {
    (1L to 20L).foreach(runCase)
  }
}
