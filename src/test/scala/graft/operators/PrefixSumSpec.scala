package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct coverage of the shared two-level running-sum machinery (the
  * d41/x07 boundary cumsum and the d46/t12 global offsets both ride on
  * it — this pins the helper itself across key/frame/leaf-width combos,
  * not just through its two consumers). */
class PrefixSumSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def naive(rows: Seq[(String, Long, Long)],
                    inclusive: Boolean): Map[(String, Long), Long] =
    rows.groupBy(_._1).flatMap { case (_, grp) =>
      var run = 0L
      grp.sortBy(_._2).map { case (k, id, v) =>
        val out = if (inclusive) run + v else run
        run += v
        (k, id) -> out
      }
    }.toMap

  test("keyed + global, inclusive + exclusive, across leaf widths incl. negative ids") {
    val rnd = new scala.util.Random(61)
    val rows = rnd.shuffle((-40L until 60L).toList).map(i =>
      (s"k${math.floorMod(i, 3)}", i, rnd.nextInt(25).toLong))
    for (shift <- Seq(0, 2, 5, 63); inclusive <- Seq(true, false)) {
      // keyed
      val keyed = PrefixSum.twoLevel(rows.toDF("key", "id", "v"),
          Seq("key"), "id", "v", "out", inclusive, shift)
        .collect()
        .map(r => (r.getAs[String]("key"), r.getAs[Long]("id")) ->
          r.getAs[Long]("out")).toMap
      assert(keyed == naive(rows, inclusive), s"keyed shift=$shift inc=$inclusive")
      // global (single implicit group)
      val flat = rows.map { case (_, id, v) => ("g", id, v) }
      val global = PrefixSum.twoLevel(
          flat.map(t => (t._2, t._3)).toDF("id", "v"),
          Seq.empty, "id", "v", "out", inclusive, shift)
        .collect()
        .map(r => ("g", r.getAs[Long]("id")) -> r.getAs[Long]("out")).toMap
      assert(global == naive(flat, inclusive), s"global shift=$shift inc=$inclusive")
    }
  }
}
