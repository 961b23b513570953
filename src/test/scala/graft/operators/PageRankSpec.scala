package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int, scale: Long = 1000L) =
    PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters, scale)
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("out_deg"),
          (1 to iters).map(t => r.getAs[Long](s"rank_$t"))))
      .toMap

  test("hand-computed two-round trajectory") {
    // 1->2, 1->3, 2->1; node 3 is a sink. S=1000, r0=1000 everywhere.
    // m1: m(1)=1000, m(2)=m(3)=500 -> r1 = (3000+17m)/20 = 1000, 575, 575
    // m2: m(1)=575, m(2)=m(3)=500  -> r2(1) = 12775/20 = 638, r2(2/3)=575
    val out = run(Seq((1L, 2L), (1L, 3L), (2L, 1L)), iters = 2)
    assert(out(1L) == ((2L, Seq(1000L, 638L))))
    assert(out(2L) == ((1L, Seq(575L, 575L))))
    assert(out(3L) == ((0L, Seq(575L, 575L))))
  }

  test("self-loops and parallel edges are dropped") {
    val out = run(Seq((1L, 2L), (1L, 2L), (1L, 1L), (1L, 3L), (2L, 1L)),
      iters = 2)
    assert(out(1L) == ((2L, Seq(1000L, 638L))))
    assert(out(3L)._1 == 0L)
  }

  test("a cycle is the exact fixpoint: every rank stays at scale") {
    val ring = (0L until 6L).map(i => i -> ((i + 1) % 6))
    val out = run(ring, iters = 4)
    out.values.foreach { case (od, traj) =>
      assert(od == 1L); assert(traj.forall(_ == 1000L)) }
  }

  test("sink-only graphs decay toward the teleport floor") {
    // 1->2: r(1) drops to 3S/20 = 150 and stays; r(2) follows it down.
    val out = run(Seq((1L, 2L)), iters = 3)
    assert(out(1L)._2 == Seq(150L, 150L, 150L))
    assert(out(2L)._2 == Seq(1000L, 277L, 277L))
  }

  test("fixpoint form: a cycle converges in one round, exactly") {
    val ring = (0L until 5L).map(i => i -> ((i + 1) % 5))
    val out = PageRank.ranksFixpoint(ring.toDF("src", "dst"), "src", "dst")
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("rank") == 1000000L)
      assert(r.getAs[Long]("iters") == 1L)
      assert(r.getAs[Boolean]("converged"))
    }
  }

  test("fixpoint form: converged ranks are invariant and match the trajectory form") {
    val rnd = new scala.util.Random(29)
    val edges = (1 to 150).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }.distinct
    val fp = PageRank.ranksFixpoint(edges.toDF("src", "dst"), "src", "dst")
      .collect()
    assert(fp.forall(_.getAs[Boolean]("converged")))
    val iters = fp.head.getAs[Long]("iters").toInt
    val traj = run(edges, iters + 1, scale = 1000000L)
    fp.foreach { r =>
      val node = r.getAs[Long]("node")
      // the fixpoint equals round `iters` AND round `iters + 1` — invariance
      assert(r.getAs[Long]("rank") == traj(node)._2(iters - 1))
      assert(r.getAs[Long]("rank") == traj(node)._2(iters))
    }
  }

  test("randomized equivalence against a naive in-memory simulation") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val iters = 4
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inTo = edges.groupBy(_._2)
    var r = nodes.map(_ -> 1000000L).toMap
    val expect = (1 to iters).map { _ =>
      r = nodes.map { v =>
        val m = inTo.getOrElse(v, Seq.empty)
          .map { case (u, _) => r(u) / outDeg(u) }.sum
        v -> (3L * 1000000L + 17L * m) / 20L
      }.toMap
      r
    }
    val out = run(edges, iters, scale = 1000000L)
    nodes.foreach { v =>
      assert(out(v)._1 == outDeg.getOrElse(v, 0L), s"deg($v)")
      (1 to iters).foreach(t =>
        assert(out(v)._2(t - 1) == expect(t - 1)(v), s"rank_$t($v)"))
    }
  }
}
