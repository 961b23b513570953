package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Model-based property gate for the general merge-clause matrix.
  * First-satisfied-clause-wins selection across conditional
  * matched/not-matched/by-source clauses composes with the
  * copy-on-write touched-file split — seeded random clause sets and
  * data run against both the real table and a Scala reference
  * implementation of SQL MERGE semantics; contents must agree after
  * every step. */
class MergeClausesPropertySpec extends AnyFunSuite with SparkSpec {
  import MergeClauses._
  import spark.implicits._

  // a clause condition/assignment exists twice: as a Column over the
  // merge frame and as a Scala function over the model rows
  private case class MCond(col: Option[Column],
                           eval: (Option[(String, Int)], Option[(String, Int)]) => Boolean)
  private case class MSet(cols: Map[String, Column],
                          eval: ((String, Int), Option[(String, Int)]) => (String, Int))

  private val matchedConds: Seq[MCond] = Seq(
    MCond(None, (_, _) => true),
    MCond(Some(s("v") > t("v")), (tv, sv) => sv.get._2 > tv.get._2),
    MCond(Some(s("v") % 2 === 0), (_, sv) => sv.get._2 % 2 == 0),
    MCond(Some(t("v") >= 50), (tv, _) => tv.get._2 >= 50))
  private val insertConds: Seq[MCond] = Seq(
    MCond(None, (_, _) => true),
    MCond(Some(s("v") % 2 === 0), (_, sv) => sv.get._2 % 2 == 0),
    MCond(Some(s("v") >= 30), (_, sv) => sv.get._2 >= 30))
  private val bySourceConds: Seq[MCond] = Seq(
    MCond(None, (_, _) => true),
    MCond(Some(t("v") % 3 === 0), (tv, _) => tv.get._2 % 3 == 0),
    MCond(Some(t("v") < 20), (tv, _) => tv.get._2 < 20))
  private val updateSets: Seq[MSet] = Seq(
    MSet(Map("name" -> s("name"), "v" -> (s("v") + t("v"))),
      (tv, sv) => (sv.get._1, sv.get._2 + tv._2)),
    MSet(Map("v" -> (t("v") + 1)), (tv, _) => (tv._1, tv._2 + 1)))
  private val bySourceSets: Seq[MSet] = Seq(
    MSet(Map("v" -> lit(-1)), (tv, _) => (tv._1, -1)),
    MSet(Map("name" -> concat(t("name"), lit("!"))), (tv, _) => (tv._1 + "!", tv._2)))

  private def runSequence(seed: Long, steps: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val loc = tmpDir(s"mc_prop_$seed")
    val tbl = LakeTable.ensure(spark, loc,
      Seq((1L, "x", 0)).toDF("id", "name", "v").schema)
    var model = Map.empty[Long, (String, Int)]

    // seed rows
    val init = (1 to 30).map(i => (i.toLong, s"n$i", rnd.nextInt(100)))
    tbl.write(init.toDF("id", "name", "v"), "append")
    model = init.map(r => r._1 -> (r._2, r._3)).toMap

    for (step <- 1 to steps) {
      val srcRows = Seq.fill(1 + rnd.nextInt(8))(
        (rnd.nextInt(45).toLong + 1, s"s$step-${rnd.nextInt(99)}", rnd.nextInt(100)))
        .distinctBy(_._1)

      // random clause matrix (ordered; each clause draws its own cond)
      def draw[A](xs: Seq[A]) = xs(rnd.nextInt(xs.size))
      val mClauses: Seq[(Clause, MCond, Option[MSet])] =
        rnd.shuffle(Seq.tabulate(rnd.nextInt(3)) { _ =>
          val c = draw(matchedConds)
          if (rnd.nextBoolean()) {
            val st = draw(updateSets)
            (Update(c.col, st.cols), c, Some(st))
          } else (Delete(c.col), c, None)
        })
      val nClauses: Seq[(Insert, MCond)] =
        Seq.tabulate(rnd.nextInt(2)) { _ =>
          val c = draw(insertConds)
          (Insert(c.col, Map("id" -> s("id"), "name" -> s("name"), "v" -> s("v"))), c)
        }
      val bClauses: Seq[(Clause, MCond, Option[MSet])] =
        Seq.tabulate(rnd.nextInt(2)) { _ =>
          val c = draw(bySourceConds)
          if (rnd.nextBoolean()) {
            val st = draw(bySourceSets)
            (Update(c.col, st.cols), c, Some(st))
          } else (Delete(c.col), c, None)
        }
      if (mClauses.isEmpty && nClauses.isEmpty && bClauses.isEmpty) {
        // nothing to do this step
      } else {
        tbl.mergeClauses(srcRows.toDF("id", "name", "v"), Seq("id"),
          matched = mClauses.map(_._1),
          notMatched = nClauses.map(_._1),
          notMatchedBySource = bClauses.map(_._1))

        // reference semantics over the model
        val srcByKey = srcRows.map(r => r._1 -> (r._2, r._3)).toMap
        var next = Map.empty[Long, (String, Int)]
        for ((k, tv) <- model) srcByKey.get(k) match {
          case Some(sv) => // matched: first satisfied clause wins
            mClauses.find(_._2.eval(Some(tv), Some(sv))) match {
              case Some((_: Update, _, Some(st))) => next += k -> st.eval(tv, Some(sv))
              case Some((_: Delete, _, _)) => () // deleted
              case _ => next += k -> tv
            }
          case None => // not matched by source
            bClauses.find(_._2.eval(Some(tv), None)) match {
              case Some((_: Update, _, Some(st))) => next += k -> st.eval(tv, None)
              case Some((_: Delete, _, _)) => ()
              case _ => next += k -> tv
            }
        }
        for ((k, sv) <- srcByKey if !model.contains(k))
          nClauses.find(_._2.eval(None, Some(sv)))
            .foreach(_ => next += k -> sv)
        model = next
      }

      val actual = tbl.read().as[(Long, String, Int)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(actual == model,
        s"seed=$seed step=$step: ${actual.size} vs model ${model.size}\n" +
          s"missing=${(model.keySet -- actual.keySet).toSeq.sorted.take(5)} " +
          s"extra=${(actual.keySet -- model.keySet).toSeq.sorted.take(5)} " +
          s"diff=${model.collect { case (k, v) if actual.get(k).exists(_ != v) => k }.take(5)}")
    }
  }

  test("random clause matrices agree with SQL merge reference semantics") {
    for (seed <- Seq(7L, 99L, 20260812L)) runSequence(seed, steps = 8)
  }
}
