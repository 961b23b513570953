package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import graft.{SparkEntry, SparkSpec}
import graft.operators.CurationPipeline.Stage
import graft.tables.LakeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The restart-idempotence gate for lake-staged pipelines (VERDICT r9 ask
  * #3): a run killed between stages must resume from the last COMMITTED
  * stage (no prefix recompute), a completed run must replay as pure
  * read-back, and the resumed run's final output must be byte-identical
  * to an uninterrupted one — the T12 replay-identity stance applied to
  * the batch pipeline. */
class CurationPipelineSpec extends AnyFunSuite with SparkSpec {

  private def inputDf: DataFrame = {
    import spark.implicits._
    (1L to 100L).toDF("id")
  }

  /** Three deterministic stages with observable compute counts; stage 2
    * can be armed to throw once (the mid-run kill). */
  private final class Fixture {
    val computes = Array.fill(3)(new AtomicInteger(0))
    @volatile var failInStage2 = false
    val stages: Seq[Stage] = Seq(
      Stage("evens", prev => {
        computes(0).incrementAndGet()
        prev.where(col("id") % 2 === 0)
      }),
      Stage("scored", prev => {
        computes(1).incrementAndGet()
        prev.withColumn("score", col("id") * 3)
      }),
      Stage("top", prev => {
        computes(2).incrementAndGet()
        if (failInStage2) throw new RuntimeException("killed between stages")
        prev.where(col("score") >= 150)
      }))
  }

  private def collectAll(dfs: Seq[DataFrame]): Seq[Seq[String]] =
    dfs.map(_.orderBy("id").collect().map(_.toSeq.mkString(",")).toSeq)

  test("kill between stages resumes from the last committed stage") {
    val loc = tmpDir("graft_pipe_restart")
    val fx = new Fixture
    fx.failInStage2 = true
    intercept[RuntimeException] {
      CurationPipeline.run(spark, loc, "run-1", inputDf, fx.stages)
    }
    // Stages 0 and 1 committed before the kill; stage 2 never landed.
    assert(LakeTable.exists(s"$loc/stage0_evens"))
    assert(LakeTable.exists(s"$loc/stage1_scored"))
    assert(!LakeTable.exists(s"$loc/stage2_top"))
    assert(fx.computes.map(_.get).toSeq == Seq(1, 1, 1))

    // Restart with the same runId: the committed prefix is read back, not
    // recomputed; only the killed stage runs.
    fx.failInStage2 = false
    val outs = CurationPipeline.run(spark, loc, "run-1", inputDf, fx.stages)
    assert(fx.computes.map(_.get).toSeq == Seq(1, 1, 2))

    // Identity with an uninterrupted run at a fresh location.
    val fx2 = new Fixture
    val ref = CurationPipeline.run(
      spark, tmpDir("graft_pipe_ref"), "run-1", inputDf, fx2.stages)
    assert(collectAll(outs) == collectAll(ref))
  }

  test("a completed run replays as pure read-back; a new runId recomputes") {
    val loc = tmpDir("graft_pipe_replay")
    val fx = new Fixture
    val first = CurationPipeline.run(spark, loc, "run-A", inputDf, fx.stages)
    val firstRows = collectAll(first)
    assert(fx.computes.map(_.get).toSeq == Seq(1, 1, 1))

    // Same runId again: zero recomputes, identical rows.
    val replay = CurationPipeline.run(spark, loc, "run-A", inputDf, fx.stages)
    assert(fx.computes.map(_.get).toSeq == Seq(1, 1, 1))
    assert(collectAll(replay) == firstRows)

    // A different runId is a different pipeline run: everything recomputes
    // (the stale tables' stamps no longer match).
    CurationPipeline.run(spark, loc, "run-B", inputDf, fx.stages)
    assert(fx.computes.map(_.get).toSeq == Seq(2, 2, 2))
  }

  test("an upstream recompute invalidates the downstream stage's commit") {
    val loc = tmpDir("graft_pipe_stamp")
    val fx = new Fixture
    CurationPipeline.run(spark, loc, "run-A", inputDf, fx.stages)
    // Recommit stage 0 under a new run: its snapshot id advances, so
    // stage 1's recorded upstream stamp goes stale even if we then ask
    // for run-A again on stage 1 — the chain recomputes from the change.
    CurationPipeline.run(spark, loc, "run-B", inputDf, fx.stages.take(1))
    assert(fx.computes.map(_.get).toSeq == Seq(2, 1, 1))
    CurationPipeline.run(spark, loc, "run-B", inputDf, fx.stages)
    // stage 0 resumes (run-B already committed); stages 1-2 recompute.
    assert(fx.computes.map(_.get).toSeq == Seq(2, 2, 2))
  }

  test("an empty survivor set flows through (L4 skip-empty) without stale reads") {
    val loc = tmpDir("graft_pipe_empty")
    def stages(cut: Long) = Seq(
      Stage("filter", prev => prev.where(col("id") > cut)),
      Stage("double", prev => prev.withColumn("d", col("id") * 2)))
    // run-A: the filter keeps nothing -> both stages commit EMPTY survivor
    // sets (no data snapshot under the lake layer's skip-empty contract).
    val a = CurationPipeline.run(spark, loc, "run-A", inputDf, stages(1000))
    assert(a.map(_.count()) == Seq(0, 0))
    assert(a(1).columns.toSeq == Seq("id", "d"))
    // replay of the empty run resumes (properties committed even without
    // a data snapshot) and still reads empty.
    val a2 = CurationPipeline.run(spark, loc, "run-A", inputDf, stages(1000))
    assert(a2.map(_.count()) == Seq(0, 0))
    // run-B at the SAME location with survivors: fresh data, no leakage.
    val b = CurationPipeline.run(spark, loc, "run-B", inputDf, stages(90))
    assert(b.map(_.count()) == Seq(10, 10))
    // run-C empty again at the same location: the stale run-B snapshot
    // must NOT be read back as run-C's survivor set.
    val c = CurationPipeline.run(spark, loc, "run-C", inputDf, stages(1000))
    assert(c.map(_.count()) == Seq(0, 0))
  }

  test("d51 (lake-staged) and d45 (localCheckpoint-staged) agree row for row") {
    val dir = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("d45_curation_pipeline")(spark, dir)
      .collect().map(_.toSeq.mkString(",")).toSeq
    SparkEntry.releaseCaches()
    val b = SparkEntry.queries("d51_curation_lake")(spark, dir)
      .collect().map(_.toSeq.mkString(",")).toSeq
    SparkEntry.releaseCaches()
    assert(a == b)
  }
}
