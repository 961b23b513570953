package graft.streaming

import graft.SparkSpec
import graft.tables.LakeTable
import org.scalatest.funsuite.AnyFunSuite

class StreamingClassifierSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // trusted labeled corpus: tPos=tNeg=3 (normBits 0), nPos=nNeg=1 (prior 0)
  // b(good)=1 b(nice)=1 b(spam)=-1 b(junk)=-1, unseen=0
  private val trainDocs = Seq(
    (1L, "good good nice", true),
    (2L, "spam spam junk", false))

  test("gateToTable rejects model-negative arrivals, incrementally") {
    val src = tmpDir("nb_src")
    val rejectsLoc = tmpDir("nb_tbl") + "/rejects"
    val ckpt = tmpDir("nb_ckpt")
    val train = trainDocs.toDF("doc_id", "text", "y")
    val arrivalSchema = Seq((0L, "")).toDF("doc_id", "text").schema

    Seq((101L, "good nice"), (102L, "spam junk junk"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    StreamingClassifier.gateToTable(spark, src, arrivalSchema, train,
      matchesLocation = rejectsLoc, checkpointDir = ckpt)
    val after1 = LakeTable.load(spark, rejectsLoc).read()
      .as[(Long, Long, Long)].collect().sorted
    assert(after1.toSeq == Seq((102L, 3L, -3L)))

    // second wave: only the new file is scored; the resident-model scores
    // are exact, and an empty doc scores the bare prior (0 -> rejected)
    Seq((103L, "good good"), (104L, "spam"), (105L, ""))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    StreamingClassifier.gateToTable(spark, src, arrivalSchema, train,
      matchesLocation = rejectsLoc, checkpointDir = ckpt)
    val after2 = LakeTable.load(spark, rejectsLoc).read()
      .as[(Long, Long, Long)].collect().sorted
    assert(after2.toSeq == Seq((102L, 3L, -3L), (104L, 1L, -1L),
      (105L, 0L, 0L)))
  }

  test("a replayed wave re-merges idempotently") {
    val src = tmpDir("nb_src2")
    val rejectsLoc = tmpDir("nb_tbl2") + "/rejects"
    val train = trainDocs.toDF("doc_id", "text", "y")
    val arrivalSchema = Seq((0L, "")).toDF("doc_id", "text").schema
    Seq((201L, "junk junk")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val ck1 = tmpDir("nb_ckpt2a")
    StreamingClassifier.gateToTable(spark, src, arrivalSchema, train,
      matchesLocation = rejectsLoc, checkpointDir = ck1)
    // fresh checkpoint: the same file replays as a "new" batch; the merge
    // keyed on doc_id must leave one identical row
    StreamingClassifier.gateToTable(spark, src, arrivalSchema, train,
      matchesLocation = rejectsLoc, checkpointDir = tmpDir("nb_ckpt2b"))
    val rows = LakeTable.load(spark, rejectsLoc).read()
      .as[(Long, Long, Long)].collect()
    assert(rows.toSeq == Seq((201L, 2L, -2L)))
  }
}
