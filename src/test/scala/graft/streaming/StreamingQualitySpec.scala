package graft.streaming

import graft.SparkSpec
import graft.tables.LakeTable
import org.scalatest.funsuite.AnyFunSuite

class StreamingQualitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // trusted corpus: pure "a b" language — T=8, every bigram transition known
  private val trainDocs = Seq(
    (1L, "a b a b"),
    (2L, "b a b a"))

  test("gateToTable rejects high-perplexity arrivals, incrementally") {
    val src = tmpDir("qual_src")
    val rejectsLoc = tmpDir("qual_tbl") + "/rejects"
    val ckpt = tmpDir("qual_ckpt")
    val train = trainDocs.toDF("doc_id", "text")
    val schema = train.schema

    // batch 1: one in-domain doc (all transitions seen), one OOV-laden doc
    Seq((101L, "a b a b a b"),
        (102L, "x y z q r s"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    StreamingQuality.gateToTable(spark, src, schema, train,
      maxBitsPerKiloToken = 4000L, matchesLocation = rejectsLoc,
      checkpointDir = ckpt)
    val after1 = LakeTable.load(spark, rejectsLoc).read()
      .select("doc_id").as[Long].collect().sorted
    assert(after1.toSeq == Seq(102L))

    // batch 2: only the new file is scored; another junk doc is rejected,
    // another fluent doc admitted
    Seq((103L, "b a b a"), (104L, "zz yy xx ww vv uu tt ss"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    StreamingQuality.gateToTable(spark, src, schema, train,
      maxBitsPerKiloToken = 4000L, matchesLocation = rejectsLoc,
      checkpointDir = ckpt)
    val after2 = LakeTable.load(spark, rejectsLoc).read()
      .select("doc_id").as[Long].collect().sorted
    assert(after2.toSeq == Seq(102L, 104L))
  }

  test("reject rows carry the exact quantized scores of the batch scorer") {
    val src = tmpDir("qual_src2")
    val rejectsLoc = tmpDir("qual_tbl2") + "/rejects"
    val train = trainDocs.toDF("doc_id", "text")

    // "c c c": every token OOV. T=8 -> flog2(T)=3; first token 3+4=7,
    // the two others back off: 3 + 3 + 4 = 10 each => 27 bits, n=3,
    // bpk = 9000
    Seq((201L, "c c c")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    StreamingQuality.gateToTable(spark, src, train.schema, train,
      maxBitsPerKiloToken = 5000L, matchesLocation = rejectsLoc,
      checkpointDir = tmpDir("qual_ckpt2"))
    val rows = LakeTable.load(spark, rejectsLoc).read()
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.toSeq == Seq((201L, 3L, 27L, 9000L)))
  }
}
