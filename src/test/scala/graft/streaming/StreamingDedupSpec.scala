package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.tables.LakeTable

/** Streaming admission control: each drain probes ONLY the newly arrived
  * documents against the resident LSH index; exact duplicates of indexed
  * docs are quarantined, novel docs pass. */
class StreamingDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val indexedDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "completely different content about spark plans and shuffle exchanges"))

  test("gateToTable quarantines near-dups of the indexed corpus, incrementally") {
    val src = tmpDir("dedup_src")
    val matchesLoc = tmpDir("dedup_tbl") + "/matches"
    val ckpt = tmpDir("dedup_ckpt")
    val indexed = indexedDocs.toDF("doc_id", "text")
    val schema = indexed.schema

    // batch 1: one exact dup of doc 1, one novel doc
    Seq((101L, indexedDocs.head._2),
        (102L, "novel text with nothing alike anywhere in the corpus at all"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    StreamingDedup.gateToTable(spark, src, schema, indexed, matchesLoc, ckpt)
    val after1 = LakeTable.load(spark, matchesLoc).read()
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(after1.toSeq == Seq((101L, 1L, 1000000L)))

    // batch 2: a dup of doc 2 arrives; only the new file is probed
    Seq((103L, indexedDocs(1)._2)).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    StreamingDedup.gateToTable(spark, src, schema, indexed, matchesLoc, ckpt)
    val after2 = LakeTable.load(spark, matchesLoc).read()
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(after2.toSeq == Seq((101L, 1L, 1000000L), (103L, 1L, 1000000L)))
  }
}
