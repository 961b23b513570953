package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Persisted LSH index: probing the stored tables must agree exactly with
  * probing the resident in-memory index, and mismatched build stamps fail
  * instead of joining bands against foreign shingle sets. */
class LshIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val indexed = ((1 to 60).map(i =>
    (i.toLong, s"indexed corpus document number $i about topic ${i % 7} " +
      s"with shared boilerplate phrasing and unique token x$i")).toSeq)
    .toDF("doc_id", "text")

  private val batch = Seq(
    // near-dup of indexed doc 12 (one token differs)
    (1001L, "indexed corpus document number 12 about topic 5 " +
      "with shared boilerplate phrasing and unique token y12"),
    // unrelated
    (1002L, "completely different content with no overlap whatsoever zz"))
    .toDF("doc_id", "text")

  test("probe from the persisted index == probe of the resident index") {
    val loc = tmpDir("lsh_index")
    LshIndex.build(spark, indexed, loc, "doc_id", "text")
    val served = LshIndex.probe(spark, loc, batch, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq

    val (bands, shs) = Dedup.buildLshIndex(indexed, "doc_id", "text")
    val resident = Dedup.probeLshIndex(batch, "doc_id", "text", bands, shs)
      .orderBy("doc_id").collect().toSeq
    bands.unpersist(); shs.unpersist()

    assert(served == resident)
    assert(served.map(_.getLong(0)) == Seq(1001L)) // the true near-dup hits
  }

  test("mismatched build stamps fail the probe") {
    val loc = tmpDir("lsh_index_stamp")
    LshIndex.build(spark, indexed, loc, "doc_id", "text")
    graft.tables.LakeTable.load(spark, s"$loc/bands")
      .writeProperties(Map("lsh.build_id" -> "in-flight"))
    val e = intercept[IllegalStateException] {
      LshIndex.probe(spark, loc, batch, "doc_id", "text")
    }
    assert(e.getMessage.contains("inconsistent"))
  }
}
