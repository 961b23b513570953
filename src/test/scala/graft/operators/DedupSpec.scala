package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The LSH band-bucket cap: a degenerate corpus (mass-duplicated
  * boilerplate) must not explode one bucket into O(m^2) candidate pairs,
  * while true near-duplicate pairs in small buckets still surface. The
  * oracle-gated d02 covers the normal-corpus path; this is the adversarial
  * one. */
class DedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val boilerplate =
    "this exact legal disclaimer paragraph appears verbatim at the foot of " +
      "every single document in the crawl and carries no signal whatsoever"
  private val docA =
    "the moderator performance pipeline walks the cycle archive fits each " +
      "monitor histogram and upserts the peak parameters into the warehouse"
  private val docB =
    "the moderator performance pipeline walks the cycle archive fits each " +
      "monitor histogram and upserts the peak values into the warehouse"

  test("constant-text corpus: oversized buckets dropped, true pair survives") {
    val docs = ((1 to 300).map(i => (i.toLong, boilerplate)) ++
      Seq((1001L, docA), (1002L, docB))).toDF("doc_id", "text")

    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      maxBandBucket = 10).collect()
    // the 300-way boilerplate clique (44,850 potential pairs) is gone;
    // the genuine near-dup pair in a size-2 bucket survives the cap
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1001L, 1002L)))

    // monitoring view quantifies what was dropped: every band of the
    // boilerplate signature is one 300-doc bucket
    val oversized = Dedup.oversizedBandBuckets(docs, "doc_id", "text",
      maxBandBucket = 10).collect()
    assert(oversized.length == graft.functions.TextFunctions.LshBands)
    assert(oversized.forall(_.getAs[Long]("bucket_size") == 300L))
  }

  test("cap at default leaves a small corpus untouched") {
    val docs = Seq((1L, docA), (2L, docB), (3L, boilerplate)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }
}
