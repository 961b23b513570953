package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Distributed deduplication operators for training-data pipelines.
  *
  * Scale design (the 100 TB story):
  *  - Exact dedup is a hash-groupBy: one shuffle on the content digest,
  *    map-side partial aggregation, no wide rows.
  *  - Near-dup (MinHash/LSH) NEVER forms the all-pairs cross product. Docs
  *    are exploded to (band, minhash) keys, the self-join shuffles on those
  *    band-hash keys so only docs agreeing on a band ever meet, then exact
  *    Jaccard verification runs on the (tiny) candidate set. At 100 TB the
  *    band join is an ordinary shuffled equi-join whose skew AQE handles.
  *  - SimHash groups near-identical docs by a single fingerprint equality —
  *    one shuffle, no pair enumeration at all.
  */
object Dedup {

  /** Exact dedup: group by content digest; keep the smallest id as the
    * canonical representative and count duplicates. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("content_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash-LSH near-duplicate pairs over character n-gram shingles.
    *
    * Candidate generation: each doc emits (perm_index, minhash) keys; a
    * self-equi-join on those keys (doc_a < doc_b) yields candidates without a
    * cross join. Verification: exact Jaccard over the distinct shingle sets,
    * kept when >= threshold.
    *
    * With the 12 permutations of [[TextFunctions.MinhashA]] the miss
    * probability for a true pair at J=0.8 is 0.2^12 ~ 4e-9.
    */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 3,
                          thresholdNum: Int = 4, thresholdDen: Int = 5): DataFrame = {
    val sh = docs.select(
      col(idCol).as("doc_id"),
      shingles(col(textCol), shingleN).as("sh"))
    val sig = sh.select(col("doc_id"), col("sh"),
      minhashSignature(transform(col("sh"), g => portableHash(g))).as("sig"))

    // (doc_id, perm j, minhash value) — the LSH band keys.
    val bands = sig.select(col("doc_id"), posexplode(col("sig")).as(Seq("j", "v")))

    val cand = bands.as("a").join(bands.as("b"),
        col("a.j") === col("b.j") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    val withSets = cand
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")

    // Exact integer arithmetic end-to-end: the Jaccard test i/u >= num/den is
    // evaluated as i*den >= u*num, and the reported score is scaled to 1e6
    // with floor division — bitwise reproducible by any SQL oracle.
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
    val union = (size(col("sh_a")) + size(col("sh_b"))).cast("long") - inter
    withSets
      .select(col("doc_a"), col("doc_b"), inter.as("i"), union.as("u"))
      .where(col("i") * thresholdDen >= col("u") * thresholdNum)
      .select(col("doc_a"), col("doc_b"),
        expr("CAST((i * 1000000) div u AS BIGINT)").as("jaccard_e6"))
  }

  /** SimHash fingerprint per document (near-identical docs collide). */
  def simhashFingerprints(docs: DataFrame, idCol: String, textCol: String,
                          bits: Int = 20): DataFrame =
    docs.select(col(idCol).as("doc_id"), simhash(col(textCol), bits).as("simhash"))

  /** Groups of documents sharing a SimHash fingerprint: one shuffle. */
  def simhashDupGroups(docs: DataFrame, idCol: String, textCol: String,
                       bits: Int = 20): DataFrame =
    simhashFingerprints(docs, idCol, textCol, bits)
      .groupBy("simhash")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("group_size"))
      .where(col("group_size") > 1)
}
