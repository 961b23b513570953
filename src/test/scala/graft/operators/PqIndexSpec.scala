package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Persisted PQ index: build-once/search-many must agree exactly with the
  * direct in-memory pqTopK path, and serving must read the compact codes
  * table, never the raw embeddings. */
class PqIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def vec(seed: Long, dim: Int): Seq[Float] = {
    var x = seed
    Seq.fill(dim) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2f - 1f
    }
  }

  private val dim = 16
  private val corpus = (0L until 120L).map(i => (i, vec(i, dim)))
    .toDF("vec_id", "embedding")

  test("search from the persisted index == direct pqTopK, bit for bit") {
    val loc = tmpDir("pq_index")
    val queries = corpus.where(col("vec_id") < 5)
    val cbs = PqIndex.build(spark, corpus, loc, m = 4, dim = dim, k = 8,
      iters = 1)
    assert(cbs.size == 4 && cbs.head.length == 8 && cbs.head.head.length == 4)

    val direct = Similarity.pqTopK(corpus, queries, m = 4, dim = dim, k = 8,
        iters = 1, topK = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val served = PqIndex.search(spark, loc, queries, topK = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served == direct)

    // round-trip: codebooks read back identical to the trained ones
    val loaded = PqIndex.loadCodebooks(spark, loc)
    assert(loaded.map(_.map(_.toSeq).toSeq) == cbs.map(_.map(_.toSeq).toSeq))
  }

  test("serving reads the codes table, not the raw embeddings") {
    val loc = tmpDir("pq_index_plan")
    PqIndex.build(spark, corpus, loc, m = 4, dim = dim, k = 8, iters = 1)
    val queries = corpus.where(col("vec_id") < 3)
    val plan = PqIndex.search(spark, loc, queries, topK = 3)
      .queryExecution.executedPlan.toString
    // the only file scan in the serving plan is the codes table
    assert(plan.contains("codes"), plan.take(800))
    assert(!plan.contains("codebooks"), plan.take(800))
    // rebuild is transactional: a second build replaces atomically and
    // serving still matches the fresh direct computation
    PqIndex.build(spark, corpus, loc, m = 4, dim = dim, k = 8, iters = 1)
    val again = PqIndex.search(spark, loc, queries, topK = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val direct = Similarity.pqTopK(corpus, queries, m = 4, dim = dim, k = 8,
        iters = 1, topK = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(again == direct)
  }

  test("mismatched build stamps fail serving instead of decoding wrong") {
    val loc = tmpDir("pq_index_stamp")
    PqIndex.build(spark, corpus, loc, m = 4, dim = dim, k = 8, iters = 1)
    // simulate a rebuild that died between its two commits: the codes
    // table carries a newer build id than the codebooks table
    graft.tables.LakeTable.load(spark, s"$loc/codes")
      .writeProperties(Map("pq.build_id" -> "in-flight-rebuild"))
    val e = intercept[IllegalStateException] {
      PqIndex.search(spark, loc, corpus.where(col("vec_id") < 2), topK = 3)
    }
    assert(e.getMessage.contains("inconsistent"))
  }
}
