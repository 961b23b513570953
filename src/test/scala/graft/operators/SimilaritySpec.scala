package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Behavioral contract of [[Similarity.semDedupKeep]] (SemDeDup): exact
  * duplicate vectors always share a k-means cell (identical distances →
  * identical tie-break), so the higher id is always dropped; orthogonal
  * vectors are never dropped regardless of how the clusters land. */
class SimilaritySpec extends AnyFunSuite with SparkSpec {

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("semDedupKeep drops exact duplicates, keeps the lowest id and all non-dups") {
    val corpus = emb(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(1f, 0f, 0f, 0f), // exact dup of 0 -> dropped
      2L -> Seq(0f, 1f, 0f, 0f),
      3L -> Seq(0f, 1f, 0f, 0f), // exact dup of 2 -> dropped
      4L -> Seq(0f, 0f, 1f, 0f), // orthogonal to everything -> kept
      5L -> Seq(0f, 0f, 0f, 1f)) // orthogonal to everything -> kept
    val kept = Similarity.semDedupKeep(corpus, k = 2, iters = 1, threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 2L, 4L, 5L))
  }

  test("multi-probe IVF with nprobe = nCells degenerates to exact search") {
    val rnd = new scala.util.Random(7)
    val corpus = emb((0L until 40L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2 - 1)): _*)
    val queries = corpus.where(col("vec_id") < 4)
    val cents = Similarity.trainCentroids(corpus, 4, 1)
    val exact = Similarity.knnBruteForce(corpus, queries, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val probed = Similarity.knnIvfMultiProbe(corpus, queries, cents, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(probed.toSeq == exact.toSeq)
  }

  test("semanticDecontaminate: cosine-close vectors drop, orthogonal keep, counts exact") {
    val corpus = emb(
      1L -> Seq(1f, 0f, 0f, 0f),   // parallel to bench 100 -> contaminated
      2L -> Seq(0.9f, 0.1f, 0f, 0f), // close to bench 100 -> contaminated
      3L -> Seq(0f, 0f, 1f, 0f),   // orthogonal to both benches -> kept
      4L -> Seq(1f, 1f, 0f, 0f))   // cos to BOTH benches high -> 2 hits
    val bench = emb(
      100L -> Seq(1f, 0f, 0f, 0f),
      101L -> Seq(0f, 1f, 0f, 0f))
    val got = Similarity.semanticDecontaminate(corpus, bench, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 0L), (2L, 1L, 0L), (3L, 0L, 1L),
      (4L, 2L, 0L)))
  }

  test("semanticDecontaminate at an unreachable threshold keeps everything") {
    val corpus = emb(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f))
    val bench = emb(100L -> Seq(1f, 0f))
    val got = Similarity.semanticDecontaminate(corpus, bench, 1.01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L, 1L), (2L, 0L, 1L)))
  }

  test("hardNegatives ranks ONLY different-label neighbors, nearest first") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a", Seq(0.95f, 0.05f, 0f)), // same label as anchor -> ineligible
      (2L, "b", Seq(0.9f, 0.1f, 0f)),   // closest different-label -> rank 1
      (3L, "b", Seq(0f, 1f, 0f)),       // orthogonal-ish -> rank 2
      (4L, "c", Seq(-1f, 0f, 0f)))      // anti-parallel -> rank 3 (cut at k=2)
      .toDF("vec_id", "label", "embedding")
    val anchors = Seq((100L, "a", Seq(1f, 0f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.hardNegatives(corpus, anchors, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq((100L, 1L, 2L), (100L, 2L, 3L)))
  }

  test("hardNegatives with fewer candidates than k returns what exists") {
    import spark.implicits._
    val corpus = Seq((1L, "b", Seq(1f, 0f))).toDF("vec_id", "label", "embedding")
    val anchors = Seq((9L, "a", Seq(1f, 0f))).toDF("vec_id", "label", "embedding")
    val got = Similarity.hardNegatives(corpus, anchors, 5).collect()
    assert(got.length == 1 && got.head.getLong(2) == 1L)
  }

  test("semDedupKeep at an unreachable threshold keeps every vector") {
    val corpus = emb(
      0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f), 2L -> Seq(0f, 1f))
    val kept = Similarity.semDedupKeep(corpus, k = 1, iters = 1, threshold = 1.1)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 1L, 2L))
  }

  /** The m-subspace reference formulation the fused trainPqCodebooks
    * replaced: one independent trainCentroids per embedding slice. The
    * fused single-scan training must reproduce it bit for bit. */
  private def pqCodebooksRef(corpus: org.apache.spark.sql.DataFrame, m: Int,
                             dim: Int, k: Int, iters: Int): Seq[Array[Array[Double]]] = {
    val subDim = dim / m
    (0 until m).map { s =>
      val sliced = corpus.select(col("vec_id"),
        slice(col("embedding"), s * subDim + 1, subDim).as("embedding"))
      Similarity.trainCentroids(sliced, k, iters).select("cell", "c_emb")
        .collect().sortBy(_.getLong(0))
        .map(_.getSeq[Double](1).toArray)
    }
  }

  test("fused PQ codebook training == per-subspace Lloyd's, bit for bit") {
    val rnd = new scala.util.Random(42)
    val corpus = emb((0L until 60L).map(i =>
      i -> Seq.fill(12)(rnd.nextFloat() * 2 - 1)): _*)
    for (iters <- Seq(1, 3)) {
      val fused = Similarity.trainPqCodebooks(corpus, m = 3, dim = 12, k = 4,
        iters = iters)
      val ref = pqCodebooksRef(corpus, m = 3, dim = 12, k = 4, iters = iters)
      assert(fused.size == ref.size)
      fused.zip(ref).foreach { case (f, r) =>
        assert(f.map(_.toSeq).toSeq == r.map(_.toSeq).toSeq)
      }
    }
  }

  test("fused PQ training tracks per-subspace emptied cells like the reference") {
    // Two tight point clouds per subspace with k=3: one init centroid loses
    // every point after the first iteration in at least one subspace, so the
    // collected codebook is SHORTER than k there — position mapping and the
    // next iteration's assignment must keep matching the reference.
    val corpus = emb(
      0L -> Seq(0f, 0f, 10f, 10f),
      1L -> Seq(0.1f, 0f, 10f, 10.1f),
      2L -> Seq(0.1f, 0.1f, 10.1f, 10f),
      3L -> Seq(10f, 10f, 0f, 0f),
      4L -> Seq(10.1f, 10f, 0f, 0.1f),
      5L -> Seq(10f, 10.1f, 0.1f, 0f))
    for (iters <- Seq(1, 2, 4)) {
      val fused = Similarity.trainPqCodebooks(corpus, m = 2, dim = 4, k = 3,
        iters = iters)
      val ref = pqCodebooksRef(corpus, m = 2, dim = 4, k = 3, iters = iters)
      fused.zip(ref).foreach { case (f, r) =>
        assert(f.map(_.toSeq).toSeq == r.map(_.toSeq).toSeq)
      }
    }
  }
}
