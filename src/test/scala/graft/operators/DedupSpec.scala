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

  private def clustersOf(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Dedup.duplicateClusters(pairs.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  /** In-test union-find reference for cross-checking the distributed CC. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("duplicate clusters: chain needs multi-round propagation") {
    // a 12-node chain has diameter 11 — exercises the iteration loop
    val chain = (1L to 11L).map(i => (i, i + 1))
    val got = clustersOf(chain)
    assert(got.keySet == (1L to 12L).toSet)
    assert(got.values.forall(_ == (1L, 12L)))
  }

  test("duplicate clusters: separate components, star, singleton excluded") {
    val pairs = Seq((5L, 3L), (3L, 9L),       // component {3,5,9}
      (20L, 21L), (20L, 22L), (20L, 23L),     // star {20..23}
      (40L, 41L))                             // pair {40,41}
    val got = clustersOf(pairs)
    assert(got(5L) == (3L, 3L) && got(9L) == (3L, 3L) && got(3L) == (3L, 3L))
    assert(got(22L) == (20L, 4L) && got(23L) == (20L, 4L))
    assert(got(40L) == (40L, 2L) && got(41L) == (40L, 2L))
    assert(!got.contains(1L)) // docs with no pair never appear
  }

  test("duplicate clusters match a union-find reference on a random graph") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val got = clustersOf(pairs)
    val ref = unionFind(pairs)
    assert(got.view.mapValues(_._1).toMap == ref)
    val refSizes = ref.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    got.foreach { case (doc, (cid, size)) =>
      assert(size == refSizes(cid), s"doc $doc cluster $cid")
    }
  }

  private def starClustersOf(pairs: Seq[(Long, Long)],
      maxIters: Int = 20): Map[Long, (Long, Long)] =
    Dedup.duplicateClustersStar(pairs.toDF("doc_a", "doc_b"), maxIters).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("d15 and d31 agree row-for-row on the real corpus — two independent " +
      "CC algorithms, one clustering") {
    // Label propagation (d15) and large-star/small-star (d31) share only
    // the edge derivation; their fixed points coinciding on the actual
    // near-dup graph is a strong no-oracle cross-check. The SAME check
    // was driven at sf1 this round (r10): 34,432 rows, exact set
    // equality on (doc_id, cluster_id, cluster_size) over the densified
    // 10x graph — the sf1 spot-correctness evidence for the heavy dedup
    // chain where the DuckDB oracle's interpreted shingle hashing is
    // impractical at scale.
    val dir = "/root/testdata/sf0.001"
    val a = graft.SparkEntry.queries("d15_dup_clusters")(spark, dir)
      .collect().map(_.toSeq.mkString(",")).toSeq
    val b = graft.SparkEntry.queries("d31_dup_clusters_star")(spark, dir)
      .collect().map(_.toSeq.mkString(",")).toSeq
    graft.SparkEntry.releaseCaches()
    assert(a.nonEmpty && a == b)
  }

  test("star clusters: deep path converges within O(log n) rounds") {
    // a 64-node path has diameter 63: label propagation needs 63 rounds,
    // the star rounds contract it geometrically. maxIters=10 would leave
    // a diameter-bound algorithm far from converged; the output equality
    // below is therefore also a convergence-rate assertion.
    val path = (1L to 63L).map(i => (i, i + 1))
    val got = starClustersOf(path, maxIters = 10)
    assert(got.keySet == (1L to 64L).toSet)
    assert(got.values.forall(_ == (1L, 64L)))
  }

  test("star clusters: separate components, star, singleton excluded") {
    val pairs = Seq((5L, 3L), (3L, 9L),
      (20L, 21L), (20L, 22L), (20L, 23L),
      (40L, 41L))
    val got = starClustersOf(pairs)
    assert(got(5L) == (3L, 3L) && got(9L) == (3L, 3L) && got(3L) == (3L, 3L))
    assert(got(22L) == (20L, 4L) && got(23L) == (20L, 4L))
    assert(got(40L) == (40L, 2L) && got(41L) == (40L, 2L))
    assert(!got.contains(1L))
  }

  test("star clusters: depth-10^3 path needs only ~log2(n) rounds where " +
      "label propagation hits maxIters") {
    // THE motivating case for large-star/small-star: a path of 1024 nodes
    // has diameter 1023. Label propagation moves the min label one hop per
    // round, so at maxIters=10 it is nowhere near converged; the star
    // rounds contract geometrically and must finish in O(log2 n) rounds.
    val n = 1024L
    val path = (1L until n).map(i => (i, i + 1))
    val (labels, rounds, converged) =
      Dedup.duplicateClustersStarStats(path.toDF("doc_a", "doc_b"), maxIters = 20)
    assert(converged, "star rounds did not converge")
    assert(rounds <= 14, s"expected <= log2(1024)+4 rounds, took $rounds")
    val got = labels.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == (1L to n).toSet)
    assert(got.values.forall(_ == (1L, n)))
    // the diameter-bound algorithm on the same budget: stale labels
    val lp = Dedup.duplicateClusters(path.toDF("doc_a", "doc_b"), maxIters = 10)
      .select("cluster_id").distinct().count()
    assert(lp > 1, "label propagation unexpectedly converged in 10 rounds")
  }

  test("star clusters keep one-row-per-doc even when maxIters cuts " +
      "convergence short") {
    // round-6 ADVICE: a non-converged edge set is not a star forest, so
    // without the defensive collapse a node would emit duplicate doc_id
    // rows with conflicting cluster_ids
    val path = (1L until 128L).map(i => (i, i + 1))
    val (labels, _, converged) =
      Dedup.duplicateClustersStarStats(path.toDF("doc_a", "doc_b"), maxIters = 2)
    assert(!converged) // 2 rounds cannot finish a depth-127 path
    val rows = labels.collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "duplicate doc_id rows in non-converged output")
    assert(rows.map(_.getLong(0)).toSet == (1L to 128L).toSet)
  }

  test("star clusters agree with label propagation on random graphs") {
    for (seed <- Seq(7, 101, 4242)) {
      val rnd = new scala.util.Random(seed)
      val pairs = Seq.fill(150)((rnd.nextInt(90).toLong, rnd.nextInt(90).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      assert(starClustersOf(pairs) == clustersOf(pairs), s"seed $seed")
    }
  }

  test("bloom decontamination is lossless vs the exact-join formulation") {
    import org.apache.spark.sql.functions._
    val docs = Tables.docsLike((0L until 120L).map { i =>
      // overlapping shingle structure: every 7th doc reuses doc (i-7)'s text
      val base = if (i % 7 == 0 && i >= 7) i - 7 else i
      (i, s"alpha beta gamma delta text body number $base repeated terms here")
    })
    val isBench = col("doc_id") % 11 === 0
    val bloom = Dedup.bloomDecontaminate(docs, "doc_id", "text", isBench)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    // exact reference: d14's formulation without the sketch
    val fps = Dedup.winnowFingerprintRows(docs, "doc_id", "text")
    val bench = fps.where(isBench).select("fingerprint").distinct()
    val exact = fps.where(!isBench).join(bench, "fingerprint")
      .select("doc_id").distinct().orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(bloom == exact)
    assert(exact.nonEmpty) // the fixture actually exercises overlap
  }

  test("bloom probe plan: codegen sketch filter before the verify join, no UDF") {
    import org.apache.spark.sql.functions._
    val docs = Tables.docsLike((0L until 40L).map(i =>
      (i, s"some shared corpus text body $i with common phrasing")))
    val p = Dedup.bloomDecontaminate(docs, "doc_id", "text",
        col("doc_id") % 5 === 0)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_bloom_might_contain"), p.take(800))
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"), p.take(800))
  }

  test("minhashEstimateQuality: exact duplicates estimate 1.0; near-dups " +
       "estimate close to their true Jaccard; estimates stay in [0, 1e6]") {
    val docs = Tables.docsLike(Seq(
      1L -> docA, 2L -> docA,          // identical pair
      3L -> docA, 4L -> docB,          // near-dup pair (high true J)
      5L -> boilerplate))              // unrelated singleton
    val out = Dedup.minhashEstimateQuality(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("est_e6"), r.getAs[Long]("jaccard_e6"),
          r.getAs[Long]("err_e6"))).toMap
    // the identical pair must measure exactly
    assert(out((1L, 2L)) == ((1000000L, 1000000L, 0L)))
    // the near-dup pair: estimator within 15 points of truth (200 perms ->
    // the std error at J~0.9 is ~2 points; deterministic given fixed perms)
    val (est, tru, err) = out((3L, 4L))
    assert(tru > 800000L && err <= 150000L && err == math.abs(est - tru))
    out.values.foreach { case (e, t, _) =>
      assert(e >= 0L && e <= 1000000L && t >= 0L && t <= 1000000L) }
    // the singleton shares no band with anything
    assert(!out.keySet.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("paragraphDedup: first (doc, position) occurrence wins corpus-wide; " +
       "docs reassemble in order; emptied docs drop") {
    val docs = Tables.docsLike(Seq(
      1L -> "alpha\nshared\nbeta",
      2L -> "shared\ngamma",       // 'shared' already taken by doc 1
      3L -> "shared",              // loses its only paragraph -> dropped
      4L -> "delta\ndelta\nepsilon")) // in-doc dup: first position wins
    val out = Dedup.paragraphDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("cleaned_text"), r.getAs[Long]("n_kept")))
    assert(out.toSeq == Seq(
      (1L, "alpha\nshared\nbeta", 3L),
      (2L, "gamma", 1L),
      (4L, "delta\nepsilon", 2L)))
  }

  test("corpusDiff: NULL text classifies by PRESENCE, not digest nullability") {
    val old = Tables.docsLike(Seq(
      1L -> null,       // present both sides, NULL -> non-NULL: modified
      2L -> "same",     // unchanged
      3L -> null,       // present both sides, NULL -> NULL: unchanged
      4L -> "gone",     // removed (non-NULL text)
      5L -> null))      // removed (NULL text — must NOT report unchanged)
    val nw = Tables.docsLike(Seq(
      1L -> "now set",
      2L -> "same",
      3L -> null,
      6L -> "fresh",    // added (non-NULL text)
      7L -> null))      // added (NULL text — must NOT report removed)
    val out = Dedup.corpusDiff(old, nw, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status"))
    assert(out.toSeq == Seq(
      1L -> "modified", 2L -> "unchanged", 3L -> "unchanged",
      4L -> "removed", 5L -> "removed", 6L -> "added", 7L -> "added"))
  }

  private object Tables {
    def docsLike(rows: Seq[(Long, String)]) = {
      import spark.implicits._
      rows.toDF("doc_id", "text")
    }
  }
}
