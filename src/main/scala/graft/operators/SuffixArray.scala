package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by prefix doubling (Manber &
  * Myers 1990, the distributed formulation used for corpus-scale
  * exact-substring dedup — Lee et al. 2022 build exactly this over the
  * corpus concatenation). Every (doc, position) suffix gets an integer
  * rank: the DENSE rank of the suffix string among all corpus suffixes in
  * lexicographic order, identical suffixes (cross-doc repeats) sharing a
  * rank. The suffix array/rank is the index structure behind
  * arbitrary-length maximal-match queries, of which the fixed-L detector
  * ([[ExactSubstr]]) is the one-shot special case.
  *
  * Prefix doubling: after round r, ranks order suffixes by their first
  * 2^r characters. Round r+1 re-ranks by the pair (rank[p], rank[p+2^r])
  * — a self-join at distance 2^r and one distributed dense-rank — so
  * log2(maxDocLen) rounds finish the job: O(n log n) total work, each
  * round two narrow shuffles (ints only, never substrings — this is why
  * doubling beats comparison sorts of suffix STRINGS at corpus scale:
  * strings shuffle O(n^2) bytes in the worst case).
  *
  * The distributed dense-rank is range-partition + in-partition walk:
  * `repartitionByRange` colocates equal keys, a first pass counts
  * distinct keys per partition (the per-partition counts — one Long per
  * partition — are the ONLY thing collected to the driver), their prefix
  * sums offset a second in-partition walk that assigns dense ranks. The
  * result is partitioning-independent: any range boundaries yield the
  * same dense rank. Early exit: the counts pass also yields the global
  * distinct total for free, and once every suffix has a unique rank the
  * remaining rounds are no-ops and the loop stops.
  *
  * Character order is by Java char code (= codepoint for the BMP), which
  * matches byte-order collation for ASCII corpora — the oracle's ORDER BY
  * on suffix strings. Non-ASCII corpora rank consistently but against
  * UTF-16 code-unit order, not UTF-8 byte order; key on binary upstream
  * if byte order matters.
  */
object SuffixArray {

  /** (doc_id, p (1-based), suffix_rank) for every suffix of every doc —
    * `suffix_rank` the 1-based dense lexicographic rank corpus-wide. */
  def suffixRanks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .where(length(col("text")) > 0)

    val maxLen = d.agg(max(length(col("text")))).collect()(0) match {
      case r if r.isNullAt(0) => 0
      case r => r.getInt(0)
    }
    if (maxLen == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id LONG, p LONG, suffix_rank LONG"))

    // round 0: rank by the first THREE characters at once, packed into a
    // 48-bit order-preserving key (16 bits per char code, 0-padded past
    // the doc end so a prefix sorts before its extensions). A wider round-0
    // alphabet removes log2(3) ≈ 1.6 doubling rounds — two fewer
    // corpus-wide shuffles at every scale.
    val initial = d
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(1, length(text)), i ->
             cast(ascii(substring(text, i, 1)) as bigint) * 4294967296 +
             cast(ascii(substring(text, i + 1, 1)) as bigint) * 65536 +
             cast(ascii(substring(text, i + 2, 1)) as bigint))"""))
        .as(Seq("p0", "key3")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"),
        col("key3").as("r1"), lit(-1L).as("r2"))
    var (cur, curRdd, distinct) = denseRank(initial)
    val n = cur.count()

    // Two sound early exits: all suffixes distinguished (distinct == n),
    // or a round refines NOTHING (distinct stalls). Stall implies final:
    // if suffixes x,y agree on 2h chars but differ at position d >= 2h,
    // the pair shifted by s = (floor(d/h)-1)*h agrees on h..2h-1 chars —
    // tied at h, split at 2h — so an unrefined round means no such pair
    // exists anywhere and the partition is the suffix partition itself
    // (identical cross-doc suffixes legitimately stay tied forever).
    var k = 3L
    var prevDistinct = -1L
    while (k < maxLen && distinct < n && distinct > prevDistinct) {
      prevDistinct = distinct
      val shifted = cur.select(col("doc_id"), (col("p") - k).as("p"),
        col("suffix_rank").as("r2"))
      val paired = cur
        .select(col("doc_id"), col("p"), col("suffix_rank").as("r1"))
        .join(shifted, Seq("doc_id", "p"), "left")
        .na.fill(-1L, Seq("r2"))
      val (next, nextRdd, nextDistinct) = denseRank(paired)
      curRdd.foreach(_.unpersist(blocking = false)) // prev round: consumed
      cur = next
      curRdd = nextRdd
      distinct = nextDistinct
      k *= 2
    }
    // the final round's checkpoint backs the returned frame; the
    // ContextCleaner reclaims it once the caller drops the result
    cur
  }

  /** Distributed dense rank of rows (doc_id, p, r1, r2) by (r1, r2):
    * returns ((doc_id, p, suffix_rank) localCheckpoint-ed with its owned
    * RDD handle — [[Dedup.checkpointOwned]]'s round discipline, so the
    * loop frees round i once round i+1 materializes and lineage never
    * compounds — plus the number of distinct keys). Equal keys are
    * colocated by the range partitioner, so local walks + prefix-summed
    * per-partition distinct counts give the global dense rank with only
    * one Long per partition on the driver. */
  private def denseRank(paired: DataFrame)
      : (DataFrame, Option[org.apache.spark.rdd.RDD[_]], Long) = {
    val spark = paired.sparkSession
    import spark.implicits._
    val parted = paired
      .select(col("doc_id"), col("p"), col("r1"), col("r2"))
      .repartitionByRange(col("r1"), col("r2"))
      .sortWithinPartitions(col("r1"), col("r2"))
      .persist()

    val counts = parted.select(col("r1"), col("r2")).as[(Long, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var c = 0L
        var prev: (Long, Long) = null
        while (it.hasNext) {
          val cur = it.next()
          if (prev == null || cur != prev) c += 1
          prev = cur
        }
        Iterator.single((pid, c))
      }.collect().sortBy(_._1)

    val offsets = new Array[Long](counts.length + 1)
    var total = 0L
    for ((pid, c) <- counts) { offsets(pid) = total; total += c }
    val offB = spark.sparkContext.broadcast(offsets)

    val ranked = parted.as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var rank = offB.value(pid)
        var prev: (Long, Long) = null
        it.map { case (doc, p, r1, r2) =>
          if (prev == null || (r1, r2) != prev) rank += 1
          prev = (r1, r2)
          (doc, p, rank)
        }
      }
      .toDF("doc_id", "p", "suffix_rank")
    // eager localCheckpoint materializes before parted is released
    val (ck, handle) = Dedup.checkpointOwned(ranked)
    parted.unpersist()
    (ck, handle, total)
  }
}
