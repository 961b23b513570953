package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
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
  * Prefix doubling with ACTIVE-GROUP refinement (the Larsson/Sadakane
  * qsufsort insight, distributed): after round r, suffixes are ordered by
  * their first `m * 2^r` characters; a suffix whose rank is already
  * UNIQUE can never move again, so each round re-ranks ONLY the rows
  * still inside tied groups. Natural corpora resolve geometrically (most
  * positions are distinguished after 1-2 rounds; the doubling depth is
  * driven by a tiny tail of long repeated spans), so per-round shuffle
  * volume collapses instead of staying O(n) for log(maxDocLen) rounds.
  *
  * In-loop representation: `base` = |{suffixes strictly smaller}| (the
  * 0-based rank of the row's GROUP — tied suffixes share it). Unlike the
  * dense rank, `base` of a resolved row is INVARIANT under refinement of
  * other groups (splitting a group renumbers nothing outside it), which
  * is what makes skip-the-resolved sound. A tied group with old base r
  * ordered by the distance-k rank refines to sub-blocks at
  * `r + (rows before the sub-block within the group)`. One final
  * distributed dense-rank pass converts `base` to the 1-based dense
  * `suffix_rank` contract (the two orders are identical by construction).
  *
  * Each round pairs active rows with the rank at distance k two ways,
  * chosen by the exact active count:
  *  - LARGE active set: one doc-keyed exchange + in-partition sort of the
  *    full frame, then a per-doc array walk emits (base[p], base[p+k])
  *    in-row (positions are dense 1..len per doc, so no self-join — the
  *    join form this replaced shuffled and sorted BOTH sides).
  *  - SMALL active set (the long tail): the active rows broadcast as a
  *    probe and the checkpointed frame STREAMS — zero exchange, zero
  *    sort; end-of-doc lookups resolve against a narrow doc-length scan.
  *
  * The distributed rank passes are range-partition + in-partition walks:
  * `repartitionByRange` colocates equal keys, a first pass collects one
  * summary row per partition (row counts / group-boundary carries — the
  * ONLY driver state), and a second walk assigns ranks from broadcast
  * offsets. Rounds are localCheckpoint-owned ([[Dedup.checkpointOwned]]):
  * round i's blocks free as soon as round i+1 materializes.
  *
  * Character order is by Java char code (= codepoint for the BMP), which
  * matches byte-order collation for ASCII corpora — the oracle's ORDER BY
  * on suffix strings. Non-ASCII corpora rank consistently but against
  * UTF-16 code-unit order, not UTF-8 byte order; key on binary upstream
  * if byte order matters.
  */
object SuffixArray {

  /** Active sets at or below this row count pair by broadcast probe
    * instead of the full-frame doc-keyed walk (~24 B per probe row; 1M
    * rows ~ 24 MB broadcast — safely under the executor budget that the
    * LSH family's broadcast caps already assume). */
  private[operators] val BroadcastPairLimit = 1000000L

  /** (doc_id, p (1-based), suffix_rank) for every suffix of every doc —
    * `suffix_rank` the 1-based dense lexicographic rank corpus-wide.
    * `broadcastPairLimit` overrides the walk-vs-broadcast pairing switch
    * (tests force each path; production uses the default). */
  def suffixRanks(docs: DataFrame, idCol: String, textCol: String,
                  broadcastPairLimit: Long = BroadcastPairLimit): DataFrame = {
    val spark = docs.sparkSession
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .where(length(col("text")) > 0)

    // One stats pass: the longest doc bounds the round count, and an
    // all-ASCII corpus unlocks the WIDE round-0 pack (9 chars x 7 bits vs
    // 3 chars x 16 bits — log2(3) fewer doubling rounds, i.e. ~1.6 fewer
    // corpus-wide shuffles, at every scale; both packs rank identically
    // against the final suffix order, so the switch is invisible to the
    // oracle).
    val statsRow = d.agg(max(length(col("text"))),
      min(when(col("text").rlike("^[\\x00-\\x7F]*$"), 1).otherwise(0)))
      .collect()(0)
    val maxLen = if (statsRow.isNullAt(0)) 0 else statsRow.getInt(0)
    if (maxLen == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id LONG, p LONG, suffix_rank LONG"))
    val m = if (statsRow.getInt(1) == 1) 9 else 3

    // round 0: rank by the first m characters at once, packed into one
    // order-preserving long per position (0-padded past the doc end so a
    // prefix sorts before its extensions) by the O(len) rolling kernel —
    // the HOF transform it replaces paid an O(position) substring walk
    // per char (O(len^2) per document).
    val initial = d
      .select(col("doc_id"),
        posexplode(expr(s"graft_sa_init_keys(text, $m)")).as(Seq("p0", "key0")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"),
        col("key0").as("r1"), lit(-1L).as("r2"))
    var (cur, curRelease, active) = baseRank(initial, refineMode = false)
    // narrow doc-length table for the broadcast pairing's end-of-doc probe
    val lens = d.select(col("doc_id"), length(col("text")).cast("long").as("len"))

    // Rounds run while any group is still tied and the doubled depth can
    // still distinguish something. Identical cross-doc suffixes stay tied
    // (and active) forever by design — their rounds cost only the tiny
    // stuck set, and k < maxLen bounds the loop.
    var k = m.toLong
    while (k < maxLen && active > 0) {
      val small = active <= broadcastPairLimit
      val paired =
        if (small) pairedActiveBroadcast(cur, lens, k)
        else pairedActiveWalk(cur, k)
      // small active sets refine LAZILY with per-group local walks (zero
      // extra jobs — the merged checkpoint below is the materialization,
      // and an accumulator carries the surviving-active count out of it);
      // large ones keep the sampled range partitioning, which can split a
      // hot group across partitions via the r2 key.
      val actAcc =
        if (small) Some(spark.sparkContext.longAccumulator("sa_active")) else None
      val (upd, updRelease, updActive) =
        if (small) (refineLocal(paired, actAcc.get), () => (), -1L)
        else baseRank(paired, refineMode = true)
      // resolved rows keep their (final) base; refined actives replace.
      val merged = cur.where(!col("act"))
        .select("doc_id", "p", "base", "act")
        .union(upd.select("doc_id", "p", "base", "act"))
      val (next, nextRdd) = Dedup.checkpointOwned(merged) // eager
      updRelease() // upd's checkpoint: consumed by the merged checkpoint
      curRelease() // previous round's checkpoint: superseded
      cur = next
      curRelease = () => nextRdd.foreach(_.unpersist(blocking = false))
      // the eager checkpoint above ran the refine walk, so the accumulator
      // holds the surviving-active count; a task RETRY can only inflate
      // it, which at worst runs an extra (tiny) no-op round — it can
      // never corrupt ranks or end the loop early.
      active = if (updActive >= 0) updActive else actAcc.get.value
      k *= 2
    }

    // densify: suffix_rank = 1-based dense rank of base. base order ==
    // suffix order with ties exactly on equal groups, so this is a pure
    // representation change, verified by the oracle's raw suffix sort.
    val (out, _, _) = denseRank(
      cur.select(col("doc_id"), col("p"), col("base").as("r1"),
        lit(-1L).as("r2")))
    curRelease() // the dense result is checkpointed; the base frame is dead
    out
  }

  /** Pairing, full-frame walk form: (doc_id, p, r1 = base[p],
    * r2 = base[p+k] or -1 past the doc end) for every ACTIVE row.
    * Positions are DENSE per document (1..len — every round keeps all of
    * them), so the distance-k lookup needs no (doc_id, p) self-join: ONE
    * doc-keyed exchange + in-partition sort, then a per-doc array walk
    * emits both ranks in-row. The walk buffers one document's bases at a
    * time (len longs — the same per-doc bound round 0's key array already
    * sets; the windowed `lead` alternative was measured 56% SLOWER because
    * WindowExec buffers rows as UnsafeRows per frame). */
  private def pairedActiveWalk(cur: DataFrame, k: Long): DataFrame = {
    val spark = cur.sparkSession
    import spark.implicits._
    cur.select(col("doc_id"), col("p"), col("base"), col("act"))
      .repartition(col("doc_id"))
      .sortWithinPartitions(col("doc_id"), col("p"))
      .as[(Long, Long, Long, Boolean)]
      .mapPartitions { it =>
        val bit = it.buffered
        new Iterator[(Long, Long, Long, Long)] {
          private var doc = 0L
          private var bases: Array[Long] = Array.emptyLongArray
          private var acts: Array[Boolean] = new Array[Boolean](0)
          private var len = 0
          private var emit = 0
          private def advance(): Boolean = {
            while (emit < len && !acts(emit)) emit += 1
            emit < len
          }
          override def hasNext: Boolean = {
            while (!advance()) {
              if (!bit.hasNext) return false
              // buffer the next document (rows arrive p-sorted, 1..len)
              doc = bit.head._1
              var ba = bases // reuse buffers when they fit
              var ac = acts
              var n = 0
              while (bit.hasNext && bit.head._1 == doc) {
                val row = bit.next()
                val idx = (row._2 - 1).toInt
                if (idx >= ba.length) {
                  val cap = math.max(math.max(64, ba.length * 2), idx + 1)
                  ba = java.util.Arrays.copyOf(ba, cap)
                  ac = java.util.Arrays.copyOf(ac, cap)
                }
                ba(idx) = row._3
                ac(idx) = row._4
                if (idx + 1 > n) n = idx + 1
              }
              bases = ba; acts = ac; len = n; emit = 0
            }
            true
          }
          override def next(): (Long, Long, Long, Long) = {
            val i = emit
            emit += 1
            val r2 = if (i + k < len) bases((i + k).toInt) else -1L
            (doc, (i + 1).toLong, bases(i), r2)
          }
        }
      }
      .toDF("doc_id", "p", "r1", "r2")
  }

  /** Pairing, small-active form: the active rows broadcast as the build
    * side of two hash joins and the big frames only STREAM — no exchange
    * or sort of the corpus-sized frame at all. The r2 lookup probes
    * (doc, p + k) against the full frame; active rows whose p + k falls
    * past the doc end (no frame row) are recovered by probing the narrow
    * doc-length table instead of re-streaming the frame. */
  private def pairedActiveBroadcast(cur: DataFrame, lens: DataFrame,
                                    k: Long): DataFrame = {
    val a = cur.where(col("act"))
      .select(col("doc_id"), col("p"), col("base").as("r1"))
    val probe = a.select(col("doc_id").as("pd"), (col("p") + k).as("pk"),
      col("p").as("pp"), col("r1").as("pr1"))
    val hit = cur
      .join(broadcast(probe),
        col("doc_id") === col("pd") && col("p") === col("pk"))
      .select(col("doc_id"), col("pp").as("p"), col("pr1").as("r1"),
        col("base").as("r2"))
    val miss = lens
      .join(broadcast(probe), col("doc_id") === col("pd") &&
        col("pk") > col("len"))
      .select(col("doc_id"), col("pp").as("p"), col("pr1").as("r1"),
        lit(-1L).as("r2"))
    hit.union(miss)
  }

  /** Small-active-set refinement: groups hash-partition WHOLE by r1 (the
    * old group base), so base = r1 + (rows before the row's (r1, r2)
    * block within the group) and act = (shares key with a neighbor) are
    * both partition-local — no global offsets, no carry chain, no
    * sampling pass, and the frame is returned LAZY so the caller's merged
    * checkpoint is its only materialization. The trade-off against the
    * range form is that a single tied group lands in one task (fine below
    * [[BroadcastPairLimit]] rows; the large-active path keeps the sampled
    * range partitioning that can split hot groups by r2). */
  private def refineLocal(paired: DataFrame,
                          actAcc: org.apache.spark.util.LongAccumulator): DataFrame = {
    val spark = paired.sparkSession
    import spark.implicits._
    paired.select(col("doc_id"), col("p"), col("r1"), col("r2"))
      .repartition(col("r1"))
      .sortWithinPartitions(col("r1"), col("r2"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        new Iterator[(Long, Long, Long, Boolean)] {
          private var held: (Long, Long) = null // (doc_id, p)
          private var heldBase = 0L
          private var heldSharesPrev = false
          private var heldKey: (Long, Long) = null
          private var localPos = 0L    // partition-local row index
          private var groupStart = 0L  // local start of current r1 group
          private var blockStart = 0L  // local start of current key block
          private var out: (Long, Long, Long, Boolean) = null
          private def step(): Boolean = {
            while (out == null && it.hasNext) {
              val (docId, p, r1, r2) = it.next()
              val key = (r1, r2)
              if (held == null) {
                groupStart = localPos
                blockStart = localPos
                held = (docId, p); heldKey = key
                heldSharesPrev = false
                heldBase = r1 + (blockStart - groupStart)
              } else {
                val same = key == heldKey
                if (heldSharesPrev || same) actAcc.add(1L)
                out = (held._1, held._2, heldBase, heldSharesPrev || same)
                if (!same) {
                  if (key._1 != heldKey._1) groupStart = localPos
                  blockStart = localPos
                }
                held = (docId, p); heldKey = key
                heldSharesPrev = same
                heldBase = r1 + (blockStart - groupStart)
              }
              localPos += 1
            }
            if (out == null && held != null) { // flush the last held row
              if (heldSharesPrev) actAcc.add(1L)
              out = (held._1, held._2, heldBase, heldSharesPrev)
              held = null
            }
            out != null
          }
          override def hasNext: Boolean = out != null || step()
          override def next(): (Long, Long, Long, Boolean) = {
            if (!hasNext) throw new NoSuchElementException
            val r = out; out = null; r
          }
        }
      }
      .toDF("doc_id", "p", "base", "act")
  }

  /** Distributed group-base rank of rows (doc_id, p, r1, r2) by (r1, r2).
    *
    * refineMode = false (round 0): ranks ALL rows globally —
    * base = |{rows with strictly smaller key}|, act = key shared.
    *
    * refineMode = true: the input is the paired ACTIVE rows of tied
    * groups, r1 = the group's old base (shared by the whole group),
    * r2 = the distance-k rank; each (r1, r2) sub-block refines to
    * base = r1 + (rows before the sub-block within its group). Resolved
    * rows are absent and unaffected (their base cannot change — see the
    * class doc), which is what shrinks the pass to the active set.
    *
    * Both modes: range-partition + in-partition sort colocates equal keys
    * and orders groups contiguously; pass 1 collects ONE summary row per
    * partition (row count, active-row count, first/last group and the
    * local start of the last group's run — the carry chain for groups
    * spanning partitions); pass 2 walks with broadcast offsets/carries
    * and a one-row delay so act = (shares key with prev or next) needs no
    * block buffering. Returns the checkpointed frame
    * (doc_id, p, base, act) — in refine mode only the refreshed active
    * rows — a release thunk the caller invokes once the frame's consumer
    * has materialized, and the surviving active-row count. */
  private def baseRank(input: DataFrame, refineMode: Boolean)
      : (DataFrame, () => Unit, Long) = {
    val spark = input.sparkSession
    import spark.implicits._
    val parted = input
      .select(col("doc_id"), col("p"), col("r1"), col("r2"))
      .repartitionByRange(col("r1"), col("r2"))
      .sortWithinPartitions(col("r1"), col("r2"))
      .persist()

    // pass 1: per-partition summaries, one small tuple each:
    // (pid, nRows, activeRows, firstR1, lastR1, lastRunStart)
    val summaries = parted.select(col("r1"), col("r2")).as[(Long, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var n = 0L
        var activeRows = 0L
        var firstR1 = 0L
        var lastR1 = 0L
        var lastRunStart = 0L
        var prev: (Long, Long) = null
        var prevR1 = Long.MinValue
        var blockLen = 0L
        while (it.hasNext) {
          val cur = it.next()
          if (n == 0) firstR1 = cur._1
          if (cur._1 != prevR1) { lastRunStart = n; prevR1 = cur._1 }
          if (prev != null && cur == prev) {
            blockLen += 1
            if (blockLen == 2) activeRows += 2 else activeRows += 1
          } else blockLen = 1
          prev = cur
          lastR1 = cur._1
          n += 1
        }
        if (n == 0) Iterator.empty
        else Iterator.single((pid, n, activeRows, firstR1, lastR1, lastRunStart))
      }.collect().sortBy(_._1)

    // driver: global row offsets + the group-start carry chain (a group's
    // rows are contiguous across the range-partitioned order, so one
    // (currentGroup, itsGlobalStart) cursor suffices)
    val nParts = parted.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    val carryStarts = new Array[Long](nParts)
    var total = 0L
    var activeTotal = 0L
    var curGroup = Long.MinValue
    var curStart = 0L
    for ((pid, n, act, firstR1, lastR1, lastRunStart) <- summaries) {
      offsets(pid) = total
      carryStarts(pid) =
        if (firstR1 == curGroup) curStart else total
      if (firstR1 == lastR1 && firstR1 == curGroup) {
        // whole partition continues the current group: keep curStart
      } else {
        curGroup = lastR1
        curStart = total + lastRunStart
      }
      total += n
      activeTotal += act
    }
    val offB = spark.sparkContext.broadcast(offsets)
    val carryB = spark.sparkContext.broadcast(carryStarts)

    // pass 2: assign bases with a one-row delay for the act flag
    val ranked = parted.as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val offset = offB.value(pid)
        val carry = carryB.value(pid)
        new Iterator[(Long, Long, Long, Boolean)] {
          // one-row delay: emit held once the next row reveals its act
          private var held: (Long, Long) = null // (doc_id, p)
          private var heldBase = 0L
          private var heldSharesPrev = false
          private var heldKey: (Long, Long) = null
          private var rowPos = offset       // global position of NEXT input row
          private var groupStart = carry    // global start of current r1 group
          private var blockStart = 0L       // global start of current key block
          private var out: (Long, Long, Long, Boolean) = null
          private def baseOf(key: (Long, Long)): Long =
            if (refineMode) key._1 + (blockStart - groupStart) else blockStart
          private def step(): Boolean = {
            while (out == null && it.hasNext) {
              val (docId, p, r1, r2) = it.next()
              val key = (r1, r2)
              if (held == null) {
                // first row of the partition starts a fresh block; its
                // group may have begun in an earlier partition — the
                // initial groupStart is the broadcast carry
                blockStart = rowPos
                held = (docId, p); heldKey = key
                heldSharesPrev = false
                heldBase = baseOf(key)
              } else {
                val same = key == heldKey
                out = (held._1, held._2, heldBase, heldSharesPrev || same)
                if (!same) {
                  if (refineMode && key._1 != heldKey._1)
                    groupStart = rowPos
                  blockStart = rowPos
                }
                held = (docId, p); heldKey = key
                heldSharesPrev = same
                heldBase = baseOf(key)
              }
              rowPos += 1
            }
            if (out == null && held != null) { // flush the last held row
              out = (held._1, held._2, heldBase, heldSharesPrev)
              held = null
            }
            out != null
          }
          override def hasNext: Boolean = out != null || step()
          override def next(): (Long, Long, Long, Boolean) = {
            if (!hasNext) throw new NoSuchElementException
            val r = out; out = null; r
          }
        }
      }
      .toDF("doc_id", "p", "base", "act")
    // eager localCheckpoint materializes before parted is released. This
    // must stay EAGER even in refine mode: pass 2 reads its partition id
    // from TaskContext, which would be union-shifted if the frame first
    // materialized inside the caller's merged union. The refine-mode
    // checkpoint covers only the active rows, so the extra pass is small.
    val (ck, handle) = Dedup.checkpointOwned(ranked)
    parted.unpersist()
    (ck, () => handle.foreach(_.unpersist(blocking = false)), activeTotal)
  }

  /** Distributed dense rank of rows (doc_id, p, r1, r2) by (r1, r2):
    * returns ((doc_id, p, suffix_rank) localCheckpoint-ed with its owned
    * RDD handle — [[Dedup.checkpointOwned]]'s round discipline — plus the
    * number of distinct keys). Equal keys are colocated by the range
    * partitioner, so local walks + prefix-summed per-partition distinct
    * counts give the global dense rank with only one Long per partition
    * on the driver. Used for the final base -> dense conversion. */
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
