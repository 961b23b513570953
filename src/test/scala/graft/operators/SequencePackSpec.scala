package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SequencePackSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, Long)], cap: Long, shift: Int = 12) =
    SequencePack.packStats(docs.toDF("doc_id", "n"), "doc_id", "n", cap,
        groupShift = shift)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("start_offset"), r.getAs[Long]("first_seq"),
          r.getAs[Long]("last_seq"), r.getAs[Long]("n_seqs"))))
      .toMap

  /** The naive sequential rule the operator must equal exactly. */
  private def naive(docs: Seq[(Long, Long)], cap: Long) = {
    var s = 0L
    docs.sortBy(_._1).map { case (id, n) =>
      val first = s / cap
      val last = (s + math.max(n, 1) - 1) / cap
      val r = id -> ((s, first, last, if (n == 0) 0L else last - first + 1))
      s += n
      r
    }.toMap
  }

  test("hand-checked placement: spanning docs, exact-fit boundaries, zero-token docs") {
    // cap 10: doc1 [0,4) seq0; doc2 [4,14) spans seq0-1; doc3 zero-token at
    // 14 (seq1, 0 seqs); doc4 [14,20) exactly fills seq1; doc5 [20,21) seq2
    val d = Seq((1L, 4L), (2L, 10L), (3L, 0L), (4L, 6L), (5L, 1L))
    val got = run(d, 10L)
    assert(got(1L) == ((0L, 0L, 0L, 1L)))
    assert(got(2L) == ((4L, 0L, 1L, 2L)))
    assert(got(3L) == ((14L, 1L, 1L, 0L)))
    assert(got(4L) == ((14L, 1L, 1L, 1L)))
    assert(got(5L) == ((20L, 2L, 2L, 1L)))
    assert(got == naive(d, 10L))
  }

  test("randomized equivalence vs the naive sequential rule across leaf widths") {
    val rnd = new scala.util.Random(17)
    for (shift <- Seq(0, 1, 3, 12, 63)) {
      val ids = rnd.shuffle((-60L until 90L).toList)
      val d = ids.map(i => (i, rnd.nextInt(40).toLong))
      for (cap <- Seq(1L, 7L, 64L))
        assert(run(d, cap, shift) == naive(d, cap), s"shift=$shift cap=$cap")
    }
  }

  test("membership explode emits one row per spanned sequence") {
    val d = Seq((1L, 4L), (2L, 10L), (3L, 0L), (4L, 6L), (5L, 1L))
    val m = SequencePack.sequenceMembership(d.toDF("doc_id", "n"),
        "doc_id", "n", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(m == Seq((1L, 0L), (2L, 0L), (2L, 1L), (4L, 1L), (5L, 2L)))
  }

  test("total stream length is conserved") {
    val d = (0L until 500L).map(i => (i, (i * 7 % 23)))
    val stats = run(d, 97L)
    val maxDoc = d.maxBy(_._1)
    assert(stats(maxDoc._1)._1 + 0L == d.sortBy(_._1).dropRight(1).map(_._2).sum)
  }

  test("packPairsWithMasks: loss interval is the completion's token span; " +
       "completion-less rows get a null mask span but occupy stream space") {
    // cap 10: pair 1 (3+4) [0,7) loss [3,7) seq 0; pair 2 (5+0) [7,12)
    // loss empty; pair 3 (2+9) [12,23) loss [14,23) spans seqs 1-2,
    // mask seqs 1-2
    val pairs = Seq((1L, 3L, 4L), (2L, 5L, 0L), (3L, 2L, 9L))
      .toDF("pair_id", "np", "nc")
    val out = SequencePack
      .packPairsWithMasks(pairs, "pair_id", "np", "nc", cap = 10L)
      .orderBy("pair_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7),
        if (r.isNullAt(8)) -1L else r.getLong(8),
        if (r.isNullAt(9)) -1L else r.getLong(9)))
    assert(out(0) == ((1L, 0L, 3L, 7L, 0L, 0L, 0L, 0L)))
    assert(out(1) == ((2L, 7L, 12L, 12L, 0L, 1L, -1L, -1L)))
    assert(out(2) == ((3L, 12L, 14L, 23L, 1L, 2L, 1L, 2L)))
  }
}
