package graft.sources

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Cursor-range chunking edge matrix: timestamp cursors, heavy duplicate
  * skew, NULL cursors, and the string fallback — every case must cover the
  * input exactly with plain filter plans (the plan property itself is
  * locked in PlanAuditSpec). */
class ChunkerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("timestamp cursor: range chunks cover exactly") {
    val rows = (1 to 100).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00")))
    val df = rows.toDF("id", "ts")
    val chunks = Chunker.rangeChunks(df, "ts", 30).toSeq
    assert(chunks.size > 1)
    assert(chunks.map(_.count()).sum == 100)
    assert(chunks.flatMap(_.select("id").as[Long].collect()).sorted == (1L to 100L))
  }

  test("heavy duplicate skew collapses boundaries but never loses rows") {
    // 90 rows share one cursor value: at most distinct-boundary chunks
    val df = ((1 to 90).map(_ => 5L) ++ Seq(1L, 9L)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val chunks = Chunker.rangeChunks(df, "v", 10).toSeq
    assert(chunks.map(_.count()).sum == 92)
  }

  test("NULL cursors ride in the first chunk; all-null falls back to one chunk") {
    val some = (1 to 40).map(i => (i.toLong, if (i % 4 == 0) None else Some(i.toLong)))
      .toDF("id", "v")
    val chunks = Chunker.rangeChunks(some, "v", 10).toSeq
    assert(chunks.map(_.count()).sum == 40)
    // nulls are all in chunk 0
    assert(chunks.head.where($"v".isNull).count() == 10)
    assert(chunks.tail.map(_.where($"v".isNull).count()).sum == 0)

    val allNull = (1 to 30).map(i => (i.toLong, None: Option[Long])).toDF("id", "v")
    val nullChunks = Chunker.rangeChunks(allNull, "v", 10).toSeq
    assert(nullChunks.size == 1 && nullChunks.head.count() == 30)
  }

  test("string cursor falls back to a single chunk") {
    val df = (1 to 50).map(i => (i.toLong, s"k$i")).toDF("id", "k")
    val chunks = Chunker.rangeChunks(df, "k", 10).toSeq
    assert(chunks.size == 1)
    assert(chunks.head.count() == 50)
  }
}
