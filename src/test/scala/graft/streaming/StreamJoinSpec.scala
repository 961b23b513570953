package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

final case class Impression(imp_id: Long, user_id: Long, imp_ts: Timestamp)
final case class Click(click_id: Long, imp_id: Long, click_ts: Timestamp)

/** Watermarked stream-stream attribution join: in-window clicks match,
  * out-of-window clicks don't, and the left-outer variant emits unmatched
  * impressions only after the watermark proves no click can still come. */
class StreamJoinSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inner attribution: only clicks inside the window match") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clks = MemoryStream[Click]
    val query = StreamJoin.attributedClicks(imps.toDF(), clks.toDF(),
        withinSeconds = 600)
      .writeStream.format("memory").queryName("attr_inner")
      .outputMode("append").start()
    try {
      imps.addData(
        Impression(10L, 1L, ts("2024-01-01 10:00:00")),
        Impression(20L, 2L, ts("2024-01-01 10:00:00")))
      clks.addData(
        Click(100L, 10L, ts("2024-01-01 10:05:00")), // in window
        Click(200L, 20L, ts("2024-01-01 10:20:00")), // past the 10-min window
        Click(300L, 99L, ts("2024-01-01 10:01:00"))) // no such impression
      query.processAllAvailable()
      val rows = spark.table("attr_inner")
        .select("imp_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((10L, 100L)))
    } finally query.stop()
  }

  test("left-outer emits unmatched impressions once the watermark closes the window") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clks = MemoryStream[Click]
    val query = StreamJoin.attributedClicks(imps.toDF(), clks.toDF(),
        withinSeconds = 600, joinType = "left_outer")
      .writeStream.format("memory").queryName("attr_outer")
      .outputMode("append").start()
    try {
      imps.addData(
        Impression(10L, 1L, ts("2024-01-01 10:00:00")),
        Impression(20L, 2L, ts("2024-01-01 10:00:00")))
      clks.addData(Click(100L, 10L, ts("2024-01-01 10:05:00")))
      query.processAllAvailable()
      // matched row flows immediately; imp 20 must NOT surface yet — a
      // click could still arrive inside its window
      val early = spark.table("attr_outer").collect()
      assert(early.map(_.getLong(0)).toSet == Set(10L))

      // advance BOTH watermarks far past imp 20's window
      imps.addData(Impression(90L, 9L, ts("2024-01-01 12:00:00")))
      clks.addData(Click(900L, 90L, ts("2024-01-01 12:00:01")))
      query.processAllAvailable()
      clks.addData(Click(901L, 91L, ts("2024-01-01 13:00:00")))
      imps.addData(Impression(91L, 9L, ts("2024-01-01 13:00:00")))
      query.processAllAvailable()

      val rows = spark.table("attr_outer")
        .select("imp_id", "click_id").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(rows.contains((10L, Some(100L))))
      assert(rows.contains((20L, None))) // emitted with null click, exactly once
      val imp20 = spark.table("attr_outer").where("imp_id = 20").collect()
      assert(imp20.length == 1 && imp20.head.isNullAt(3))
    } finally query.stop()
  }
}
