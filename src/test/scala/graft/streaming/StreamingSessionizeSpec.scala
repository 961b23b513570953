package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Gap-sessionization with flatMapGroupsWithState: sessions close either
  * in-batch (gap exceeded by a newer event) or by event-time timeout when
  * the watermark passes session_end + gap. */
class StreamingSessionizeSpec extends AnyFunSuite with SparkSpec {
  import StreamingSessionize._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(u: Long, t: String, v: Double = 1.0) = Event(u, ts(t), v)

  test("sessions close on gap within a batch and on watermark timeout") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val query = sessionize(spark, input.toDS(), gapSeconds = 1800, lateness = "0 seconds")
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      // batch 1: an open 2-event session for user 1, a 1-event for user 2
      input.addData(ev(1, "2024-01-01 10:00:00", 2.0), ev(1, "2024-01-01 10:10:00", 3.0),
        ev(2, "2024-01-01 10:00:00", 5.0))
      query.processAllAvailable()
      // batch 2: user 1 jumps past the gap -> first session closes in-batch;
      // watermark advances to 12:00 -> user 2's (timeout 10:30) times out
      input.addData(ev(1, "2024-01-01 12:00:00", 7.0))
      query.processAllAvailable()
      // batch 3: bump the watermark so the 12:00 session times out too
      input.addData(ev(99, "2024-01-01 14:30:00"))
      query.processAllAvailable()
      input.addData(ev(99, "2024-01-01 16:30:00"))
      query.processAllAvailable()

      val rows = spark.table("sess_out").as[Session].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.sum_value))
        .toSet
      assert(rows.contains((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L, 5.0)))
      assert(rows.contains((2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), 1L, 5.0)))
      assert(rows.contains((1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"), 1L, 7.0)))
      // user 99's 14:30 session closed in-batch by the 16:30 event's gap
      assert(rows.contains((99L, ts("2024-01-01 14:30:00"), ts("2024-01-01 14:30:00"), 1L, 1.0)))
      // the still-open 16:30 session did NOT leak into the append output
      assert(rows.size == 4)
    } finally query.stop()
  }

  test("late-but-accepted events extend a session backward or close as " +
      "separate earlier sessions") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    // gap 30 min, lateness 2 h: events in [watermark, session start) are
    // accepted by the operator (Spark drops only rows strictly behind the
    // watermark) yet predate the open session — the forward-only fold used
    // to swallow them silently into the current session
    val query = sessionize(spark, input.toDS(), gapSeconds = 1800, lateness = "2 hours")
      .writeStream.format("memory").queryName("sess_late").outputMode("append").start()
    try {
      // batch 1: open session [10:00, 10:10] for user 1 -> watermark 08:10
      input.addData(ev(1, "2024-01-01 10:00:00", 2.0), ev(1, "2024-01-01 10:10:00", 3.0))
      query.processAllAvailable()
      // batch 2, both late-but-accepted (>= 08:10 watermark): 09:45 is
      // within gap of the open session's START (extends it backward);
      // 08:20 is > gap earlier (separate earlier session, closed in-batch)
      input.addData(ev(1, "2024-01-01 09:45:00", 4.0), ev(1, "2024-01-01 08:20:00", 1.0))
      query.processAllAvailable()
      // advance the watermark past 10:40 so user 1's open session times out
      input.addData(ev(99, "2024-01-01 13:30:00"))
      query.processAllAvailable()
      input.addData(ev(99, "2024-01-01 16:00:00"))
      query.processAllAvailable()

      val rows = spark.table("sess_late").as[Session].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.sum_value))
        .toSet
      assert(rows.contains((1L, ts("2024-01-01 08:20:00"), ts("2024-01-01 08:20:00"), 1L, 1.0)))
      // backward-extended session: start moved to 09:45, all three events in
      assert(rows.contains((1L, ts("2024-01-01 09:45:00"), ts("2024-01-01 10:10:00"), 3L, 9.0)))
      assert(rows.contains((99L, ts("2024-01-01 13:30:00"), ts("2024-01-01 13:30:00"), 1L, 1.0)))
      assert(rows.size == 3)
    } finally query.stop()
  }
}
