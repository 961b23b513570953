package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with custom state
  * (`flatMapGroupsWithState` + event-time timeout) — the streaming form of
  * the batch ev01 sessionize query (lag/gap/running-sum windows): a session
  * is a run of events for one user with no gap larger than `gapSeconds`.
  *
  * State per user is ONE open session (bounded memory: four longs/doubles —
  * no event buffering). Within a batch, events AND the open session are
  * merged as interval fragments in start order, closing and emitting every
  * fragment but the last whenever a gap is exceeded — late events within
  * gap of the open session extend it backward; later ones become separate,
  * immediately-closed earlier sessions. The surviving open session is
  * stored with an event-time timeout at `session_end + gap` (or emitted at
  * once when the watermark already passed that point). When the watermark
  * passes the timeout the state fires and the closed session is emitted —
  * exactly-once, append-mode output. At cluster scale the state store
  * shards by user hash; no executor ever sees more than its shard of open
  * sessions.
  */
object StreamingSessionize {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class OpenSession(startMs: Long, endMs: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long,
                           sum_value: Double)

  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapSeconds: Long, lateness: String): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, batch: Iterator[Event], state: GroupState[OpenSession]) => {
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed end+gap: the open session is final
            val s = state.get
            state.remove()
            Iterator(toSession(user, s))
          } else {
            // Late-but-accepted events (ts in [watermark, session start) —
            // Spark drops only rows strictly behind the watermark) may
            // predate the open session, so a forward-only merge is wrong.
            // Instead every event and the open session become interval
            // fragments, sorted by start; adjacent fragments within the gap
            // merge — which extends the open session BACKWARD when a late
            // event lands within gap of its start, and lets a chain of late
            // events bridge into it.
            val frags = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
            state.getOption.foreach(frags += _)
            batch.foreach(e =>
              frags += OpenSession(e.ts.getTime, e.ts.getTime, 1L, e.value))
            val merged = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
            frags.sortBy(f => (f.startMs, f.endMs)).foreach { f =>
              if (merged.nonEmpty && f.startMs - merged.last.endMs <= gapMs) {
                val l = merged.last
                merged(merged.size - 1) = OpenSession(l.startMs,
                  math.max(l.endMs, f.endMs), l.n + f.n, l.sum + f.sum)
              } else merged += f
            }
            if (merged.isEmpty) Iterator.empty
            else {
              val closed = merged.init.map(toSession(user, _))
              val last = merged.last
              // A timeout at or below the watermark would throw and kill the
              // query — reachable when lateness > gap. The session is final
              // by definition then: emit it now instead of storing it.
              if (last.endMs + gapMs <= state.getCurrentWatermarkMs()) {
                state.remove()
                (closed :+ toSession(user, last)).iterator
              } else {
                state.update(last)
                state.setTimeoutTimestamp(last.endMs + gapMs)
                closed.iterator
              }
            }
          }
        })
  }

  private def toSession(user: Long, s: OpenSession): Session =
    Session(user, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs),
      s.n, s.sum)
}
