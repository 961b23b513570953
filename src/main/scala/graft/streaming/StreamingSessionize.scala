package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with custom state
  * (`flatMapGroupsWithState` + event-time timeout) — the streaming form of
  * the batch ev01 sessionize query (lag/gap/running-sum windows): a session
  * is a run of events for one user with no gap larger than `gapSeconds`.
  *
  * State per user is ONE open session (bounded memory: four longs/doubles —
  * no event buffering). Within a batch, events are folded in timestamp
  * order, closing and emitting sessions whenever the gap is exceeded; the
  * surviving open session is stored with an event-time timeout at
  * `session_end + gap`. When the watermark passes that point the state
  * times out and the closed session is emitted — exactly-once, append-mode
  * output. At cluster scale the state store shards by user hash; no
  * executor ever sees more than its shard of open sessions.
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
            val closed = scala.collection.mutable.ListBuffer.empty[Session]
            var open = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              open = open match {
                case Some(s) if t - s.endMs <= gapMs =>
                  Some(OpenSession(s.startMs, math.max(s.endMs, t), s.n + 1,
                    s.sum + e.value))
                case Some(s) => // gap exceeded: close, start fresh
                  closed += toSession(user, s)
                  Some(OpenSession(t, t, 1L, e.value))
                case None => Some(OpenSession(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.iterator
          }
        })
  }

  private def toSession(user: Long, s: OpenSession): Session =
    Session(user, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs),
      s.n, s.sum)
}
