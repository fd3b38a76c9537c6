package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** True streaming sessionization: custom per-key state via
  * flatMapGroupsWithState (the streaming twin of EventOps.sessionize's
  * batch window form).
  *
  * State per user = the single open session; closed sessions are emitted
  * either when a new event arrives past the gap, or when the event-time
  * watermark passes lastTs+gap (timeout). State is O(users), bounded by
  * the watermark — the 100 TB-safe shape.
  */
object SessionizeStream {

  case class SessEvent(user_id: Long, event_id: Long, ts: Timestamp)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, sessId: Long)
  case class Session(user_id: Long, sess_id: Long, n_events: Long,
      sess_start: Timestamp, sess_end: Timestamp)

  val GapUs: Long = 1800L * 1000000L

  private def toUs(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  private def emit(uid: Long, s: OpenSession): Session =
    Session(uid, s.sessId, s.n, toTs(s.startUs), toTs(s.lastUs))

  def update(uid: Long, events: Iterator[SessEvent],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // watermark passed lastTs+gap with no new events: session is final
      val out = state.getOption.map(emit(uid, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toArray.sortBy(e => (toUs(e.ts), e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val us = toUs(e.ts)
      open match {
        case Some(s) if us - s.lastUs <= GapUs =>
          open = Some(s.copy(lastUs = math.max(s.lastUs, us), n = s.n + 1))
        case Some(s) =>
          closed += emit(uid, s)
          open = Some(OpenSession(us, us, 1, s.sessId + 1))
        case None =>
          open = Some(OpenSession(us, us, 1, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastUs / 1000 + GapUs / 1000) // ms
    }
    closed.result().iterator
  }

  /** events must carry a watermark on `ts` when streaming. */
  def apply(events: Dataset[SessEvent]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
