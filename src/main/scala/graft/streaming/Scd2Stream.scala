package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** True incremental SCD type-2: the streaming twin of `EventOps.scd2`'s
  * batch backfill (S13).
  *
  * State per entity = the single OPEN version (current state, effective
  * from, version counter). A state change closes the open version — it is
  * emitted append-only with its now-complete [eff_from, eff_to) interval —
  * and opens the next. Same-state events extend the run and emit nothing.
  * The open version never expires (an SCD2 current row is current until
  * superseded), so no timeout is registered and state stays O(entities) —
  * the 100 TB-safe shape, same as ProductSync.
  *
  * Arrival is assumed per-entity ordered across micro-batches (the
  * standard CDC-source contract); within a batch events are sorted by
  * event time. The spec proves the emitted closed rows equal exactly the
  * batch backfill's eff_to-non-null rows, including versions that close
  * across batch boundaries.
  */
object Scd2Stream {

  case class StateEvent(user_id: Long, event_id: Long, ts: Timestamp,
      event_type: String)
  case class OpenVersion(state: String, fromUs: Long, version: Long)
  case class ClosedVersion(user_id: Long, version: Long, state: String,
      eff_from: Timestamp, eff_to: Timestamp)

  private def toUs(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  def update(uid: Long, events: Iterator[StateEvent],
      state: GroupState[OpenVersion]): Iterator[ClosedVersion] = {
    val sorted = events.toArray.sortBy(e => (toUs(e.ts), e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedVersion]
    sorted.foreach { e =>
      val us = toUs(e.ts)
      open match {
        case Some(o) if o.state == e.event_type => () // same-state run extends
        case Some(o) =>
          closed += ClosedVersion(uid, o.version, o.state, toTs(o.fromUs), toTs(us))
          open = Some(OpenVersion(e.event_type, us, o.version + 1))
        case None =>
          open = Some(OpenVersion(e.event_type, us, 1L))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  def apply(events: Dataset[StateEvent]): Dataset[ClosedVersion] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenVersion, ClosedVersion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
