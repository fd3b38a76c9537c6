package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of S15 (`EventOps.valueAnomaly`): the trailing-window
  * z-score is CAUSAL (each event scores against its user's previous W
  * values only), so the stream holds exactly the last W values per user —
  * O(users · W) state, independent of stream length — and emits the same
  * flag the batch window computes.
  *
  * Float parity with the batch form: the batch passes values through
  * DECIMAL(18,6) so windowed sums are exact; the fold keeps the window as
  * 6dp BigDecimals and sums them exactly, then derives mean/σ² through
  * the same IEEE expression shape — the spec pins stream ≡ batch on every
  * row, including windows straddling a batch boundary.
  *
  * Ordering contract: per-user event time must not regress across
  * batches (the same source-ordering assumption the other folds make —
  * see IngestDedup); within a batch the fold sorts by (ts, event_id).
  */
object AnomalyStream {

  case class Ev(event_id: Long, user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Win(values: List[java.math.BigDecimal])
  case class Flag(event_id: Long, user_id: Long, value: Double,
      mean: Double, sigma: Double, is_anomaly: Boolean)

  private def d6(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)

  private def update(w: Int, z: Double)(user: Long, evs: Iterator[Ev],
      state: GroupState[Win]): Iterator[Flag] = {
    val ordered = evs.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    var win = state.getOption.map(_.values).getOrElse(Nil) // newest first
    val out = scala.collection.mutable.ListBuffer.empty[Flag]
    ordered.foreach { e =>
      val frame = win.take(w)
      if (frame.length >= 3) {
        val n = frame.length
        val sum = frame.reduce(_.add(_)).doubleValue
        val sumsq = frame.map(x => x.multiply(x)).reduce(_.add(_)).doubleValue
        val mean = sum / n
        val varr = math.max(0.0, (sumsq - sum * sum / n) / (n - 1))
        out += Flag(e.event_id, user, e.value,
          r6(mean), r6(math.sqrt(varr)),
          math.abs(e.value - mean) > z * math.sqrt(varr))
      }
      win = (d6(e.value) :: win).take(w)
    }
    state.update(Win(win))
    out.iterator
  }

  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  def apply(events: Dataset[Ev], w: Int = 10, z: Double = 3.0): Dataset[Flag] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Win, Flag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update(w, z))
  }
}
