package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.SessionizeStream
import graft.streaming.SessionizeStream.SessEvent

class SessionizeStreamSpec extends SparkSpecBase {

  private val base = 1704067200L // 2024-01-01, past the initial watermark
  private def ev(id: Long, offSec: Long, user: Long) =
    SessEvent(user, id, new Timestamp((base + offSec) * 1000L))

  test("flatMapGroupsWithState sessionization closes sessions on gap and timeout") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[SessEvent]
    // user 1: two events 10 min apart (one session), then one 50 min later
    // (gap > 30 min -> new session)
    mem.addData(ev(1, 0, 1), ev(2, 600, 1), ev(3, 3600, 1))
    // a far-future event pushes the watermark so user 1's open session
    // times out and is emitted as final
    mem.addData(ev(9, 6 * 3600, 2))

    val q = SessionizeStream(mem.toDS().withWatermark("ts", "1 minute"))
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val rows = s.table("sess_out")
      .orderBy("user_id", "sess_id").collect()
    val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length == 2, s"got ${rows.toSeq}")
    assert(u1(0).getAs[Long]("n_events") == 2) // the 0s + 600s pair
    assert(u1(1).getAs[Long]("n_events") == 1) // the 3600s singleton, closed by timeout
    assert(u1(0).getAs[Timestamp]("sess_end").getTime == (base + 600) * 1000L)
  }

  test("stream sessions agree with the batch window formulation") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val events = Seq(ev(1, 0, 5), ev(2, 100, 5), ev(3, 5000, 5), ev(4, 0, 6))
    val mem = MemoryStream[SessEvent]
    mem.addData(events: _*)
    mem.addData(ev(99, 10 * 3600, 7)) // close everything via watermark
    val q = SessionizeStream(mem.toDS().withWatermark("ts", "1 minute"))
      .writeStream.format("memory").queryName("sess_eq").outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val streamed = s.table("sess_eq")
      .filter($"user_id".isin(5L, 6L))
      .select("user_id", "sess_id", "n_events", "sess_start", "sess_end")
      .orderBy("user_id", "sess_id").collect().toSeq
    val batch = graft.streaming.EventOps.sessionize(
        events.toDF("user_id", "event_id", "ts"))
      .select("user_id", "sess_id", "n_events", "sess_start", "sess_end")
      .orderBy("user_id", "sess_id").collect().toSeq
    assert(streamed == batch)
  }
}
