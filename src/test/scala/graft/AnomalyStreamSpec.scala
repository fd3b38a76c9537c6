package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{AnomalyStream, EventOps}
import graft.streaming.AnomalyStream.{Ev, Flag}

/** Streaming anomaly flags: the per-user fold must emit exactly the batch
  * trailing-window flags, including windows that straddle the batch
  * boundary (state carries the last W values across batches). */
class AnomalyStreamSpec extends SparkSpecBase {

  test("stream flags ≡ batch flags, windows straddle the batch boundary") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    def ts(i: Int) = new Timestamp(1704067200000L + i * 1000L)
    // user 1: steady values then a spike after the boundary; user 2 noise
    val batch1 = (0 until 6).map(i => Ev(i.toLong, 1L, ts(i), 10.0 + (i % 3))) ++
      (10 until 14).map(i => Ev(i.toLong, 2L, ts(i), 5.0 * (i - 9)))
    val batch2 = Seq(Ev(6L, 1L, ts(6), 500.0), // spike vs state from batch1
      Ev(7L, 1L, ts(7), 11.0)) ++
      (14 until 17).map(i => Ev(i.toLong, 2L, ts(i), 5.0 * (i - 9)))

    val mem = MemoryStream[Ev]
    val q = AnomalyStream(mem.toDS())
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode("append").start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = s.table("anomaly_out").as[Flag].collect()
      .map(f => (f.event_id, f.user_id, f.value, f.mean, f.sigma, f.is_anomaly))
      .sortBy(_._1).toSeq
    val batch = EventOps.valueAnomaly(
      (batch1 ++ batch2).toDF("event_id", "user_id", "ts", "value"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toSeq
    assert(streamed == batch, s"stream $streamed\nbatch $batch")
    // the cross-boundary spike is flagged from batch-1 state
    val spike = streamed.find(_._1 == 6L).get
    assert(spike._6, s"spike not flagged: $spike")
    // and the stream actually emitted rows before the boundary too
    assert(streamed.exists(_._1 < 6L))
  }
}
