package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventOps

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** The streaming forms of EventOps: same transform, readStream source. */
class StreamingSpec extends SparkSpecBase {

  private def ev(id: Long, sec: Long, user: Long, typ: String, v: Double) =
    Ev(id, new Timestamp((1704067200L + sec) * 1000L), user, typ, v) // base 2024-01-01: epoch-0 events are below Spark's initial watermark

  test("windowAgg under Structured Streaming equals the batch result") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val data = Seq(
      ev(1, 0, 1, "view", 1.0), ev(2, 60, 1, "click", 2.0),
      ev(3, 301, 2, "view", 3.0), ev(4, 302, 2, "purchase", 4.0),
      ev(5, 900, 1, "view", 5.0))

    val mem = MemoryStream[Ev]
    mem.addData(data: _*)
    val q = EventOps.windowAgg(mem.toDF())
      .writeStream.format("memory").queryName("win_out").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streamed = s.table("win_out")
      .orderBy("win_start", "event_type").collect().toSeq
    val batch = EventOps.windowAgg(data.toDF())
      .orderBy("win_start", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty && batch.length == 5) // 3 windows, two split by type
  }

  test("streaming dedup drops replayed events exactly-once") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(ev(1, 0, 1, "view", 1.0), ev(2, 10, 1, "view", 1.0))
    mem.addData(ev(1, 0, 1, "view", 1.0)) // at-least-once replay
    val q = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(s.table("dedup_out").count() == 2)
  }

  test("left-outer interval join: unmatched purchases emit with nulls after the watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val views = Seq(ev(1, 0, 1, "view", 1.0))
    val purchases = Seq(
      ev(10, 600, 1, "purchase", 9.0), // matched: view 1 within the hour
      ev(12, 300, 3, "purchase", 9.0)) // no view EVER → must still emit (nulls)
    val vMem = MemoryStream[Ev]
    val pMem = MemoryStream[Ev]
    vMem.addData(views: _*)
    pMem.addData(purchases: _*)
    val joined = EventOps.attributionJoinOuter(
      vMem.toDF().withWatermark("ts", "10 minutes"),
      pMem.toDF().withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.format("memory").queryName("sso_out")
      .outputMode("append").start()
    q.processAllAvailable()
    // push both watermarks far past the interval bound so the unmatched
    // purchase can be proven unmatched and released from state
    vMem.addData(ev(90, 24 * 3600, 9, "view", 0.0))
    pMem.addData(ev(91, 24 * 3600, 9, "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = s.table("sso_out").filter($"user_id".isin(1L, 3L))
      .orderBy("user_id").collect()
    assert(rows.length == 2, s"got ${rows.toSeq}")
    assert(rows(0).getLong(0) == 1L && rows(0).getLong(3) == 1L) // matched
    assert(rows(1).getLong(0) == 3L && rows(1).isNullAt(3) && rows(1).isNullAt(4))
    // and the streamed relation equals the batch left join on the same data
    val batch = EventOps.attributionJoinOuter(views.toDF(), purchases.toDF())
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(rows.map(_.toString).toSeq == batch)
  }

  test("stream-stream interval join: purchases match prior-hour views, state bounded by watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val views = Seq(ev(1, 0, 1, "view", 1.0), ev(2, 600, 1, "view", 1.0),
      ev(3, 0, 2, "view", 1.0), ev(4, 7200, 1, "view", 1.0))
    val purchases = Seq(ev(10, 1200, 1, "purchase", 9.0), // matches views 1, 2
      ev(11, 7300, 1, "purchase", 9.0),                   // matches view 4 only (1 h bound)
      ev(12, 300, 3, "purchase", 9.0))                    // no view: no row
    val vMem = MemoryStream[Ev]
    val pMem = MemoryStream[Ev]
    vMem.addData(views: _*)
    pMem.addData(purchases: _*)
    val joined = EventOps.attributionJoin(
      vMem.toDF().withWatermark("ts", "2 hours"),
      pMem.toDF().withWatermark("ts", "2 hours"))
    val q = joined.writeStream.format("memory").queryName("ss_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("ss_out")
      .orderBy("user_id", "purchase_id", "view_id").collect().map(_.toString).toSeq
    val batch = EventOps.attributionJoin(views.toDF(), purchases.toDF())
      .orderBy("user_id", "purchase_id", "view_id").collect().map(_.toString).toSeq
    assert(streamed == batch)
    assert(batch.length == 3) // (10,1) (10,2) (11,4)
  }

  test("stream-static enrichment joins each micro-batch against the broadcast dim") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val dim = Tables.customer(s, sfDir)
    val data = Seq(ev(1, 0, 1, "view", 1.0), ev(2, 60, 2, "click", 2.0),
      ev(3, 120, 1, "purchase", 3.0))
    val mem = MemoryStream[Ev]
    mem.addData(data.take(2): _*)
    mem.addData(data.drop(2): _*)
    val q = EventOps.enrich(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("enrich_out").orderBy("event_id").collect().map(_.toString).toSeq
    val batch = EventOps.enrich(data.toDF(), dim).orderBy("event_id").collect().map(_.toString).toSeq
    assert(streamed == batch && batch.length == 3)
  }

  test("windowed agg with watermark runs in append mode (bounded state)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(ev(1, 0, 1, "view", 1.0), ev(2, 30, 1, "view", 2.0))
    // events far past the first window advance the watermark and close it
    mem.addData(ev(3, 4000, 1, "view", 3.0))
    val q = EventOps.windowAgg(mem.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("wm_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val closed = s.table("wm_out").collect()
    assert(closed.length == 1) // only the sealed first window is emitted
    assert(closed(0).getAs[Long]("n_events") == 2)
  }
}
