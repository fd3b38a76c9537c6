package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{EventOps, Scd2Stream}
import graft.streaming.Scd2Stream.StateEvent

class Scd2StreamSpec extends SparkSpecBase {

  private val base = 1704067200L // 2024-01-01
  private def ev(id: Long, offSec: Long, user: Long, kind: String) =
    StateEvent(user, id, new Timestamp((base + offSec) * 1000L), kind)

  test("incremental scd2 equals the batch backfill on the real corpus, split mid-stream") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // the whole sf0.001 event log, delivered in two time-ordered
    // micro-batches (the per-entity ordered-arrival contract)
    val all = Tables.events(s, sfDir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .as[Scd2Stream.StateEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val mid = all(all.length / 2).ts
    val mem = MemoryStream[StateEvent]
    mem.addData(all.filter(!_.ts.after(mid)).toSeq: _*)
    mem.addData(all.filter(_.ts.after(mid)).toSeq: _*)
    val q = Scd2Stream(mem.toDS())
      .writeStream.format("memory").queryName("scd2_corpus").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("scd2_corpus")
      .select("user_id", "version", "state", "eff_from", "eff_to")
      .orderBy("user_id", "version").collect().map(_.toString).toSeq
    val batch = EventOps.scd2(Tables.events(s, sfDir))
      .filter(col("eff_to").isNotNull)
      .select("user_id", "version", "state", "eff_from", "eff_to")
      .orderBy("user_id", "version").collect().map(_.toString).toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"stream ${streamed.size} rows vs batch ${batch.size}")
  }

  test("incremental scd2 emits exactly the batch backfill's closed versions") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // user 1 changes state across BOTH batches (view→click closes in
    // batch 1; click→view closes in batch 2 — a cross-batch closure);
    // user 2's lone state never closes. Consecutive same-state events
    // (ids 2, 3) must collapse into one version.
    val batch1 = Seq(ev(1, 0, 1, "view"), ev(2, 60, 1, "view"),
      ev(3, 120, 1, "click"), ev(4, 0, 2, "purchase"))
    val batch2 = Seq(ev(5, 300, 1, "view"), ev(6, 400, 1, "view"))
    val mem = MemoryStream[StateEvent]
    mem.addData(batch1: _*)
    mem.addData(batch2: _*)
    val q = Scd2Stream(mem.toDS())
      .writeStream.format("memory").queryName("scd2_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val streamed = s.table("scd2_out")
      .select("user_id", "version", "state", "eff_from", "eff_to")
      .orderBy("user_id", "version").collect().toSeq
    val batch = EventOps.scd2(
        (batch1 ++ batch2).toDF("user_id", "event_id", "ts", "event_type"))
      .filter($"eff_to".isNotNull)
      .select("user_id", "version", "state", "eff_from", "eff_to")
      .orderBy("user_id", "version").collect().toSeq
    assert(streamed == batch, s"stream $streamed\nbatch $batch")
    // the cross-batch closure: version 2 (click) closed by batch 2's view
    assert(streamed.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getString(2) == "click"))
    // open rows (user 1's final view run, user 2's purchase) are state,
    // not output: closed rows + one open per user = full history
    val users = (batch1 ++ batch2).map(_.user_id).distinct.size
    val fullHistory = EventOps.scd2(
        (batch1 ++ batch2).toDF("user_id", "event_id", "ts", "event_type")).count()
    assert(streamed.size + users == fullHistory)
  }
}
