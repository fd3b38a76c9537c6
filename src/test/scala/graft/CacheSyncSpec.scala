package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.CacheSync
import graft.streaming.CacheSync.CacheEvent

/** Semantic-cache write path (semantic_cache.py add/clear): insertion,
  * key eviction, global clear, and revival after clear. */
class CacheSyncSpec extends SparkSpecBase {

  private val log = Seq(
    CacheEvent("q1", "answer-1", 1, "put"),
    CacheEvent("q2", "answer-2", 2, "put"),
    CacheEvent("q1", "answer-1b", 3, "put"),   // overwrite
    CacheEvent("q3", "answer-3", 4, "put"),
    CacheEvent("q2", "", 5, "evict"),          // single-key invalidation
    CacheEvent("", "", 6, "clear"),            // admin wipe
    CacheEvent("q3", "answer-3b", 7, "put"))   // revived after clear

  test("batch fold: latest put wins, evict kills a key, clear kills all prior puts") {
    val s = spark
    import s.implicits._
    val live = CacheSync.liveSnapshot(log.toDF())
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // q1's put at seq 3 ≤ clear at 6 → dead; q2 evicted; q3 re-put at 7 → live
    assert(live == Map("q3" -> "answer-3b"), s"got $live")
    val all = CacheSync.snapshot(log.toDF()).collect()
    assert(all.length == 3) // every key has a final state row
    assert(!all.find(_.getString(0) == "q1").get.getAs[Boolean]("live"))
  }

  test("streaming keyed ops equal the batch fold when no clear intervenes") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val keyed = log.filter(_.op != "clear").filter(_.seq < 6)
    val mem = MemoryStream[CacheEvent]
    mem.addData(keyed.take(3): _*)
    mem.addData(keyed.drop(3): _*)
    val q = CacheSync(mem.toDS())
      .writeStream.format("memory").queryName("cache_out")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("cache_out")
      .groupBy("key").agg(max_by(struct("response", "last_seq", "live"), col("last_seq")).as("st"))
      .select(col("key"), col("st.*"))
      .orderBy("key").collect().map(_.toString).toSeq
    val batch = CacheSync.snapshot(keyed.toDF())
      .orderBy("key").collect().map(_.toString).toSeq
    assert(streamed == batch)
  }
}
