package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.IngestDedup
import graft.streaming.IngestDedup.{Decision, Doc}

/** Streaming corpus ingest dedup: the stream's per-document decisions
  * must equal the batch D1 keep-set, including clones that arrive in a
  * LATER batch than their keeper (state crosses the batch boundary). */
class IngestDedupSpec extends SparkSpecBase {

  test("stream decisions ≡ batch decisions, clones detected across batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val batch1 = Seq(Doc(1, "alpha bravo"), Doc(2, "charlie delta"),
      Doc(3, "alpha bravo")) // in-batch clone of 1
    val batch2 = Seq(Doc(4, "alpha bravo"), // cross-batch clone of 1
      Doc(5, "echo foxtrot"), Doc(6, "charlie delta")) // cross-batch clone of 2

    val mem = MemoryStream[Doc]
    val q = IngestDedup(mem.toDS())
      .writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = s.table("ingest_out").as[Decision]
      .collect().sortBy(_.doc_id).toSeq
    val batch = IngestDedup.batchDecisions((batch1 ++ batch2).toDF())
      .as[Decision].collect().toSeq
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    // explicit cross-batch checks: 4 and 6 dedup against earlier keepers
    assert(streamed.find(_.doc_id == 4).get == Decision(4, 1, is_dup = true))
    assert(streamed.find(_.doc_id == 6).get == Decision(6, 2, is_dup = true))
    assert(streamed.count(!_.is_dup) == 3) // exactly one keeper per text
    // and the stream's keep-set equals the batch D1 operator's keep-set
    val keepSet = streamed.filter(!_.is_dup).map(_.doc_id).toSet
    assert(keepSet == Set(1L, 2L, 5L))
  }
}
