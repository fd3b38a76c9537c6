package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.IngestClean
import graft.streaming.IngestClean.{Doc, Verdict}

/** Ingest-time corpus cleaning: the stream's verdicts must equal the
  * batch twin's, including the subtle case batch semantics force — a
  * LOW-QUALITY keeper still claims its text group, so a later
  * high-quality clone is still an exact_dup (in batch the whole group
  * dies with its keeper; the stream must agree, not "rescue" it). */
class IngestCleanSpec extends SparkSpecBase {

  // equivalence precondition (documented on IngestClean): doc_ids arrive
  // in nondecreasing order across micro-batches — the batches below do.
  test("stream verdicts ≡ batch verdicts, incl. low-quality keeper claiming its group") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    // "the X of Y" passes the 5% stopword floor; pure payload words fail
    val good = "the alpha of bravo"
    val junk = "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn mmm lll kkk jjj iii hhh ggg fff"
    val batch1 = Seq(
      Doc(1, good), Doc(2, junk), // 2: low-quality keeper of the junk group
      Doc(3, good)) // in-batch clone of 1
    val batch2 = Seq(
      Doc(4, junk), // cross-batch clone of the LOW-QUALITY keeper 2
      Doc(5, "the echo of foxtrot"),
      Doc(6, good), // cross-batch clone of 1
      Doc(7, junk + " trailing-space-free")) // distinct junk text

    val mem = MemoryStream[Doc]
    val q = IngestClean(mem.toDS())
      .writeStream.format("memory").queryName("clean_out")
      .outputMode("append").start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = s.table("clean_out").as[Verdict]
      .collect().sortBy(_.doc_id).toSeq
    val batch = IngestClean.batchVerdicts((batch1 ++ batch2).toDF())
      .as[Verdict].collect().toSeq
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    // the defining cases, pinned explicitly:
    assert(streamed.find(_.doc_id == 2).get.reason == "low_quality")
    // clone of a low-quality keeper is a dup, NOT a rescued keeper
    assert(streamed.find(_.doc_id == 4).get == Verdict(4, 2, "exact_dup"))
    assert(streamed.find(_.doc_id == 6).get == Verdict(6, 1, "exact_dup"))
    assert(streamed.find(_.doc_id == 7).get.reason == "low_quality")
    // the kept set is exactly the quality-passing group keepers
    assert(streamed.filter(_.reason == "kept").map(_.doc_id) == Seq(1L, 5L))
  }

  test("scalar quality gate is tokenization-parity with the SQL form on edge inputs") {
    val s = spark
    import s.implicits._
    // trailing spaces create empty tokens in BOTH tokenizers (split -1)
    val edge = Seq(Doc(10, "the a of and "), Doc(11, "THE A OF AND"),
      Doc(12, ""), Doc(13, "  "))
    val batch = IngestClean.batchVerdicts(edge.toDF())
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    edge.foreach { d =>
      val scalarOk = IngestClean.qualityOk(d.text, 0.5)
      val batchOk = batch(d.doc_id) == "kept"
      assert(scalarOk == batchOk, s"doc ${d.doc_id}: scalar=$scalarOk batch=$batchOk")
    }
  }
}
