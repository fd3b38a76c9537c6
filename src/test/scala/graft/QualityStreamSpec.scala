package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.QualityStream
import graft.streaming.QualityStream.{Doc, Scored}
import graft.operators.TextOps

/** The T20 serving leg: the streamed scores must equal the batch twin's,
  * and with an uncapped vocab the scalar fold must reproduce the
  * DISTRIBUTED classifier's scores bit-for-bit. */
class QualityStreamSpec extends SparkSpecBase {

  test("uncapped model: stream fold ≡ the distributed T20 scores, bit-for-bit") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, sfDir).select($"doc_id", $"source", $"text")
    val model = QualityStream.trainModel(docs, Seq("src0", "src1", "src2"),
      vocabCap = Int.MaxValue)
    val batch = QualityStream.batchScores(
      docs.select($"doc_id", $"text").as[Doc], model)
      .collect().map(x => x.doc_id -> x).toMap
    val dist = TextOps.qualityClassifier(s, sfDir).collect()
      .map(r => r.getLong(0) ->
        Scored(r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(batch.keySet == dist.keySet)
    batch.foreach { case (id, sc) =>
      assert(sc == dist(id), s"doc $id: $sc vs ${dist(id)}")
    }
  }

  test("stream ≡ batch across micro-batches; capped OOV words score the prior") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val train = Seq(
      (1L, "good", "careful thorough prose careful thorough"),
      (2L, "good", "insightful structured careful writing"),
      (3L, "junk", "spam click spam click spam"),
      (4L, "junk", "click here spam here click"))
      .toDF("doc_id", "source", "text")
    val model = QualityStream.trainModel(train, Seq("good"), vocabCap = 4)
    assert(model.logodds.size == 4)

    val b1 = Seq(Doc(10, "careful thorough prose"), Doc(11, "spam click spam"))
    val b2 = Seq(Doc(12, "zz qq ww"), // fully OOV under the cap
      Doc(13, "careful spam"))
    val mem = MemoryStream[Doc]
    val q = QualityStream(mem.toDS(), model)
      .writeStream.format("memory").queryName("qs_out")
      .outputMode("append").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = s.table("qs_out").as[Scored].collect()
      .sortBy(_.doc_id).toSeq
    val batch = QualityStream.batchScores((b1 ++ b2).toDS(), model)
      .collect().sortBy(_.doc_id).toSeq
    assert(streamed == batch)
    // the all-OOV doc carries only the prior (log10(2/2) = 0 here)
    val oov = streamed.find(_.doc_id == 12L).get
    assert(oov.score == 0.0 && !oov.pred_quality)
  }

  test("degenerate training classes fail loudly: one-sided allowlist AND empty corpus") {
    val s = spark
    import s.implicits._
    val oneSided = Seq((1L, "good", "a b"), (2L, "good", "c d"))
      .toDF("doc_id", "source", "text")
    intercept[IllegalArgumentException] {
      QualityStream.trainModel(oneSided, Seq("good"))
    }
    // an EMPTY corpus aggregates to an all-NULL counts row — the guard
    // must still fire its message, not NPE on Row.getLong
    val empty = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "source", "text")
    intercept[IllegalArgumentException] {
      QualityStream.trainModel(empty, Seq("good"))
    }
  }
}
