package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.NearDupStream
import graft.streaming.NearDupStream.{Cand, Doc}

/** Streaming near-dup candidates: the stream's (pair, band) set must
  * equal the batch D2 band join on the same corpus, including pairs
  * whose members arrive in DIFFERENT batches (bucket state crosses the
  * boundary). */
class NearDupStreamSpec extends SparkSpecBase {

  test("stream candidates ≡ batch band join, near-dups found across batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val near = base.replace("echo", "zulu") // one edit: most shingles shared
    val batch1 = Seq(Doc(1, base), Doc(2, "one two three four five six"),
      Doc(3, base)) // in-batch exact clone of 1 → all 4 bands collide
    val batch2 = Seq(Doc(4, near), // cross-batch near-dup of 1 and 3
      Doc(5, "completely different words entirely here now"))

    val mem = MemoryStream[Doc]
    val q = NearDupStream(mem.toDS())
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = s.table("neardup_out").as[Cand].collect()
      .map(c => (c.doc_a, c.doc_b, c.band)).toSet
    val batch = NearDupStream.batchCandidates(
      (batch1 ++ batch2).map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"stream-only=${(streamed -- batch).take(5)} batch-only=${(batch -- streamed).take(5)}")
    // the exact clone collides in every band; the cross-batch near-dup
    // is caught in at least one band (the spec data shares 7/8 shingles)
    val pairs = streamed.groupBy(c => (c._1, c._2)).view.mapValues(_.size).toMap
    assert(pairs((1L, 3L)) == 4, s"clone pair must collide in all 4 bands: $pairs")
    assert(pairs.contains((1L, 4L)) && pairs.contains((3L, 4L)),
      s"cross-batch near-dup missed: $pairs")
    // unrelated docs never pair
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).contains(5L) })
  }

  test("scalar band signatures match the distributed ones on trailing-space text") {
    val s = spark
    import s.implicits._
    // Spark's split(text, ' ') keeps trailing empty strings; a JVM split
    // without limit -1 would drop them and shift every shingle (ADVICE
    // r6). Docs with trailing/double spaces must produce the same band
    // rows on both paths.
    val docs = Seq(
      (1L, "alpha bravo charlie delta "),
      (2L, "alpha bravo  charlie delta"),
      (3L, "alpha bravo charlie delta"))
    val scalar = docs.flatMap { case (id, t) => NearDupStream.bandSigsOf(Doc(id, t)) }
      .map(b => (b.doc_id, b.band, b.sig)).toSet
    val dist = NearDupStream.batchBandSigs(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("band"), r.getAs[String]("sig"))).toSet
    assert(scalar == dist,
      s"scalar-only=${(scalar -- dist).take(5)} dist-only=${(dist -- scalar).take(5)}")
    // the trailing space genuinely changes doc 1's shingle set vs doc 3
    assert(scalar.filter(_._1 == 1L).map(_._3) != scalar.filter(_._1 == 3L).map(_._3))
  }
}
