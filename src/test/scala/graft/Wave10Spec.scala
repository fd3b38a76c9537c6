package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps
import graft.pipeline.CorpusPipeline

/** r8 wave-10 operators: data expectations, deterministic walk corpus. */
class Wave10Spec extends SparkSpecBase {

  // ---------------------------------------------------------------- P11

  test("quality checks: clean corpus passes every rule") {
    val s = spark
    val rows = CorpusPipeline.qualityChecks(s, sfDir).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getBoolean(3)),
      s"failing rules: ${rows.filterNot(_.getBoolean(3)).map(_.getString(0)).toSeq}")
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("chars_consistent", "doc_id_unique", "lang_wellformed",
        "row_count", "source_complete", "text_complete"))
  }

  test("quality checks: planted violations fail exactly their rules") {
    val s = spark
    import s.implicits._
    // 10 docs: one null text, one duplicated id, one 3-char lang, one
    // n_chars lie, one null source
    val docs = Seq(
      (1L, "good text", "en", "srcA", 9L),
      (2L, null.asInstanceOf[String], "en", "srcA", 0L), // text + chars fail
      (3L, "abc", "eng", "srcA", 3L),                    // lang fails
      (4L, "abcd", "en", null.asInstanceOf[String], 4L), // source fails
      (5L, "abcde", "en", "srcB", 99L),                  // n_chars lies
      (5L, "abcde", "en", "srcB", 5L),                   // duplicate id
      (7L, "x y z", "de", "srcB", 5L),
      (8L, "ok", "fr", "srcB", 2L),
      (9L, "fine", "en", "srcB", 4L),
      (10L, "also fine", "en", "srcB", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusPipeline.qualityChecksOn(docs).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    assert(got("row_count") == ((10.0, true)))
    assert(got("doc_id_unique") == ((0.9, false)))      // 9 distinct of 10
    assert(got("text_complete") == ((0.9, false)))      // the null text
    assert(got("lang_wellformed") == ((0.9, false)))    // 'eng'
    // null text row: n_chars = len(NULL) comparison is null → not counted;
    // the lying row also fails → 8/10
    assert(got("chars_consistent") == ((0.8, false)))
    assert(got("source_complete") == ((0.9, false)))
  }

  // ---------------------------------------------------------------- G18

  test("random walks: every hop is an edge, shapes exact, runs reproducible") {
    val s = spark
    import s.implicits._
    val walks = GraphOps.randomWalks(s, sfDir)
    val w = walks.collect()
    val edges = GraphOps.copurchaseEdges(s, sfDir).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    val byWalk = w.groupBy(r => (r.getLong(0), r.getLong(1)))
    byWalk.foreach { case ((start, _), rows) =>
      val path = rows.sortBy(_.getInt(2)).map(_.getLong(3))
      assert(path.length == 5)        // steps 0..4
      assert(path.head == start)      // step 0 is the start node
      path.sliding(2).foreach { case Array(a, b) =>
        assert(edges.contains((a, b)), s"hop $a->$b is not an edge") }
    }
    Caches.clearAll()
    val again = GraphOps.randomWalks(s, sfDir).collect()
    assert(w.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("random walks: the indexed hash choice replays by hand") {
    val s = spark
    import s.implicits._
    // path graph 1-2-3: from 2 the next hop is sorted-neighbors {1, 3}
    // indexed at h64("w:2:0:1") mod 2 (r9: one hash per walk-step, no
    // per-neighbor scoring)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    def h64(str: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val got = GraphOps.randomWalksOf(edges, 1, 1).collect()
      .filter(r => r.getLong(0) == 2L && r.getInt(2) == 1)
    assert(got.length == 1)
    val expected = Seq(1L, 3L)((h64("w:2:0:1") % 2).toInt)
    assert(got.head.getLong(3) == expected)
  }
}
