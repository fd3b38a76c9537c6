package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** r14 wave: the decontamination REWRITE (D6e) — the corpus-editing step
  * composing D6d's span forensics with d_line_dedup's positional
  * reassembly. The contract under test: clean docs byte-identical,
  * planted contamination excised completely (the w+k-1 tiling argument),
  * and the audit finds nothing after the scrub. */
class Wave14Spec extends SparkSpecBase {

  private def rewrite(train: Seq[(Long, String)], bench: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    TextOps.decontaminateRewriteOn(
      train.toDF("doc_id", "text"), bench.toDF("doc_id", "text"), 3, 4, 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
  }

  test("decontaminate_rewrite: clean docs pass through byte-identical") {
    val cleanA = "the quick brown fox jumps over the lazy dog today"
    val cleanB = "completely unrelated prose about sailing ships across the ocean"
    val out = rewrite(
      Seq(1L -> cleanA, 2L -> cleanB),
      Seq(100L -> "benchmark question text with seven whole words inside"))
    assert(out(1L) == ((10L, 0L, 0L, cleanA)))
    assert(out(2L) == ((9L, 0L, 0L, cleanB)))
  }

  test("decontaminate_rewrite: a planted bench sentence is excised, flanks survive") {
    // 20 distinct marker words — longer than any single fingerprint
    // cover, so completeness exercises the tiling argument, not one
    // lucky selection
    val markers = (1 to 20).map(i => f"contam$i%02d")
    val benchDoc = markers.mkString(" ")
    val pre = (1 to 8).map(i => s"pre$i")
    val post = (1 to 8).map(i => s"post$i")
    val planted = (pre ++ markers ++ post).mkString(" ")
    val out = rewrite(
      Seq(1L -> planted, 2L -> "totally clean control document with many plain words"),
      Seq(100L -> benchDoc))
    val (nw, nm, nr, clean) = out(1L)
    assert(nw == 36L && nm > 0L && nr >= 20L)
    // every marker word is gone; padding may eat flank words but the
    // flanks are longer than the w-1=3 word pad, so both survive in part
    val words = clean.split(" ").toSet
    assert(markers.forall(m => !words.contains(m)), s"markers survived: $clean")
    assert(words.contains("pre1") && words.contains("post8"), clean)
    // no 6-word (w+k-1) run of the rewritten doc appears in the bench doc
    val runs = clean.split(" ").sliding(6).map(_.mkString(" ")).toSeq
    assert(runs.forall(r => !benchDoc.contains(r)))
    // the control doc is untouched
    assert(out(2L)._4 == "totally clean control document with many plain words")
  }

  test("decontaminate_rewrite: an exact bench clone rewrites to the empty string") {
    val doc = "exact benchmark clone of seven words here"
    val out = rewrite(Seq(1L -> doc), Seq(100L -> doc))
    val (nw, nm, nr, clean) = out(1L)
    assert(nw == 7L && nm > 0L && nr == 7L && clean == "")
  }

  test("decontaminate_rewrite: the D6d audit finds nothing after the scrub") {
    val s = spark
    import s.implicits._
    val markers = (1 to 20).map(i => f"contam$i%02d")
    val benchDoc = markers.mkString(" ")
    val planted = ((1 to 8).map(i => s"pre$i") ++ markers ++
      (1 to 8).map(i => s"post$i")).mkString(" ")
    val train = Seq(1L -> planted).toDF("doc_id", "text")
    val bench = Seq(100L -> benchDoc).toDF("doc_id", "text")
    // before: the audit flags the pair (minShared=1 — every shared fp)
    val before = TextOps.decontaminateSpansOn(train, bench, 3, 4, 10, 1).count()
    assert(before == 1L)
    // after: rewrite, re-audit — nothing shared at any minShared
    val clean = TextOps.decontaminateRewriteOn(train, bench, 3, 4, 10)
      .select($"doc_id", $"clean_text".as("text"))
    val after = TextOps.decontaminateSpansOn(clean, bench, 3, 4, 10, 1).count()
    assert(after == 0L)
  }

  test("decontaminate_rewrite: corpus invariants at sf0.001") {
    val s = spark
    import s.implicits._
    val out = TextOps.decontaminateRewrite(s, sfDir).cache()
    val nTrain = Tables.documents(s, sfDir).filter($"doc_id" % 10 =!= 0).count()
    assert(out.count() == nTrain) // every train doc emits exactly one row
    // removal is bounded by the doc and implied by a match (and only by one)
    assert(out.filter($"n_removed" > $"n_words").count() == 0)
    assert(out.filter($"n_matched" === 0 && $"n_removed" =!= 0).count() == 0)
    assert(out.filter($"n_matched" > 0 && $"n_removed" === 0).count() == 0)
    // untouched docs are byte-identical to the source text
    val src = Tables.documents(s, sfDir).select($"doc_id", $"text".as("orig"))
    val cleanJoined = out.filter($"n_matched" === 0).join(src, "doc_id")
    assert(cleanJoined.filter($"clean_text" =!= $"orig").count() == 0)
    out.unpersist()
  }
}
