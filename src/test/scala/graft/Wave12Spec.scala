package graft

import graft.operators.TextOps

/** r12 wave: span-level benchmark decontamination forensics (D6d) —
  * the cross-corpus consumer of T18's winnow fingerprints. */
class Wave12Spec extends SparkSpecBase {

  test("decontaminate spans: planted contamination located in both docs, cross-side only") {
    import spark.implicits._
    // bench doc 100 carries a 10-word phrase; train docs 1 and 2 embed it
    // verbatim at different offsets; train docs 3 and 4 share a run with
    // EACH OTHER but not with any bench doc — that pair must NOT appear
    // (this is decontamination, not general near-dup).
    val phrase = "the quick brown fox jumps over the lazy sleeping dog"
    val trainRun = "alpha beta gamma delta epsilon zeta eta theta"
    val train = Seq(
      (1L, s"intro words here $phrase and a tail"),
      (2L, s"$phrase trailing content of the second document"),
      (3L, s"one two $trainRun three four"),
      (4L, s"$trainRun five six seven eight nine"),
      (5L, "completely unrelated clean training text with no overlap at all"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, s"benchmark question states $phrase as its premise"),
      (110L, "another benchmark item with entirely distinct wording"))
      .toDF("doc_id", "text")
    val got = TextOps.decontaminateSpansOn(train, bench, 3, 4,
        dfCap = 10, minShared = 2).collect()
      .map(r => (r.getAs[Long]("train_doc"), r.getAs[Long]("bench_doc")) -> r)
      .toMap
    assert(got.keySet == Set((1L, 100L), (2L, 100L)),
      s"expected exactly the two planted contaminations, got ${got.keySet}")
    // a 10-word shared run guarantees >= 2 shared selected fingerprints
    // at k=3, w=4 (winnow density 2/(w+1))
    assert(got((1L, 100L)).getAs[Long]("n_shared") >= 2L)
    // span sanity: doc 1's phrase occupies words 4-13 of 17 (gram
    // positions 4..11); bench doc 100's words 4-13 of 16 (grams 4..11).
    // Reported extents must fall inside those gram ranges.
    val p1 = got((1L, 100L))
    assert(p1.getAs[Long]("train_lo") >= 4L && p1.getAs[Long]("train_hi") <= 13L,
      s"train span out of range: ${p1}")
    assert(p1.getAs[Long]("bench_lo") >= 4L && p1.getAs[Long]("bench_hi") <= 13L,
      s"bench span out of range: ${p1}")
    // doc 2 embeds the phrase at offset 0 — its span must start earlier
    // than doc 1's (position extents are doc-local facts, not mirrored)
    assert(got((2L, 100L)).getAs[Long]("train_lo") <
      p1.getAs[Long]("train_lo"))
  }

  test("decontaminate spans: df-cap counts both sides; entry splits on doc_id % 10") {
    import spark.implicits._
    // a phrase present in 9 train docs AND 2 bench docs has df=11 > 10:
    // every fingerprint fully inside it is boilerplate-dropped, so the
    // planted mass vanishes at dfCap=10 and returns at dfCap=11
    val boiler = "standard disclaimer text repeated across the whole corpus"
    val train = (1L to 9L)
      .map(i => (i, s"lead$i mid$i $boiler tail$i end$i")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, s"bench one has $boiler inside it"),
      (110L, s"bench two also has $boiler inside it")).toDF("doc_id", "text")
    def pairsAt(cap: Int): Long =
      TextOps.decontaminateSpansOn(train, bench, 3, 4, dfCap = cap,
        minShared = 1).count()
    assert(pairsAt(11) > pairsAt(10),
      "df-cap over the union had no effect on cross-corpus boilerplate")
    // the entry-point split: doc_id % 10 == 0 is the benchmark slice —
    // pair output must only ever put %10==0 ids in bench_doc
    val e = TextOps.decontaminateSpans(spark, sfDir).collect()
    assert(e.forall(_.getAs[Long]("bench_doc") % 10 == 0))
    assert(e.forall(_.getAs[Long]("train_doc") % 10 != 0))
  }
}
