package graft

import graft.operators.{Dedup, TextOps}

/** r9 wave-11 operators: line-level inter-document dedup (D12) and the
  * Gopher document-quality gate (T16). */
class Wave11Spec extends SparkSpecBase {

  // ---------------------------------------------------------------- D12

  test("line dedup: cross-doc segments removed, within-doc repeats kept, short docs intact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"), // segs [a b c][d e f][g h]; first shared with doc 2
      (2L, "a b c x y z"),     // both segs shared -> rebuilds to ""
      (3L, "x y z"),           // single shared seg
      (4L, "q r"),             // short partial seg, unique -> untouched
      (5L, "m n o m n o")      // seg repeats WITHIN one doc only: df=1, kept
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedupOf(docs, 3, 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_segments"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text"))).toMap
    assert(got(1L) == ((3L, 1L, "d e f g h")))
    assert(got(2L) == ((2L, 2L, "")))
    assert(got(3L) == ((1L, 1L, "")))
    assert(got(4L) == ((1L, 0L, "q r")))
    // document-frequency (distinct docs), not occurrence count: doc 5's
    // self-repeat survives — the CCNet rule targets CROSS-doc boilerplate
    assert(got(5L) == ((2L, 0L, "m n o m n o")))
  }

  test("line dedup: minDf raises the boilerplate bar") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b c"), // df=3
      (4L, "d e f"), (5L, "d e f")                 // df=2
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedupOf(docs, 3, 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_removed")).toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(4L) == 0L && got(5L) == 0L)
  }

  // ---------------------------------------------------------------- T16

  private def doc(words: Seq[String]): String = words.mkString(" ")

  test("gopher rules: each rule fails in isolation on its crafted doc") {
    import spark.implicits._
    val filler = (0 until 48).map(i => f"w$i%02d") // 3-char alpha words
    val docs = Seq(
      // all five rules pass
      (1L, doc(Seq("the", "and") ++ filler)),
      // word count: 10 words < 50 (3-char words keep mean_wlen passing)
      (2L, doc(Seq("the", "and") ++ filler.take(8))),
      // alpha: 45/50 digit-only words -> frac_alpha = 0.1
      (3L, doc(Seq("the", "and", "aaa", "bbb", "ccc") ++ (100 until 145).map(_.toString))),
      // bigram: "xxx yyy" dominates (24/49 > 0.2); 3-char words keep wlen at 3.0
      (4L, doc(Seq("the", "and") ++ Seq.fill(24)(Seq("xxx", "yyy")).flatten)),
      // stop words: zero stop-list hits
      (5L, doc((0 until 50).map(i => f"v$i%02d"))),
      // 1-word doc: no bigram frame row -> vacuous r_bigram pass via left join
      (6L, "hello")
    ).toDF("doc_id", "text")
    val got = TextOps.gopherRulesOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("r_words"), r.getAs[Long]("r_wlen"),
          r.getAs[Long]("r_alpha"), r.getAs[Long]("r_stop"),
          r.getAs[Long]("r_bigram"), r.getAs[Long]("n_failed"),
          r.getAs[Long]("pass"))).toMap
    assert(got(1L) == ((1L, 1L, 1L, 1L, 1L, 0L, 1L)))
    assert(got(2L) == ((0L, 1L, 1L, 1L, 1L, 1L, 0L)))
    assert(got(3L) == ((1L, 1L, 0L, 1L, 1L, 1L, 0L)))
    assert(got(4L) == ((1L, 1L, 1L, 1L, 0L, 1L, 0L)))
    assert(got(5L) == ((1L, 1L, 1L, 0L, 1L, 1L, 0L)))
    assert(got(6L) == ((0L, 1L, 1L, 0L, 1L, 2L, 0L)))
  }

  // ---------------------------------------------------------------- T17

  test("entropy: uniform, constant and skewed histograms hit closed forms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // uniform: H = ln 4, norm = 1
      (2L, "x x x x"),   // constant: H = 0, norm = 0 (n_distinct = 1 branch)
      (3L, "a a b")      // skewed: H = ln 3 - (2/3) ln 2
    ).toDF("doc_id", "text")
    val got = TextOps.wordEntropyOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("entropy"), r.getAs[Double]("norm_entropy"))).toMap
    assert(got(1L) == ((4L, 4L, 1.386294, 1.0)))
    assert(got(2L) == ((4L, 1L, -0.0, 0.0)) || got(2L) == ((4L, 1L, 0.0, 0.0)))
    assert(got(3L)._3 == 0.636514) // -(round(2·ln(2/3),6) + round(ln(1/3),6))/3
    assert(math.abs(got(3L)._4 - 0.636514 / math.log(2)) < 1e-5)
  }

  // ---------------------------------------------------------------- T18

  /** Single-JVM winnowing reference fold (Schleimer et al. 2003):
    * rightmost minimum per window, distinct (pos, fp). */
  private def h64ref(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def refWinnow(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val wds = text.toLowerCase.split(" ", -1).toSeq
    if (wds.size < k + w - 1) Set.empty
    else {
      val hs = (0 to wds.size - k).map(i => h64ref(wds.slice(i, i + k).mkString(" ")))
      (0 to hs.size - w).map { j =>
        val sl = hs.slice(j, j + w)
        val mn = sl.min
        ((j + sl.lastIndexOf(mn) + 1).toLong, mn) // rightmost min, 1-based pos
      }.toSet
    }
  }

  test("winnow: DF selection ≡ reference fold, incl. ties and short docs") {
    import spark.implicits._
    val texts = Seq(
      1L -> "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
      2L -> "a b c a b c a b c a b c",   // repeated grams: equal hashes tie in-window
      3L -> "one two three four five six",
      4L -> "too short now",             // < k+w-1 words: no windows, no rows
      5L -> "x y z x y z q r s t u v w"
    )
    val got = TextOps.winnowOf(texts.toDF("doc_id", "text"), 3, 4).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("pos"), r.getAs[Long]("fp"))).toSet)
      .toMap
    for ((id, text) <- texts) {
      val exp = refWinnow(text, 3, 4)
      assert(got.getOrElse(id, Set.empty) == exp, s"doc $id")
    }
    assert(!got.contains(4L))
  }

  test("winnow: a shared run of ≥ w+k-1 words guarantees a shared fingerprint") {
    import spark.implicits._
    // docs 1 and 2 share the 6-word run "north south east west up down"
    val docs = Seq(
      (1L, "p q r north south east west up down m n"),
      (2L, "north south east west up down zz yy xx ww vv"),
      (3L, "totally different words here nothing shared at all")
    ).toDF("doc_id", "text")
    val fps = TextOps.winnowOf(docs, 3, 4).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("fp")).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    assert((fps(1L) intersect fps(3L)).isEmpty)
  }

  test("winnow pairs: planted shared runs detected with spans, boilerplate df-capped out") {
    import spark.implicits._
    // docs 1/2 share a 10-word run (≥ w+k-1 = 6 ⇒ ≥ 2 shared selected
    // fingerprints for a run this long at density 2/(w+1)); doc 3 is
    // unrelated; docs 10-21 all share one 6-word boilerplate run, whose
    // fingerprints exceed dfCap=10 docs and must vanish from the pairs.
    val run = "north south east west up down left right back forth"
    val boiler = "standard legal disclaimer applies here always"
    val docs = (Seq(
      (1L, s"p q r $run m n"),
      (2L, s"$run zz yy xx ww vv"),
      (3L, "totally different words here nothing shared at all")) ++
      (10L to 21L).map(i => (i, s"unique$i only$i words$i $boiler tail$i end$i")))
      .toDF("doc_id", "text")
    val pairs = TextOps.winnowPairsOf(docs, 3, 4, dfCap = 10, minShared = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    // the planted pair must surface; the unrelated doc 3 must pair with
    // nothing. (Boilerplate docs may still pair via EDGE-window
    // selections — a boilerplate gram selected in only a few docs has
    // low df; the cap's guarantee is on fps selected in > dfCap docs,
    // asserted separately below.)
    assert(pairs.contains((1L, 2L)), s"planted pair missing: ${pairs.keySet}")
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
    val p = pairs((1L, 2L))
    assert(p.getAs[Long]("n_shared") >= 2L)
    // span sanity: doc 1's run occupies gram positions 4..11 (words
    // 4-13 of 15), doc 2's positions 1..8 — the reported extents must
    // lie inside each doc's gram range and a's span must start at or
    // after the run does
    assert(p.getAs[Long]("a_lo") >= 4L && p.getAs[Long]("a_hi") <= 13L)
    assert(p.getAs[Long]("b_lo") >= 1L && p.getAs[Long]("b_hi") <= 13L)
    // the cap's guarantee: the all-12-doc boilerplate fingerprint (the
    // window fully inside the shared run selects the SAME fp in every
    // boilerplate doc) is dropped at dfCap=10 and kept at dfCap=12 —
    // so raising the cap past 12 must strictly grow the pair shared
    // counts among boilerplate docs
    def boilerShared(cap: Int): Long =
      TextOps.winnowPairsOf(docs, 3, 4, dfCap = cap, minShared = 1)
        .collect()
        .filter(r => r.getAs[Long]("doc_a") >= 10L)
        .map(_.getAs[Long]("n_shared")).sum
    val capped = boilerShared(10)
    val uncapped = boilerShared(12)
    assert(uncapped > capped,
      s"df-cap had no effect on boilerplate mass: capped=$capped uncapped=$uncapped")
    // every one of the C(12,2)=66 boilerplate pairs shares the interior
    // fp once uncapped
    val up = TextOps.winnowPairsOf(docs, 3, 4, dfCap = 12, minShared = 1)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert((10L to 21L).combinations(2).forall(c => up.contains((c(0), c(1)))),
      "boilerplate pairs incomplete even uncapped — fixture broken")
  }

  test("gopher rules: signal values on the passing doc") {
    import spark.implicits._
    val filler = (0 until 48).map(i => f"w$i%02d")
    val docs = Seq((1L, doc(Seq("the", "and") ++ filler))).toDF("doc_id", "text")
    val r = TextOps.gopherRulesOn(docs).collect().head
    assert(r.getAs[Long]("n_words") == 50L)
    assert(r.getAs[Double]("mean_wlen") == 3.0)
    assert(r.getAs[Double]("frac_alpha") == 1.0)
    assert(r.getAs[Long]("n_stop") == 2L)
    // 49 distinct bigrams -> top mass 1/49
    assert(math.abs(r.getAs[Double]("top_bigram_frac") - 0.020408) < 1e-9)
  }
}
