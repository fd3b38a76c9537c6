package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, TextOps}

/** r14 wave, part 2: the community-quality readout (g_modularity), the
  * Kneser-Ney LM scorer (t_kn_logprob) and the Naive-Bayes quality
  * classifier (t_quality_classifier). Fixtures pin hand-computed values;
  * the corpus legs replay the full float discipline in plain Scala. */
class Wave14bSpec extends SparkSpecBase {

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  // --- g_modularity ------------------------------------------------------

  private def twoTriangles = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L),
      (4L, 5L, 1L), (4L, 6L, 1L), (5L, 6L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "weight")
  }

  test("modularity: hand-computed Q on two bridged triangles") {
    val s = spark
    import s.implicits._
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("v", "lbl")
    val rows = GraphOps.modularityScoreOf(twoTriangles, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // m=7; each triangle: w_in=3, k_tot=7 ⇒ q = 3/7 − (7/14)² = 0.178571
    val q = round6(3.0 / 7.0 - 0.25)
    assert(rows.toSeq == Seq((10L, 3L, 3L, 7L, q), (20L, 3L, 3L, 7L, q)))
  }

  test("modularity: the one-community labeling scores exactly 0") {
    val s = spark
    import s.implicits._
    val labels = (1L to 6L).map(v => (v, 1L)).toDF("v", "lbl")
    val rows = GraphOps.modularityScoreOf(twoTriangles, labels).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(2) == 7L && rows(0).getLong(3) == 14L)
    assert(rows(0).getDouble(4) == 0.0)
  }

  test("modularity: singleton labeling has no intra edges, Q < 0") {
    val s = spark
    import s.implicits._
    val labels = (1L to 6L).map(v => (v, v)).toDF("v", "lbl")
    val rows = GraphOps.modularityScoreOf(twoTriangles, labels).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getLong(2) == 0L))
    assert(rows.map(_.getDouble(4)).sum < 0.0)
  }

  test("modularity: corpus invariants tie out against the edge frame") {
    val s = spark
    import s.implicits._
    val e = GraphOps.copurchaseEdges(s, sfDir)
      .agg(sum($"weight").as("m"), count(lit(1)).as("ne")).first()
    val (m, _) = (e.getLong(0), e.getLong(1))
    val nNodes = GraphOps.degree(s, sfDir).count()
    val rows = GraphOps.modularity(s, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == nNodes)   // Σ n_nodes = |V|
    assert(rows.map(_.getLong(3)).sum == 2L * m)   // Σ k_tot  = 2m
    val wIn = rows.map(_.getLong(2)).sum
    assert(wIn >= 0L && wIn <= m)                  // intra ⊆ all edges
    val q = rows.map(_.getDouble(4)).sum
    assert(q >= -0.5 && q <= 1.0, s"Q=$q out of range")
    // at sf0.001 the dense co-purchase graph collapses to ONE label
    // under min-label LPA — the one-community identity Q=0 must hold
    // exactly then (the fixture test pins Q>0 for real structure)
    if (rows.length == 1) assert(q == 0.0, s"one community but Q=$q")
  }

  // --- t_kn_logprob ------------------------------------------------------

  /** Plain-Scala replay of the exact KN float discipline. */
  private def knRef(docs: Seq[(Long, String)]): Map[Long, (Double, Long)] = {
    val bgs = docs.flatMap { case (id, t) =>
      val w = t.toLowerCase.split(" ", -1)
      if (w.length < 2) Seq.empty
      else w.init.zip(w.tail).map { case (a, b) => (id, a, b) }
    }
    val tf = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cf = tf.groupBy { case ((_, a, b), _) => (a, b) }
      .view.mapValues(_.values.sum).toMap
    val c1 = cf.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1w1 = cf.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1w2 = cf.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val n1all = cf.size.toDouble
    val terms = tf.toSeq.map { case ((id, a, b), n) =>
      val p = (cf((a, b)).toDouble - 0.75) / c1(a).toDouble +
        0.75 * n1w1(a).toDouble / c1(a).toDouble * (n1w2(b).toDouble / n1all)
      (id, n, round6(n * round6(math.log10(p))))
    }
    terms.groupBy(_._1).map { case (id, ts) =>
      val sum = ts.map(t => java.math.BigDecimal.valueOf(t._3)
        .setScale(6, java.math.RoundingMode.HALF_UP))
        .reduce(_ add _)
      val n = ts.map(_._2).sum
      id -> (sum.doubleValue / n, n)
    }
  }

  test("kn_logprob: fixture equals the plain-Scala KN replay") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the dog sat on the cat",
      3L -> "a dog and a cat and a mat")
    val got = TextOps.knLogprobOn(docs.toDF("doc_id", "text"), 0.75)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    val exp = knRef(docs)
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, (lp, n)) =>
      assert(n == exp(id)._2)
      assert(math.abs(lp - exp(id)._1) < 1e-12, s"doc $id: $lp vs ${exp(id)._1}")
    }
  }

  test("kn_logprob: every probability is in (0,1] so scores are ≤ 0; " +
    "smoothing keeps them finite") {
    val rows = TextOps.knLogprob(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lp = r.getDouble(1)
      assert(!lp.isNaN && !lp.isInfinite && lp <= 0.0, s"$r")
      assert(r.getLong(2) >= 1L)
    }
  }

  test("kn_logprob: continuation counts separate equally-frequent bigrams") {
    val s = spark
    import s.implicits._
    // the Kneser-Ney insight: (aa,bb) and (dd,ee) have IDENTICAL bigram
    // and prefix counts, but bb continues two distinct contexts while ee
    // continues one — bb earns more of the discounted mass, so doc 1
    // must outscore doc 3 (raw MLE scores them identically)
    val docs = Seq(1L -> "aa bb", 2L -> "cc bb", 3L -> "dd ee")
    val got = TextOps.knLogprobOn(docs.toDF("doc_id", "text"), 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(3L), s"$got")
    assert(got(1L) == got(2L))
  }

  // --- t_quality_classifier ---------------------------------------------

  private def nbRef(docs: Seq[(Long, String, String)],
      pos: Set[String]): Map[Long, (Long, Double, Boolean)] = {
    val toks = docs.flatMap { case (id, src, t) =>
      t.toLowerCase.split(" ", -1).map(w => (id, pos(src), w))
    }
    val tf = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byWord = tf.groupBy(_._1._3)
    val cpos = byWord.view.mapValues(_.collect {
      case ((_, true, _), n) => n }.sum).toMap
    val cneg = byWord.view.mapValues(_.collect {
      case ((_, false, _), n) => n }.sum).toMap
    val (tpos, tneg, v) = (cpos.values.sum, cneg.values.sum, byWord.size.toLong)
    val npos = docs.count(d => pos(d._2)).toDouble
    val nneg = docs.count(d => !pos(d._2)).toDouble
    val prior = math.log10(npos / nneg)
    val lo = byWord.keys.map { w =>
      w -> round6(
        math.log10((cpos(w) + 1).toDouble / (tpos + v).toDouble) -
          math.log10((cneg(w) + 1).toDouble / (tneg + v).toDouble))
    }.toMap
    tf.toSeq.groupBy(_._1._1).map { case (id, ts) =>
      val sum = ts.map { case ((_, _, w), n) =>
        java.math.BigDecimal.valueOf(round6(n * lo(w)))
          .setScale(6, java.math.RoundingMode.HALF_UP)
      }.reduce(_ add _)
      val n = ts.map(_._2).sum
      val score = round6(prior + sum.doubleValue)
      id -> (n, score, score > 0)
    }
  }

  test("quality_classifier: separable vocab classifies by source") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "good", "insightful thorough prose with careful structure"),
      (2L, "good", "careful thorough writing insightful and structured"),
      (3L, "junk", "spam spam click here click here spam"),
      (4L, "junk", "click spam here spam click spam"),
      // held-out-shaped rows: vocab from one class only
      (5L, "junk", "insightful careful thorough structured prose"),
      (6L, "good", "spam click here spam click"))
    val got = TextOps.qualityClassifierOn(
      docs.toDF("doc_id", "source", "text"), Seq("good"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(got(1L)._3 && got(2L)._3, "curated-vocab docs must score positive")
    assert(!got(3L)._3 && !got(4L)._3, "spam-vocab docs must score negative")
    // the classifier follows the WORDS, not the label column
    assert(got(5L)._3 && !got(6L)._3)
    val exp = nbRef(docs, Set("good"))
    got.foreach { case (id, (n, sc, p)) =>
      assert((n, sc, p) == exp(id), s"doc $id: got ${(n, sc, p)} exp ${exp(id)}")
    }
  }

  test("kn_logprob: the smoothed conditional is a proper distribution — " +
    "P sums to exactly 1 over the vocab for every observed prefix") {
    // algebra the spec pins: Σ_observed (c−D)/c1 = (c1 − D·N1+(w1·))/c1
    // and Σ_vocab Pcont = 1, so the interpolation returns the discount
    // exactly. A wrong denominator, a mis-joined continuation count, or
    // an un-redistributed discount all break this.
    val docs = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the dog sat on the cat",
      3L -> "a dog and a cat and a mat the end")
    val bgs = docs.flatMap { case (_, t) =>
      val w = t.split(" ", -1); w.init.zip(w.tail)
    }
    val cf = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = cf.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1w1 = cf.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1w2 = cf.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val n1all = cf.size.toDouble
    val vocab = (bgs.map(_._1) ++ bgs.map(_._2)).distinct
    c1.keys.foreach { w1 =>
      val sum = vocab.map { w2 =>
        val c = cf.getOrElse((w1, w2), 0L)
        val disc = if (c > 0) (c - 0.75) / c1(w1) else 0.0
        disc + 0.75 * n1w1(w1) / c1(w1) *
          (n1w2.getOrElse(w2, 0L).toDouble / n1all)
      }.sum
      assert(math.abs(sum - 1.0) < 1e-12, s"prefix '$w1': ΣP=$sum")
    }
  }

  // --- p_mix_budget --------------------------------------------------------

  test("mix_budget: hand-computed plan on a two-source fixture; invariants") {
    val s = spark
    import s.implicits._
    // src a: 4 docs x 4 words = 16 tokens; src b: 1 doc x 4 words = 4
    val docs = (1 to 4).map(i => (i.toLong, "a", "w x y z")) :+
      ((5L, "b", "w x y z"))
    val out = operators.Sampling.mixBudgetOf(
      docs.toDF("doc_id", "source", "text"), 0.5, 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
      .toMap
    // sw(a)=4, sw(b)=2, S=6: share a=0.666667, b=0.333333
    // quota a = floor(100*4/6)=66, b = floor(100*2/6)=33
    assert(out("a") == ((16L, round6(4.0 / 6.0), 66L, round6(66.0 / 16.0), 5L)))
    assert(out("b") == ((4L, round6(2.0 / 6.0), 33L, round6(33.0 / 4.0), 9L)))
    // corpus invariants at sf0.001
    val corpus = operators.Sampling.mixBudget(s, sfDir).collect()
    val shares = corpus.map(_.getDouble(2)).sum
    assert(math.abs(shares - 1.0) < 1e-3)
    assert(corpus.map(_.getLong(3)).sum <= 1000000L) // Σ quota ≤ B
    corpus.foreach { r =>
      assert(r.getLong(5) == math.ceil(r.getLong(3).toDouble / r.getLong(1)).toLong)
    }
  }

  // --- p_curriculum -------------------------------------------------------

  test("curriculum: phases partition the corpus by tier, positions are dense") {
    val s = spark
    import s.implicits._
    val cur = operators.Sampling.curriculum(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val tiers = TextOps.qualityTiers(s, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // total order: every doc exactly once, phase == its quality tier
    assert(cur.map(_._4).distinct.length == tiers.size)
    assert(cur.length == tiers.size)
    cur.foreach { case (ph, _, _, id) => assert(ph == tiers(id), s"doc $id") }
    // dense per-(phase, shard) positions starting at 0
    cur.groupBy(c => (c._1, c._2)).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.length).toSeq)
    }
    // deterministic: a second run is bit-identical
    val again = operators.Sampling.curriculum(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(cur.toSeq == again.toSeq)
  }

  test("quality_classifier: corpus scores equal the plain-Scala NB replay") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, sfDir)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val exp = nbRef(docs, Set("src0", "src1", "src2"))
    val got = TextOps.qualityClassifier(s, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, (n, sc, p)) =>
      assert(n == exp(id)._1, s"doc $id tokens")
      assert(math.abs(sc - exp(id)._2) < 1e-9, s"doc $id: $sc vs ${exp(id)._2}")
      assert(p == exp(id)._3, s"doc $id pred")
    }
  }
}
