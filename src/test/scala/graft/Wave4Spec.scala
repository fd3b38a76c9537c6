package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Drift, GraphOps, Sampling, VectorOps}

/** r8 wave-4 operators: binary-quantization ANN, Adamic-Adar, k-core,
  * temperature sampling, PSI drift, BPE merge training. */
class Wave4Spec extends SparkSpecBase {

  private def edges(pairs: (Long, Long)*): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    pairs.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "weight")
  }

  // ---------------------------------------------------------------- V13

  test("bq ann: sign-pack kernel matches a bit-by-bit Scala reference") {
    val s = spark
    import s.implicits._
    val e = VectorOps.normed(s, sfDir).select($"vec_id", $"v")
    val got = VectorOps.bqSigsOf(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val raw = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(raw.nonEmpty)
    raw.foreach { case (id, v) =>
      def pack(off: Int): Long =
        (0 until 32).foldLeft(0L)((acc, i) =>
          if (v(off + i) > 0.0) acc | (1L << i) else acc)
      assert(got(id) == ((pack(0), pack(32))), s"vec $id")
    }
  }

  test("bq ann: full candidate budget reproduces exact cosine top-k") {
    // with cands >= corpus the Hamming prefilter keeps everything, so the
    // re-rank IS brute force — the approximation is only the budget
    val exact = VectorOps.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val bq = VectorOps.bqAnn(spark, sfDir, cands = 1000000).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(bq.toSeq == exact.toSeq)
  }

  test("bq ann: identical vectors share a signature (hamming 0)") {
    val s = spark
    import s.implicits._
    val v = Seq.tabulate(64)(i => if (i % 3 == 0) -0.5 else 0.25)
    val e = Seq((1L, v), (2L, v)).toDF("vec_id", "v")
    val sigs = VectorOps.bqSigsOf(e).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(sigs(0) == sigs(1))
  }

  // ---------------------------------------------------------------- G13

  test("adamic-adar: hand-computed wedge scores on fixtures") {
    // path 1-3-2: z=3 is the only common neighbor, deg(3)=2
    val path = GraphOps.adamicAdarOf(edges((1L, 3L), (2L, 3L)), 10).collect()
    assert(path.length == 1)
    assert(path(0).getLong(0) == 1L && path(0).getLong(1) == 2L)
    assert(math.abs(path(0).getDouble(3) - 1.442695) < 1e-6) // 1/ln 2
    // square 1-2-3-4: (1,3) share {2,4}, (2,4) share {1,3}, all deg 2
    val sq = GraphOps.adamicAdarOf(
      edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)), 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(sq.keySet == Set((1L, 3L), (2L, 4L)))
    sq.values.foreach(v => assert(math.abs(v - 2.88539) < 1e-5)) // 2/ln 2
  }

  test("adamic-adar: niche common neighbor outweighs a bestseller") {
    // 1 and 2 share niche z=3 (deg 2) in one fixture, and hub z=3 with
    // extra neighbors 4..9 (deg 8) in the other — same n_common, the
    // hub-mediated score must be smaller (the 1/ln d weighting)
    def score(extra: Seq[(Long, Long)]): Double =
      GraphOps.adamicAdarOf(edges((1L, 3L) +: (2L, 3L) +: extra: _*), 100)
        .collect().filter(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
        .head.getDouble(3)
    val niche = score(Nil)
    val hub = score((4L to 9L).map(n => (3L, n)))
    assert(hub < niche)
  }

  test("adamic-adar: over-budget reroute finds a high-overlap pair with exact scores") {
    // planted near-identical neighborhoods: 1 and 2 share all of 3..12 —
    // the banding twin must find (1,2) and score it EXACTLY as the wedge
    // path does (each shared z has deg 2 ⇒ AA = 10/ln 2)
    val planted = edges((3L to 12L).flatMap(z => Seq((1L, z), (2L, z))): _*)
    val exact = GraphOps.adamicAdarOf(planted, 100).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val rerouted = GraphOps.adamicAdarOf(planted, 100, maxPairWork = 1L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(rerouted.contains((1L, 2L)))
    assert(rerouted((1L, 2L)) == exact((1L, 2L)))
    assert(math.abs(rerouted((1L, 2L))._2 - 10.0 / math.log(2.0)) < 1e-4)
    // no phantom pairs: every rerouted pair exists in the exact relation
    // with the identical (n_common, score)
    rerouted.foreach { case (p, v) => assert(exact(p) == v, s"pair $p") }
  }

  // ---------------------------------------------------------------- G14

  test("k-core: triangle with a pendant — pendant peels, triangle stays") {
    val g = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val core2 = GraphOps.kCoreOf(g, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(GraphOps.kCoreOf(g, 3).collect().isEmpty) // cascade to empty
  }

  test("k-core: removing a shell node cascades (peel is transitive)") {
    // chain 5-6 hangs off the triangle through 5: 6 peels (deg 1), THEN 5
    // peels (deg drops to 1 after 6 leaves) — one round is not enough
    val g = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 5L), (5L, 6L))
    val core2 = GraphOps.kCoreOf(g, 2).collect().map(_.getLong(0)).toSet
    assert(core2 == Set(1L, 2L, 3L))
  }

  test("k-core: corpus core is deterministic and respects the k bound") {
    val a = GraphOps.kCore(spark, sfDir).collect()
    val b = GraphOps.kCore(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
    // every survivor keeps >= k neighbors INSIDE the core (the defining
    // property — vacuous only if the core is empty at this sf)
    a.foreach(r => assert(r.getLong(1) >= 80L, s"part ${r.getLong(0)}"))
  }

  // ----------------------------------------------------------------- P9

  test("temperature sample: per-source quotas follow n^alpha shares") {
    val s = spark
    import s.implicits._
    val k = 200
    val counts = Tables.documents(s, sfDir).groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sw = counts.map { case (src, n) =>
      src -> BigDecimal(math.pow(n.toDouble, 0.5))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) }
    val tot = sw.values.sum
    val expected = sw.map { case (src, w) =>
      src -> math.min(
        math.floor(k * (w.toDouble / tot.toDouble)).toLong, counts(src)) }
    val got = Sampling.temperatureSample(s, sfDir, 0.5, k).collect()
      .groupBy(_.getString(0)).map { case (src, rows) => src -> rows.length.toLong }
    expected.filter(_._2 > 0).foreach { case (src, q) =>
      assert(got.getOrElse(src, 0L) == q, s"source $src") }
  }

  test("temperature sample: alpha=1 keeps natural proportions, low alpha flattens") {
    // the corpus sources are uniform by construction, so skew comes from a
    // fixture: src_a 90 docs, src_b 10 docs, budget 50
    val s = spark
    import s.implicits._
    val docs = ((1 to 90).map(i => ("src_a", i.toLong)) ++
      (1 to 10).map(i => ("src_b", (100 + i).toLong))).toDF("source", "doc_id")
    def shares(alpha: Double): Map[String, Long] =
      Sampling.temperatureSampleOf(docs, alpha, 50).collect()
        .groupBy(_.getString(0)).map { case (k2, v) => k2 -> v.length.toLong }
    val natural = shares(1.0)
    val flat = shares(0.1)
    // alpha=1: quotas = floor(50*0.9)/floor(50*0.1) = 45/5
    assert(natural == Map("src_a" -> 45L, "src_b" -> 5L))
    // flattening narrows the big:small ratio toward 1
    assert(flat("src_a").toDouble / flat("src_b") <
      natural("src_a").toDouble / natural("src_b"))
    assert(flat("src_b") > 5L)
  }

  // ---------------------------------------------------------------- P10

  test("psi drift: brute-force replay of the whole computation") {
    val s = spark
    import s.implicits._
    val ev = Tables.events(s, sfDir)
      .select(unix_micros($"ts").as("us"), $"value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val mid = ev.map(_._1).min + (ev.map(_._1).max - ev.map(_._1).min) / 2
    def bin(v: Double): Int =
      math.min(math.max(math.floor(v / 25.0), 0.0), 19.0).toInt
    val base = ev.filter(_._1 < mid).groupBy(e => bin(e._2)).view.mapValues(_.length.toLong).toMap
    val cur = ev.filter(_._1 >= mid).groupBy(e => bin(e._2)).view.mapValues(_.length.toLong).toMap
    val bins = (base.keySet ++ cur.keySet).toSeq.sorted
    val tb = base.values.sum.toDouble
    val tc = cur.values.sum.toDouble
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expTerms = bins.map { b =>
      val p = (base.getOrElse(b, 0L) + 0.5) / (tb + 10.0)
      val q = (cur.getOrElse(b, 0L) + 0.5) / (tc + 10.0)
      b -> r6((p - q) * math.log(p / q))
    }.toMap
    val got = Drift.psiDrift(s, sfDir).collect()
    assert(got.map(_.getInt(0)).toSeq == bins)
    got.foreach { r =>
      assert(math.abs(r.getDouble(3) - expTerms(r.getInt(0))) < 1e-9,
        s"bin ${r.getInt(0)}")
    }
    val expTotal = r6(expTerms.values.map(BigDecimal(_)).sum.toDouble)
    got.foreach(r => assert(math.abs(r.getDouble(4) - expTotal) < 1e-9))
  }

  // ---------------------------------------------------------------- T15

  test("bpe merges: classic fixture learns the expected first merges") {
    val s = spark
    import s.implicits._
    // Sennrich-style toy vocab {low:5, lower:2, newest:6, widest:3}:
    // e-s, s-t and t-</w> all count 9 (newest 6 + widest 3) — the
    // (count desc, left, right) tie-break picks e-s, then es-t (9),
    // then est-</w> (9) — hand-derived
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val out = Bpe.bpeMergesOf(Seq(text).toDF("text"), 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(out.take(3).toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L)))
    val ref = Bpe.referenceMerges(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 8)
    assert(out.toSeq == ref.map { case (r, a, b, c) => (r, a, b, c) })
  }

  test("bpe merges: distributed rounds equal the single-JVM reference on the corpus") {
    val s = spark
    import s.implicits._
    val vocab = Tables.documents(s, sfDir)
      .select(explode(split(lower($"text"), " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = Bpe.referenceMerges(vocab, 6)
    val got = Bpe.bpeMerges(s, sfDir, 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == ref)
    // merged column is consistent
    Bpe.bpeMerges(s, sfDir, 3).collect().foreach(r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2)))
  }
}
