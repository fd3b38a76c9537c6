package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{TemporalJoins, VecPca, VectorOps}
import graft.streaming.{EventOps, HeavyHitters}
import graft.streaming.HeavyHitters.{Ev, ShardSummary}

/** r8 wave-5 operators: Matryoshka truncated retrieval, the behavioral
  * transition matrix, the SCD2 dimension lookup, PCA projection, and
  * streaming SpaceSaving heavy hitters. */
class Wave5Spec extends SparkSpecBase {

  // ---------------------------------------------------------------- V14

  test("matryoshka: full candidate budget reproduces exact cosine top-k") {
    val exact = VectorOps.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val m = VectorOps.matryoshkaAnn(spark, sfDir, cands = 1000000).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(m.toSeq == exact.toSeq)
  }

  test("matryoshka: prefix scores equal a sliced brute-force recompute") {
    val s = spark
    import s.implicits._
    val raw = VectorOps.normed(s, sfDir).select($"vec_id", $"v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def pcos(a: Seq[Double], b: Seq[Double]): Double = {
      val (pa, pb) = (a.take(16), b.take(16))
      val dot = pa.zip(pb).map { case (x, y) => x * y }.sum
      val n = math.sqrt(pa.map(x => x * x).sum) * math.sqrt(pb.map(x => x * x).sum)
      BigDecimal(dot / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val out = VectorOps.matryoshkaAnn(s, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(math.abs(r.getDouble(1) - pcos(raw(r.getLong(0)), raw(0L))) < 1e-9,
        s"vec ${r.getLong(0)}")
    }
  }

  // ---------------------------------------------------------------- S16

  test("transitions: brute-force replay of the pair counts and probabilities") {
    val s = spark
    import s.implicits._
    val ev = Tables.events(s, sfDir)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)).map(_._4)
      sorted.zip(sorted.tail)
    }
    val counts = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val prevTotals = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val got = EventOps.transitionsQuery(s, sfDir).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet == counts.keySet)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == counts(key), s"count $key")
      val expP = BigDecimal(counts(key).toDouble / prevTotals(key._1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expP) < 1e-9, s"prob $key")
    }
    // each prev row's probabilities sum to ~1
    got.groupBy(_.getString(0)).foreach { case (prev, rows) =>
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4, s"row $prev")
    }
  }

  // ----------------------------------------------------------------- J3

  test("scd2 lookup: every purchase carries the state in force at its instant") {
    val s = spark
    import s.implicits._
    val ev = Tables.events(s, sfDir)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val got = TemporalJoins.scd2Lookup(s, sfDir).collect()
    val nPurchases = ev.count(_._4 == "purchase")
    assert(got.length == nPurchases, "one row per purchase, no interval double-match")
    // ground truth: the state at a purchase is the event_type of the last
    // NON-purchase event at-or-before it (the activity dimension; a
    // change effective at t governs a purchase at t), null if none
    val byUser = ev.filter(_._4 != "purchase").groupBy(_._1).view
      .mapValues(_.sortBy(r => (r._2, r._3))).toMap
    val purchases = ev.filter(_._4 == "purchase")
      .map(r => (r._1, r._3) -> r._2).toMap
    var nonNull = 0
    got.foreach { r =>
      val (u, pid) = (r.getLong(0), r.getLong(1))
      val t = purchases((u, pid))
      val expState = byUser.getOrElse(u, Array.empty[(Long, Long, Long, String)])
        .takeWhile(e => e._2 <= t).lastOption.map(_._4)
      assert(Option(r.getString(4)) == expState, s"purchase $pid state")
      if (expState.isDefined) nonNull += 1
    }
    assert(nonNull > 0, "degenerate corpus: no purchase has prior activity")
    assert(got.map(_.getString(4)).filter(_ != null).distinct.length > 1,
      "activity dimension should carry more than one state value")
  }

  // ---------------------------------------------------------------- V15

  test("pca: components orthonormal, eigenvalues descending, variance identity") {
    val s = spark
    import s.implicits._
    val e = VectorOps.normed(s, sfDir).select($"vec_id", $"v")
    val (evals, comps, _) = VecPca.fit(e, 8)
    assert(evals.length == 8 && comps.length == 8)
    for (i <- evals.indices.tail) assert(evals(i - 1) >= evals(i) - 1e-12)
    evals.foreach(ev => assert(ev >= -1e-12))
    for (i <- comps.indices; j <- i until comps.length) {
      val dot = comps(i).zip(comps(j)).map { case (a, b) => a * b }.sum
      val exp = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - exp) < 1e-9, s"<c$i,c$j> = $dot")
    }
    // the variance of each projected coordinate IS its eigenvalue
    val proj = VecPca.pcaProjectOn(e, 3).collect()
    for (j <- 0 until 3) {
      val xs = proj.map(_.getDouble(1 + j))
      val mu = xs.sum / xs.length
      val varS = xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
      assert(math.abs(varS - evals(j)) < 1e-6 * math.max(1.0, evals(j)),
        s"pc$j variance $varS vs eigenvalue ${evals(j)}")
    }
  }

  test("pca: recovers a planted direction") {
    val s = spark
    import s.implicits._
    // all variance lives along axis 7 (coefficients -5..5 around a
    // constant offset); everything else is constant
    val base = Seq.tabulate(64)(i => 0.25 * (i % 3))
    val rows = (0 to 10).map { t =>
      val v = base.updated(7, base(7) + (t - 5).toDouble)
      (t.toLong, v)
    }
    val e = rows.toDF("vec_id", "v")
    val (evals, comps, _) = VecPca.fit(e, 2)
    assert(math.abs(math.abs(comps(0)(7)) - 1.0) < 1e-9, "top component != axis 7")
    assert(evals(0) > 1.0 && math.abs(evals(1)) < 1e-9,
      s"expected rank-1 spectrum, got ${evals.toSeq}")
    // canonical sign: the dominant entry is positive
    assert(comps(0)(7) > 0)
  }

  // ---------------------------------------------------------------- S17

  test("heavy hitters: stream ≡ reference fold, SpaceSaving guarantees hold") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // skewed arrivals: user 1 dominates, user 2 next, a tail of 20 users
    val nShards = 2
    val capacity = 4
    val arrivals = (Seq.fill(50)(1L) ++ Seq.fill(30)(2L) ++
      (10L until 30L).flatMap(u => Seq.fill(2)(u)))
    val evs = arrivals.zipWithIndex.map { case (u, i) => Ev(i.toLong, u) }
    val (b1, b2) = evs.splitAt(evs.length / 2)

    val mem = MemoryStream[Ev]
    val q = HeavyHitters(mem.toDS(), nShards, capacity)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("append").start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    // latest emission per shard = the current summary; replay the same
    // fold single-JVM per shard over the full arrival order
    val emitted = s.table("hh_out").as[ShardSummary].collect()
    val lastByShard = (0 until nShards).map { sh =>
      sh -> emitted.filter(_.shard == sh)
        .groupBy(_.key).map { case (k, rows) => k -> rows.last }
    }.toMap
    for (sh <- 0 until nShards) {
      val shardArrivals = evs.filter(e => math.floorMod(e.user_id, nShards.toLong) == sh)
        .sortBy(_.event_id).map(_.user_id)
      val ref = HeavyHitters.spaceSavingFold(shardArrivals, capacity)
      val got = lastByShard(sh).map { case (k, c) => k -> ((c.est, c.err)) }
      assert(got == ref, s"shard $sh stream vs reference")
      // guarantees vs exact truth
      val truth = shardArrivals.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = shardArrivals.length.toLong
      assert(ref.values.map(_._1).sum == n, "counts conserved")
      ref.foreach { case (k, (est, err)) =>
        assert(est >= truth(k), s"under-estimate for $k")
        assert(est - err <= truth(k), s"error bound broken for $k")
      }
      truth.filter(_._2 > n / capacity).keys.foreach(k =>
        assert(ref.contains(k), s"heavy hitter $k missing from shard $sh"))
    }
    // the dominant users survive in their shards' summaries
    assert(lastByShard(math.floorMod(1L, nShards.toLong).toInt).contains(1L))
    assert(lastByShard(math.floorMod(2L, nShards.toLong).toInt).contains(2L))
  }
}
