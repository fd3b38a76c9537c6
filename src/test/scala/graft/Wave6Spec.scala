package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, GraphOps, Relational}
import graft.streaming.EventOps

/** r8 wave-6 operators: the revenue trend series, RFM customer
  * segmentation, and the rolling distinct-actives series. */
class Wave6Spec extends SparkSpecBase {

  // ---------------------------------------------------------------- R26

  test("revenue trend: brute-force replay of ma7 and wow over daily sums") {
    val s = spark
    import s.implicits._
    val daily = Tables.orders(s, sfDir)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(sum($"o_totalprice".cast("decimal(18,6)")).as("rev"))
      .orderBy($"day").collect()
      .map(r => (r.getDate(0).toString, r.getDecimal(1)))
    val revs = daily.map(_._2)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Relational.revenueTrend(s, sfDir).collect()
    assert(got.length == daily.length)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDate(0).toString == daily(i)._1)
      assert(math.abs(r.getDouble(1) - revs(i).doubleValue) < 1e-6)
      val lo = math.max(0, i - 6)
      val window = revs.slice(lo, i + 1)
      val expMa = r6(window.reduce(_ add _).doubleValue / window.length)
      assert(math.abs(r.getDouble(2) - expMa) < 1e-9, s"ma7 day $i")
      if (i >= 7)
        assert(math.abs(r.getDouble(3) -
          r6(revs(i).doubleValue / revs(i - 7).doubleValue)) < 1e-9, s"wow day $i")
      else assert(r.isNullAt(3), s"wow day $i should be null")
    }
  }

  // ---------------------------------------------------------------- R27

  test("rfm: buckets replay a plain window ranking and are balanced") {
    val s = spark
    import s.implicits._
    val base = Tables.orders(s, sfDir)
      .groupBy($"o_custkey")
      .agg(max(to_date($"o_orderdate")).as("last_order"),
        count(lit(1)).as("n_orders"),
        Relational.dsum($"o_totalprice").as("revenue"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).getTime, r.getLong(2), r.getDouble(3)))
    val n = base.length
    def bucketOf(rk: Long): Int =
      if (rk * 5 <= n) 1 else if (rk * 5 <= 2L * n) 2
      else if (rk * 5 <= 3L * n) 3 else if (rk * 5 <= 4L * n) 4 else 5
    def ranks[K](key: ((Long, Long, Long, Double)) => K)(implicit o: Ordering[K])
        : Map[Long, Long] =
      base.sortBy(key).zipWithIndex.map { case (r, i) => r._1 -> (i + 1L) }.toMap
    val rkR = ranks(r => (-r._2, r._1))
    val rkF = ranks(r => (-r._3, r._1))
    val rkM = ranks(r => (-r._4, r._1))
    val got = Relational.rfmSegments(s, sfDir).collect()
    assert(got.length == n)
    got.foreach { r =>
      val ck = r.getLong(0)
      assert(r.getInt(4) == bucketOf(rkR(ck)), s"r_bucket cust $ck")
      assert(r.getInt(5) == bucketOf(rkF(ck)), s"f_bucket cust $ck")
      assert(r.getInt(6) == bucketOf(rkM(ck)), s"m_bucket cust $ck")
      assert(r.getString(7) == s"${r.getInt(4)}${r.getInt(5)}${r.getInt(6)}")
    }
    // quintiles differ by at most one member
    val sizes = got.groupBy(_.getInt(4)).values.map(_.length)
    assert(sizes.max - sizes.min <= 1, s"unbalanced recency buckets: $sizes")
  }

  // --------------------------------------------------------------- T15b

  test("bpe encode: corpus counts equal the single-JVM reference encode") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, sfDir).select($"doc_id", lower($"text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val words = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
    val vocab = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val merges = Bpe.referenceMerges(vocab, 10).map(m => (m._2, m._3))
    val nSub = vocab.keys.map(w => w -> Bpe.encodeWord(w, merges).length).toMap
    val exp = docs.map { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      id -> (ws.length.toLong, ws.map(w => nSub(w).toLong).sum)
    }.toMap
    val got = Bpe.bpeEncode(s, sfDir).collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == exp(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
  }

  test("bpe encode: zero merges = chars+1 per word; merges only shrink") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "low low lower"), (2L, "aa aa")).toDF("doc_id", "text")
    val zero = Bpe.bpeEncodeOf(docs, nMerges = 0, cacheKey = "bpe-t0")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // "low"=4 syms ×2 + "lower"=6 → 14; "aa"=3 syms ×2 → 6
    assert(zero == Map(1L -> 14L, 2L -> 6L))
    val merged = Bpe.bpeEncodeOf(docs, nMerges = 5, cacheKey = "bpe-t5")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    merged.foreach { case (id, n) => assert(n <= zero(id), s"doc $id grew") }
    // after (l,o),(lo,w),(low,</w>) the word "low" is ONE token
    assert(merged(1L) <= 1 + 1 + 6)
  }

  // ---------------------------------------------------------------- G15

  test("weighted paths: heavy 2-hop route beats a light direct edge") {
    val s = spark
    import s.implicits._
    // 1-3 co-bought once (cost 1e6); 1-2 and 2-3 co-bought 10× (1e5 each)
    val edges = Seq((1L, 3L, 1L), (1L, 2L, 10L), (2L, 3L, 10L))
      .toDF("src", "dst", "weight")
    val got = GraphOps.weightedPathsOf(edges, nLandmarks = 1, maxIter = 6)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> 0L, 2L -> 100000L, 3L -> 200000L))
  }

  test("weighted paths: corpus result equals a reference Bellman-Ford fold") {
    val s = spark
    import s.implicits._
    val e = Tables.lineitem(s, sfDir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = e.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val pks = rows.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- i + 1 until pks.length) yield (pks(i), pks(j))
    }
    val w = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val arcs = w.toSeq.flatMap { case ((a, b), cnt) =>
      val c = 1000000L / cnt
      Seq((a, b, c), (b, a, c))
    }
    val nodes = arcs.map(_._1).distinct.sorted
    val landmarks = nodes.take(3)
    val exp = landmarks.flatMap { lm =>
      var dist = Map(lm -> 0L)
      for (_ <- 1 to 6) {
        val relaxed = arcs.flatMap { case (a, b, c) =>
          dist.get(a).map(da => b -> (da + c))
        }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
          .mapValues(_.map(_._2).min).toMap
      }
      dist.map { case (n, d) => (lm, n, d) }
    }.toSet
    val got = GraphOps.weightedPaths(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp)
  }

  // ----------------------------------------------------------------- F5

  test("count-min: one-sided error, ε-bound, and partitioning invariance") {
    val s = spark
    import s.implicits._
    val width = 64
    val depth = 4
    val cm = new graft.functions.CountMin(width, depth)
    val keys = Tables.events(s, sfDir)
      .select(concat($"event_type", lit(":"), ($"user_id" % 7).cast("string")))
      .as[String]
    val sketch = keys.select(cm.toColumn).head()
    val truth = keys.collect().groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = truth.values.sum
    assert(sketch.sum == n * depth, "mass conservation per row")
    truth.foreach { case (k, t) =>
      val est = graft.functions.CountMin.estimate(sketch, k, width, depth)
      assert(est >= t, s"one-sided violated for $k")
      // ε = e/width; all depth rows exceeding the bound at once is ~2^-depth
      assert(est <= t + (math.E / width * n).toLong + 1, s"ε-bound blown for $k")
    }
    // identical sketch under a different partitioning: merge is exact
    val re = keys.repartition(7).select(cm.toColumn).head()
    assert(re.sameElements(sketch), "sketch depends on partitioning")
  }

  // ---------------------------------------------------------------- S18

  test("rolling actives: replay of DAU and the 7-day distinct union") {
    val s = spark
    import s.implicits._
    val pairs = Tables.events(s, sfDir)
      .select(to_date($"ts").as("d"), $"user_id").distinct().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val byDay = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val days = byDay.keys.toSeq.sorted(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val got = EventOps.rollingActivesQuery(s, sfDir).collect()
    assert(got.map(_.getDate(0).toLocalDate).toSeq == days)
    got.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(r.getLong(1) == byDay(d).size.toLong, s"dau $d")
      val win = (0 to 6).flatMap(k => byDay.getOrElse(d.minusDays(k), Set.empty))
      assert(r.getLong(2) == win.toSet.size.toLong, s"active_7d $d")
      assert(r.getLong(2) >= r.getLong(1), s"rolling >= daily at $d")
    }
  }
}
