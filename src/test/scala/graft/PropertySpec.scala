package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.EventOps
import java.sql.Timestamp

/** Property-based invariants over randomized inputs (ScalaCheck
  * generators, fixed seeds): the operators' guarantees must hold for ANY
  * data, not just the test corpus. */
class PropertySpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val eventsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 3L)
      offSec <- Gen.choose(0L, 7200L)
    } yield (user, offSec))
  } yield evs.zipWithIndex.map { case ((u, o), i) => (i.toLong, o, u) }

  test("sessionize: event count conserved, spans bounded, ids contiguous (random streams)") {
    val s = spark
    import s.implicits._
    samples(eventsGen, 5).foreach { evs =>
      val df = evs.map { case (id, off, u) =>
        (id, new Timestamp((1704067200L + off) * 1000L), u)
      }.toDF("event_id", "ts", "user_id")
      val sess = EventOps.sessionize(df).collect()
      assert(sess.map(_.getAs[Long]("n_events")).sum == evs.length)
      sess.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
        val ids = rows.map(_.getAs[Long]("sess_id")).sorted
        assert(ids.toSeq == (1L to ids.length).toSeq)
      }
      sess.foreach { r =>
        val span = r.getAs[Timestamp]("sess_end").getTime - r.getAs[Timestamp]("sess_start").getTime
        assert(span <= (r.getAs[Long]("n_events") - 1) * 1800L * 1000L)
      }
    }
  }

  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 20)
    es <- Gen.listOfN(n, for {
      a <- Gen.choose(1L, 12L)
      b <- Gen.choose(1L, 12L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield es.distinct

  test("node similarity equals an in-memory reference on random graphs") {
    val s = spark
    import s.implicits._
    def r6(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    samples(graphGen, 5).filter(_.nonEmpty).foreach { es =>
      val edges = es.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "weight")
      val got = operators.GraphOps.nodeSimilarityOf(edges, k = 1000).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      val nbrs = (es ++ es.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val nodes = nbrs.keys.toSeq.sorted
      val want = (for {
        a <- nodes; b <- nodes if a < b
        common = nbrs(a).intersect(nbrs(b)).size if common > 0
      } yield (a, b) -> (common.toLong,
        r6(common.toDouble / (nbrs(a).size + nbrs(b).size - common)))).toMap
      assert(got == want, s"edges=$es\ngot=$got\nwant=$want")
    }
  }

  // Random duplicate-group profiles: each group is g exact clones of a
  // short random text; distinct groups may still be near-dups (shared
  // vocabulary) or even accidentally identical — the gate criterion is
  // computed over ACTUAL identical-text groups, not the planted profile.
  private val cloneCorpusGen: Gen[List[(Long, String)]] = for {
    nGroups <- Gen.choose(1, 5)
    groups <- Gen.listOfN(nGroups, for {
      size <- Gen.frequency(3 -> Gen.choose(1, 2), 2 -> Gen.choose(3, 9))
      nw <- Gen.choose(1, 7)
      ws <- Gen.listOfN(nw, Gen.oneOf("alpha", "beta", "gamma", "delta", "x1"))
    } yield (size, ws.mkString(" ")))
  } yield groups.flatMap { case (size, text) => List.fill(size)(text) }
    .zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }

  test("collapse gate: fires iff clone mass exceeds the corpus; flat ≡ collapsed always") {
    val s = spark
    import s.implicits._
    var n = 0
    samples(cloneCorpusGen, 6).foreach { docs =>
      n += 1
      val df = docs.toDF("doc_id", "text")
      // the Σg² > 2n criterion replayed in memory over identical-text groups
      val wantCollapse = docs.groupBy(_._2).values
        .map(g => g.size.toLong * g.size).sum > 2L * docs.size
      assert(operators.Dedup.hasExactClones(df, s"clonechk:prop-gate-$n") == wantCollapse,
        s"gate disagrees with Σg²>2n on $docs")
      // both pipelines forced on the SAME corpus must emit identical pairs
      val flat = operators.Dedup.ngramJaccardLshOn(df, s"prop-gate-$n-f",
        collapseOverride = Some(false)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val coll = operators.Dedup.ngramJaccardLshOn(df, s"prop-gate-$n-c",
        collapseOverride = Some(true)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(flat == coll,
        s"paths disagree on $docs:\nflat-only=${flat -- coll}\ncoll-only=${coll -- flat}")
      Caches.clearAll()
    }
  }

  private val textGen: Gen[String] = for {
    n <- Gen.choose(1, 50)
    ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "y2"))
  } yield ws.mkString(" ")

  test("fingerprint: invariant to word order and repetition (random texts)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    samples(textGen, 5).foreach { text =>
      val shuffled = new scala.util.Random(7).shuffle(text.split(" ").toList).mkString(" ")
      val doubled = text + " " + text
      val fps = Seq((0L, text), (1L, shuffled), (2L, doubled))
        .toDF("doc_id", "text")
        .select(md5(concat_ws(" ",
          array_sort(array_distinct(split(lower(col("text")), " "))))).as("fp"))
        .collect().map(_.getString(0))
      assert(fps.distinct.length == 1, s"fingerprint not canonical for: $text")
    }
  }

  test("dup clusters equal a union-find reference on random pair graphs") {
    val s = spark
    import s.implicits._
    val graphGen = for {
      nNodes <- Gen.choose(2, 30)
      nEdges <- Gen.choose(0, 40)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(1L, nNodes.toLong)
        b <- Gen.choose(1L, nNodes.toLong)
        if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield (nNodes, edges.distinct)
    samples(graphGen, 5).foreach { case (nNodes, edges) =>
      // reference: textbook union-find with min-root labels
      val parent = scala.collection.mutable.Map((1L to nNodes.toLong).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (1L to nNodes.toLong).map(i => i -> find(i)).toMap
      val ids = (1L to nNodes.toLong).toDF("doc_id")
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = graft.operators.Dedup.dupClustersOf(ids, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Caches.clearAll()
      assert(got == want, s"edges $edges:\ngot  $got\nwant $want")
    }
  }

  test("collapsed rep-graph clusters ≡ closure over expanded pairs (random clone profiles)") {
    // the closure-equivalence claim behind D7/P1/split's collapse-first
    // path, randomized: for ANY grouping into clone groups, ANY rep pair
    // set, and ANY signature subset, components of the rep graph expanded
    // to members must equal components of the expandPairs-style flat list
    val s = spark
    import s.implicits._
    val profileGen = for {
      nGroups <- Gen.choose(1, 8)
      sizes <- Gen.listOfN(nGroups, Gen.choose(1, 5))
      nPairs <- Gen.choose(0, 6)
      pairIdx <- Gen.listOfN(nPairs, for {
        a <- Gen.choose(0, nGroups - 1)
        b <- Gen.choose(0, nGroups - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
      sigMask <- Gen.listOfN(nGroups, Gen.oneOf(true, false))
    } yield (sizes, pairIdx.distinct, sigMask)
    samples(profileGen, 8).foreach { case (sizes, pairIdx, sigMask) =>
      // groups: group g occupies ids [100g, 100g + size); rep = 100g
      val members = sizes.zipWithIndex.flatMap { case (sz, g) =>
        (0 until sz).map(i => (100L * g + i, 100L * g))
      }
      val reps = sizes.indices.map(g => 100L * g)
      // a rep pair can only arise between reps with signatures — enforce
      // the same precondition the real graphs satisfy by construction
      val pairs = pairIdx.filter { case (a, b) => sigMask(a) && sigMask(b) }
        .map { case (a, b) => (100L * a, 100L * b) }
      val sigReps = reps.zip(sigMask).collect { case (r, true) => r }
      val ids = members.map(_._1).toDF("doc_id")
      val groups = members.toDF("doc_id", "rep")
      val repPairs = pairs.toDF("ra", "rb")
      val selfReps = sigReps.toDF("rep")
      // flat reference: expandPairs semantics — cross pairs between any
      // members of paired groups, within pairs for signature groups
      val memberOf = members.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      val cross = pairs.flatMap { case (ra, rb) =>
        for (x <- memberOf(ra); y <- memberOf(rb))
          yield (math.min(x, y), math.max(x, y))
      }
      val within = sigReps.flatMap { r =>
        val m = memberOf(r)
        for (x <- m; y <- m if x < y) yield (x, y)
      }
      val flatPairs = (cross ++ within).distinct
      val want = graft.operators.Dedup.dupClustersOf(ids,
        flatPairs.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = graft.operators.Dedup.clustersFromRepGraph(
        ids, groups, repPairs, selfReps)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Caches.clearAll()
      assert(got == want,
        s"sizes $sizes pairs $pairs sigs $sigReps:\ngot  $got\nwant $want")
    }
  }

  test("salted join equals plain join on random key distributions") {
    val s = spark
    import s.implicits._
    val skewGen = for {
      n <- Gen.choose(10, 200)
      keys <- Gen.listOfN(n, Gen.frequency(8 -> Gen.const(1L), 2 -> Gen.choose(2L, 5L)))
    } yield keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
    samples(skewGen, 3).foreach { rows =>
      val fact = rows.toDF("k", "payload")
      val dim = Seq((1L, "hot"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")).toDF("k", "name")
      val plain = fact.join(dim, "k").orderBy("k", "payload").collect().toSeq
      val salted = graft.operators.SkewJoin.salted(fact, dim, "k", 4)
        .select("k", "payload", "name").orderBy("k", "payload").collect().toSeq
      assert(salted == plain)
    }
  }

  test("shuffle shards: permutation-partition with dense positions for any ids and shard count") {
    val s = spark
    import s.implicits._
    val idsGen = for {
      n <- Gen.choose(1, 120)
      ids <- Gen.listOfN(n, Gen.choose(0L, 100000L))
      shards <- Gen.choose(1, 16)
    } yield (ids.distinct, shards)
    samples(idsGen, 5).foreach { case (ids, nShards) =>
      val out = operators.Sampling.shuffleShardsOf(ids.toDF("doc_id"), nShards).collect()
      // exact-once: the output doc_id multiset IS the input set
      assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq == ids.sorted)
      // every shard in range; pos dense 0..cnt-1 within each shard
      out.groupBy(_.getAs[Int]("shard")).foreach { case (sh, rows) =>
        assert(sh >= 0 && sh < nShards)
        assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq == (0L until rows.length).toSeq)
      }
    }
  }
}
