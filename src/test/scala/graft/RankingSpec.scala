package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{GraphOps, Ranking, TextOps}

/** Ranking.rowNumberWithin (the scale-safe grouped rank) and its two r8
  * consumers: T14 perplexity buckets and G10 association rules. */
class RankingSpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1900L + i)))

  test("rowNumberWithin equals the ROW_NUMBER window row-for-row") {
    val s = spark
    import s.implicits._
    // few groups x many rows over 4 partitions -> groups MUST span
    // partition boundaries, exercising the offset-carry reconstruction
    val df = (1 to 400).map(i => (s"g${i % 3}", i * 37 % 101, i.toLong))
      .toDF("grp", "score", "id")
    val got = Ranking.rowNumberWithin(df, "grp",
        Seq($"score".desc, $"id"), "rk", "spec-rank-basic")
      .select($"grp", $"id", $"rk")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = df.withColumn("rk", row_number().over(
        Window.partitionBy($"grp").orderBy($"score".desc, $"id")).cast("long"))
      .select($"grp", $"id", $"rk")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
    Caches.clearAll()
  }

  test("constant group = a full global ROW_NUMBER; empty frame = empty") {
    val s = spark
    import s.implicits._
    val df = (1 to 97).map(i => ("all", i.toLong)).toDF("grp", "id")
    val got = Ranking.rowNumberWithin(df, "grp", Seq($"id"), "rk", "spec-rank-const")
      .orderBy($"id").select($"rk").as[Long].collect()
    assert(got.toSeq == (1L to 97L))
    val empty = Ranking.rowNumberWithin(df.filter($"id" < 0), "grp",
      Seq($"id"), "rk", "spec-rank-empty")
    assert(empty.count() == 0)
    Caches.clearAll()
  }

  private val rankGen: Gen[(List[(String, Int, Long)], Int)] = for {
    n <- Gen.choose(0, 120)
    nGroups <- Gen.choose(1, 5)
    nPart <- Gen.choose(1, 9)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0, nGroups - 1)
      sc <- Gen.choose(-50, 50)
    } yield (s"g$g", sc))
  } yield (rows.zipWithIndex.map { case ((g, sc), i) => (g, sc, i.toLong) }, nPart)

  test("rowNumberWithin matches the window under arbitrary data and partition counts") {
    val s = spark
    import s.implicits._
    samples(rankGen, 8).zipWithIndex.foreach { case ((rows, nPart), i) =>
      val df = rows.toDF("grp", "score", "id")
      val got = Ranking.rowNumberWithin(df, "grp",
          Seq($"score", $"id"), "rk", s"spec-rank-prop-$i", nPartitions = nPart)
        .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3)).toSet
      val want = df.withColumn("rk", row_number().over(
          Window.partitionBy($"grp").orderBy($"score", $"id")).cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3)).toSet
      assert(got == want, s"sample $i (n=${rows.length}, nPart=$nPart)")
    }
    Caches.clearAll()
  }

  test("ppl buckets: terciles within one doc per language, ordered by score") {
    val s = spark
    import s.implicits._
    val b = TextOps.pplBuckets(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir).count()
    assert(b.count() == docs) // every document lands in exactly one bucket
    val sizes = b.groupBy($"lang", $"ppl_bucket").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    sizes.keys.map(_._1).toSeq.distinct.foreach { lang =>
      val h = sizes.getOrElse((lang, "head"), 0L)
      val m = sizes.getOrElse((lang, "middle"), 0L)
      val t = sizes.getOrElse((lang, "tail"), 0L)
      // integer tercile cuts: bucket sizes differ by at most 1
      assert(math.max(h, math.max(m, t)) - math.min(h, math.min(m, t)) <= 1,
        s"$lang: head=$h middle=$m tail=$t")
    }
    // every head score >= every tail score within a language
    val agg = b.groupBy($"lang", $"ppl_bucket")
      .agg(min($"mean_logprob").as("lo"), max($"mean_logprob").as("hi"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    agg.keys.map(_._1).toSeq.distinct.foreach { lang =>
      for { (_, hHi) <- agg.get((lang, "head")); (mLo, mHi) <- agg.get((lang, "middle"))
            (tLo, _) <- agg.get((lang, "tail")) } {
        assert(agg((lang, "head"))._1 >= mHi - 1e-12 && mLo >= agg((lang, "tail"))._2 - 1e-12)
      }
    }
    b.unpersist()
    Caches.clearAll()
  }

  test("also-bought rules: probability bounds, top-k shape, counts consistent") {
    val s = spark
    import s.implicits._
    val r = GraphOps.alsoBought(spark, sfDir).cache()
    val bad = r.filter($"support" <= 0 || $"support" > 1 ||
      $"confidence" <= 0 || $"confidence" > 1 || $"lift" <= 0).count()
    assert(bad == 0)
    // support <= confidence always (n(src) <= N)
    assert(r.filter($"support" > $"confidence" + 1e-9).count() == 0)
    // per-antecedent: ranks contiguous from 1, <= k, lift nonincreasing
    r.groupBy($"src").agg(collect_list(struct($"rk", $"lift")).as("cs"))
      .collect().foreach { row =>
        val cs = row.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
        assert(cs.map(_._1) == (1L to cs.length) && cs.length <= 3)
        assert(cs.sliding(2).forall(w => w.length < 2 || w(0)._2 >= w(1)._2))
      }
    // the rule weight is the co-purchase edge weight (mirrored)
    val e = GraphOps.copurchaseEdges(spark, sfDir)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    r.select($"src", $"dst", $"weight").collect().foreach { row =>
      val (a, b, w) = (row.getLong(0), row.getLong(1), row.getLong(2))
      assert(e.getOrElse((math.min(a, b), math.max(a, b)), -1L) == w)
    }
    r.unpersist()
    Caches.clearAll()
  }
}
