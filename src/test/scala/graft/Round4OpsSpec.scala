package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}
import graft.streaming.EventOps

/** Planted-fixture semantics for the round-4 operators: benchmark
  * decontamination, repetition signals, PII redaction, SCD2 history. */
class Round4OpsSpec extends SparkSpecBase {

  test("all orders: one row per lineitem, newest order first, dates nonincreasing") {
    val li = Tables.lineitem(spark, sfDir)
    val out = operators.Relational.allOrders(spark, sfDir)
    assert(out.count() === li.count(), "admin listing must cover every item row")
    val dates = out.select("o_orderdate").collect().map(_.get(0).toString)
    assert(dates.zip(dates.tail).forall { case (a, b) => a >= b }, "not newest-first")
    val maxDate = Tables.orders(spark, sfDir)
      .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .agg(max("o_orderdate")).collect()(0).get(0).toString
    assert(dates.head === maxDate)
  }

  test("decontaminate: flags exactly the train docs sharing a 5-gram with the bench set") {
    import spark.implicits._
    // doc_id % 10 == 0 → benchmark. doc 11 copies bench doc 10's opening
    // 5-gram; doc 12 shares nothing.
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (20L, "one two three four five six seven eight"),
      (11L, "alpha beta gamma delta epsilon completely different tail here"),
      (12L, "red green blue cyan magenta yellow black white"),
      (13L, "one two three four five nine ten eleven")
    ).toDF("doc_id", "text")
    val hits = Dedup.decontaminateOn(docs, 5, s"decon-spec:${System.nanoTime()}")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caches.clearAll()
    assert(hits.keySet == Set(11L, 13L), s"got $hits")
    assert(hits(11L) == 1L) // one benchmark doc matched
    assert(hits(13L) == 1L) // 'one two three four five' from doc 20
  }

  test("repetition: a degenerate doc scores higher than a diverse one on both signals") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "every word here is completely unique throughout")
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionOn(docs).collect()
      .map(x => x.getLong(0) -> (x.getDouble(2), x.getDouble(3))).toMap
    assert(r(1L)._1 > 0.8 && r(2L)._1 == 0.0) // dup_word_frac
    assert(r(1L)._2 == 1.0)                   // one bigram carries all mass
    assert(r(2L)._2 < 0.2)
  }

  test("pii redact: no email/phone pattern survives redaction; clean text unchanged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at jane.doe+spam@corp.example.org or 415-555-0137 thanks"),
      (2L, "no pii in this row at all")
    ).toDF("doc_id", "text")
    val red = TextOps.redactText(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!red(1L).matches(s".*${TextOps.emailRe}.*"))
    assert(!red(1L).matches(s".*${TextOps.phoneRe}.*"))
    assert(red(1L).contains("<EMAIL>") && red(1L).contains("<PHONE>"))
    assert(red(2L) == "no pii in this row at all")
  }

  test("pii redact query: counts follow the deterministic injection pattern") {
    val rows = TextOps.piiRedact(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 3 == 0) 1L else 0L), s"doc $id emails")
      assert(r.getLong(2) == (if (id % 4 == 0) 1L else 0L), s"doc $id phones")
    }
  }

  test("maxsim: k rows, descending, and every score within [-nQuery, nQuery]") {
    val rows = operators.VectorOps.maxSim(spark, sfDir, nQuery = 5, k = 5).collect()
    assert(rows.length == 5)
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(s => s >= -5.0 && s <= 5.0)) // Σ of 5 cosines
  }

  test("mmr rerank: diversification skips the near-duplicate of the first pick") {
    import spark.implicits._
    import graft.functions.GraftFunctions.{vecNorm, vecToDouble}
    // query 0 at e1; vec 1 ≈ vec 2 (near-identical, both close to e1);
    // vec 3 orthogonal. Plain top-2 = {1, 2}; at λ=0.5 the duplicate's
    // penalty (md ≈ 1 → score ≈ −0.004) loses to the orthogonal vector
    // (score 0), so MMR must pick {1, 3}.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.9f, 0.11f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
      .withColumn("v", vecToDouble(col("embedding")))
      .withColumn("nrm", vecNorm(col("v")))
    val picks = operators.VectorOps
      .mmrRerankOn(vecs, queryId = 0L, nCand = 10, k = 2, lam = 0.5, lamBar = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(picks.toSeq == Seq(1L -> 1L, 2L -> 3L), s"got ${picks.toSeq}")
  }

  test("Graft facade: registered views answer plain SQL; query() resolves keys") {
    Graft.registerViews(spark, sfDir)
    val viaSql = spark.sql(
      "SELECT COUNT(*) FROM documents WHERE length(text) > 0").collect()(0).getLong(0)
    assert(viaSql == Tables.documents(spark, sfDir).count())
    // ns-timestamp events readable from SQL (the Tables fix applies)
    assert(spark.sql("SELECT MIN(ts) FROM events").collect()(0).getTimestamp(0) != null)
    assert(Graft.query(spark, sfDir, "q1_pricing_summary").count() > 0)
    intercept[IllegalArgumentException](Graft.query(spark, sfDir, "nope"))
    Caches.clearAll()
  }

  test("pq ann: recall far above the rerank-budget baseline; planted clone found first") {
    import spark.implicits._
    import graft.functions.GraftFunctions.{vecNorm, vecScale, vecToDouble}
    // corpus recall: top-10 via PQ+ADC (rerank 50 of ~N) vs exact top-10.
    // A random 50-candidate draw would land ~2.5% — 30% is a real cut.
    val exact = operators.VectorOps.cosineTopK(spark, sfDir, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val pq = operators.VectorOps.pqAnn(spark, sfDir, 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert((exact & pq).size >= 3, s"recall ${(exact & pq).size}/10")
    Caches.clearAll()
    // planted: vec 1 is an exact clone of query 0 → identical codes →
    // equal ADC score → survives rerank and tops the exact ranking
    val base = Array(0.3f, -0.9f, 0.4f, 0.1f, 0.7f, -0.2f, 0.05f, 0.6f)
    def jitter(k: Int) = base.zipWithIndex.map { case (x, i) =>
      x + 0.31f * ((i * 7 + k * 13) % 11 - 5) }
    val planted = ((0L, base) +: (1L, base.clone) +:
        (2L to 40L).map(k => (k, jitter(k.toInt))))
      .toDF("vec_id", "embedding")
      .withColumn("v", vecToDouble(col("embedding")))
      .withColumn("nrm", vecNorm(col("v")))
      .withColumn("u", vecScale(col("v"), col("nrm")))
    val top = operators.VecPQ.pqAnn(planted, queryId = 0L, k = 3,
      m = 4, ksub = 8, iters = 2, rerank = 10).collect()
    assert(top.head.getLong(0) == 1L, s"clone not first: ${top.toSeq}")
    assert(top.head.getDouble(2) == 1.0) // exact cosine with itself
  }

  test("dup clusters: transitive closure of pairs, singletons self-labeled") {
    import spark.implicits._
    // chain 1-2, 2-3 must collapse into ONE cluster (pairwise dedup would
    // miss 1~3); 7-8 a second cluster; 9 untouched
    val ids = (1L to 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val got = operators.Dedup.dupClustersOf(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
      6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 9L), s"got $got")
  }

  test("bm25: positive descending scores, term counts bounded by the query") {
    val rows = TextOps.bm25(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(r => r.getLong(2) >= 1L && r.getLong(2) <= 3L))
  }

  test("scd2: versions contiguous, intervals chain, exactly one open row per user") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val events = Seq(
      (1L, 7L, t(0), "view"), (2L, 7L, t(1), "view"), (3L, 7L, t(2), "click"),
      (4L, 7L, t(3), "view"), (5L, 9L, t(0), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val hist = EventOps.scd2(events).orderBy("user_id", "version").collect()
    // user 7: view@0 → click@2 → view@3 (the consecutive-view run collapses)
    val u7 = hist.filter(_.getLong(0) == 7L)
    assert(u7.map(_.getString(2)).toSeq == Seq("view", "click", "view"))
    assert(u7.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    // intervals chain: eff_to(v) == eff_from(v+1); last row open
    u7.sliding(2).foreach { case Array(a, b) =>
      assert(a.getTimestamp(4) == b.getTimestamp(3))
    }
    assert(u7.last.isNullAt(4))
    val u9 = hist.filter(_.getLong(0) == 9L)
    assert(u9.length == 1 && u9.head.isNullAt(4))
  }

  test("scd2 on the corpus: per-user open-row uniqueness and chain invariant") {
    val hist = EventOps.scd2Query(spark, sfDir).cache()
    val users = hist.select("user_id").distinct().count()
    assert(hist.filter(col("eff_to").isNull).count() == users)
    // chaining: joining v with v+1 must reproduce every non-final row
    val nonFinal = hist.filter(col("eff_to").isNotNull).count()
    val chained = hist.as("a").join(hist.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.version") + 1 === col("b.version") &&
        col("a.eff_to") === col("b.eff_from")).count()
    assert(chained == nonFinal)
    hist.unpersist()
  }
}
