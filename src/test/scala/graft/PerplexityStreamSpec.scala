package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.PerplexityStream
import graft.streaming.PerplexityStream.{Doc, Scored}
import graft.operators.TextOps

/** The T19 serving leg: with uncapped tables the scalar fold must
  * reproduce the DISTRIBUTED Kneser-Ney scores bit-for-bit; stream ≡
  * batch; capped/OOV documents take the documented backoff paths. */
class PerplexityStreamSpec extends SparkSpecBase {

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  test("uncapped model: stream fold ≡ the distributed T19 scores, bit-for-bit") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, sfDir).select($"doc_id", $"text")
    val model = PerplexityStream.trainModel(docs,
      bigramCap = Int.MaxValue, vocabCap = Int.MaxValue)
    val batch = PerplexityStream.batchScores(docs.as[Doc], model)
      .collect().filter(_.n_bigrams > 0).map(x => x.doc_id -> x).toMap
    val dist = TextOps.knLogprob(s, sfDir).collect()
      .map(r => r.getLong(0) -> Scored(r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toMap
    assert(batch.keySet == dist.keySet)
    batch.foreach { case (id, sc) =>
      assert(sc == dist(id), s"doc $id: $sc vs ${dist(id)}")
    }
  }

  test("stream ≡ batch across micro-batches; sub-2-word docs emit n_bigrams = 0") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val train = Seq((1L, "the cat sat"), (2L, "the dog sat"))
      .toDF("doc_id", "text")
    val model = PerplexityStream.trainModel(train)
    val b1 = Seq(Doc(10, "the cat sat"), Doc(11, "cat dog"))
    val b2 = Seq(Doc(12, "solo"), Doc(13, "zebra cat"))
    val mem = MemoryStream[Doc]
    val q = PerplexityStream(mem.toDS(), model)
      .writeStream.format("memory").queryName("ppl_out")
      .outputMode("append").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = s.table("ppl_out").as[Scored].collect()
      .sortBy(_.doc_id).toSeq
    val batch = PerplexityStream.batchScores((b1 ++ b2).toDS(), model)
      .collect().sortBy(_.doc_id).toSeq
    assert(streamed == batch)
    val solo = streamed.find(_.doc_id == 12L).get
    assert(solo.n_bigrams == 0L && solo.mean_logprob == 0.0)
  }

  test("backoff paths: hand-computed KN fixture, observed / seen-prefix / unseen-word / unseen-prefix") {
    val s = spark
    import s.implicits._
    // corpus bigrams (all cf=1): (the,cat) (cat,sat) (the,dog) (dog,sat)
    // pre: the(c1=2,n1=2) cat(1,1) dog(1,1); suf: cat=1 sat=2 dog=1; N1+(··)=4
    val train = Seq((1L, "the cat sat"), (2L, "the dog sat"))
      .toDF("doc_id", "text")
    val m = PerplexityStream.trainModel(train)
    // observed: P(cat|the) = (1−.75)/2 + .75·(2/2)·(1/4) = 0.3125
    val obs = PerplexityStream.scoreDoc(Doc(1, "the cat"), m)
    assert(obs == Scored(1, round6(1 * round6(math.log10(0.3125))) / 1, 1))
    // seen prefix, unseen continuation pair: λ(cat)·Pcont(dog) = .75·(1/4)
    val bo = PerplexityStream.scoreDoc(Doc(2, "cat dog"), m)
    assert(bo.mean_logprob == round6(1 * round6(math.log10(0.75 * 0.25))) / 1)
    // unseen word: Pcont floor 1/N1+(··): λ(cat)·(1/4)
    val uw = PerplexityStream.scoreDoc(Doc(3, "cat zebra"), m)
    assert(uw.mean_logprob == round6(1 * round6(math.log10(0.75 * 0.25))) / 1)
    // unseen prefix: λ = 1, Pcont(cat) = 1/4
    val up = PerplexityStream.scoreDoc(Doc(4, "zebra cat"), m)
    assert(up.mean_logprob == round6(1 * round6(math.log10(0.25))) / 1)
    // all scores finite and negative (probabilities < 1)
    Seq(obs, bo, uw, up).foreach(x =>
      assert(!x.mean_logprob.isInfinite && x.mean_logprob < 0.0))
  }

  test("bigram cap evicts the low-count tail; evicted bigrams back off") {
    val s = spark
    import s.implicits._
    // make (the,cat) the clear winner: cf 2 vs 1 for the rest
    val train = Seq((1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat"))
      .toDF("doc_id", "text")
    val m = PerplexityStream.trainModel(train, bigramCap = 1)
    assert(m.bigramLp.keySet == Set(("the", "cat")))
    // an evicted-but-observed bigram takes the λ·Pcont path
    val sc = PerplexityStream.scoreDoc(Doc(9, "dog sat"), m)
    val lam = m.lambda("dog")
    val pc = m.pcont("sat")
    assert(sc.mean_logprob == round6(1 * round6(math.log10(lam * pc))) / 1)
  }

  test("degenerate corpus (no bigrams) fails at training time") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "solo"), (2L, "word")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      PerplexityStream.trainModel(train)
    }
  }

  // --- T19c trigram serving leg (r16) --------------------------------------

  import graft.streaming.PerplexityStream.Scored3

  test("trigram: uncapped model fold ≡ the distributed T19c scores, bit-for-bit") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, sfDir).select($"doc_id", $"text")
    val model = PerplexityStream.trainTrigram(docs,
      trigramCap = Int.MaxValue, ctxCap = Int.MaxValue,
      vocabCap = Int.MaxValue)
    val batch = PerplexityStream.batchTrigramScores(docs.as[Doc], model)
      .collect().filter(_.n_trigrams > 0).map(x => x.doc_id -> x).toMap
    val dist = TextOps.kn3Logprob(s, sfDir).collect()
      .map(r => r.getLong(0) -> Scored3(r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toMap
    assert(batch.keySet == dist.keySet)
    batch.foreach { case (id, sc) =>
      assert(sc == dist(id), s"doc $id: $sc vs ${dist(id)}")
    }
  }

  test("trigram backoff paths: hand-computed fixture, all four levels") {
    val s = spark
    import s.implicits._
    // trigrams (the,cat,sat) and (the,dog,sat), each c3=1:
    //   ctx (the,cat)/(the,dog): c12=1, n12=1
    //   cc (cat,sat)/(dog,sat): cc23=1; mid cat/dog: ccmid=1, nsucc2=1
    //   bigram floor: suf cat=1 sat=2 dog=1, N1+(··)=4
    val train = Seq((1L, "the cat sat"), (2L, "the dog sat"))
      .toDF("doc_id", "text")
    val m = PerplexityStream.trainTrigram(train)
    // observed trigram:
    //   P = (1−.75)/1 + .75·(1/1)·[(1−.75)/1 + .75·(1/1)·(2/4)] = 0.71875
    val obs = PerplexityStream.scoreDoc3(Doc(1, "the cat sat"), m)
    assert(obs == Scored3(1, round6(1 * round6(math.log10(0.71875))) / 1, 1))
    // unseen trigram, unseen (w1,w2) context, SEEN middle pair:
    //   λ12 = 1, P_kn(sat|dog) = .25 + .75·(2/4) = 0.625
    val p2 = PerplexityStream.scoreDoc3(Doc(2, "cat dog sat"), m)
    assert(p2.mean_logprob == round6(1 * round6(math.log10(0.625))) / 1)
    // unseen middle pair, SEEN middle word: λmid(cat)=.75, pUnk=1/4
    val lm = PerplexityStream.scoreDoc3(Doc(3, "sat cat zebra"), m)
    assert(lm.mean_logprob == round6(1 * round6(math.log10(0.75 * 0.25))) / 1)
    // everything unseen: λ12=1, λmid=1, pUnk=1/4
    val uu = PerplexityStream.scoreDoc3(Doc(4, "zebra qat xylo"), m)
    assert(uu.mean_logprob == round6(1 * round6(math.log10(0.25))) / 1)
    Seq(obs, p2, lm, uu).foreach(x =>
      assert(!x.mean_logprob.isInfinite && x.mean_logprob < 0.0))
  }

  test("trigram stream ≡ batch; sub-3-word docs emit n_trigrams = 0") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val train = Seq((1L, "the cat sat on the mat"), (2L, "the dog sat"))
      .toDF("doc_id", "text")
    val m = PerplexityStream.trainTrigram(train)
    val b = Seq(Doc(10, "the cat sat"), Doc(11, "cat dog"), Doc(12, "solo"))
    val mem = MemoryStream[Doc]
    val q = PerplexityStream.trigram(mem.toDS(), m)
      .writeStream.format("memory").queryName("ppl3_out")
      .outputMode("append").start()
    mem.addData(b: _*); q.processAllAvailable()
    q.stop()
    val streamed = s.table("ppl3_out").as[Scored3].collect()
      .sortBy(_.doc_id).toSeq
    val batch = PerplexityStream.batchTrigramScores(b.toDS(), m)
      .collect().sortBy(_.doc_id).toSeq
    assert(streamed == batch)
    streamed.filter(_.doc_id >= 11L).foreach { x =>
      assert(x.n_trigrams == 0L && x.mean_logprob == 0.0)
    }
  }

  test("trigram degenerate corpus fails at training time") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "solo"), (2L, "word")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      PerplexityStream.trainTrigram(train)
    }
  }
}
