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
}
