package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Streaming perplexity scoring — the SERVING leg of T19
  * (t_kn_logprob), the QualityStream pattern applied to the model a
  * crawler actually runs at ingest (CCNet's KenLM gate): train the
  * interpolated Kneser-Ney bigram model offline on the batch tier, ship
  * a CAPPED table, score documents as they arrive — stateless, one map
  * per document against the broadcast-sized model; no state store, no
  * watermark, no shuffle.
  *
  * The model is three bounded artifacts off T19's OWN stats frames
  * (TextOps.knStats — the shipped numbers are computed by the same
  * expressions the distributed scorer evaluates, so with uncapped
  * tables the scalar fold reproduces t_kn_logprob bit-for-bit,
  * spec-pinned):
  *  - `bigramLp`: 6dp log10 P_KN for the `bigramCap` highest-count
  *    bigrams (ties by (w1, w2) — deterministic);
  *  - `lambda`: per-prefix backoff weight D·N1+(w1·)/c(w1·) for the
  *    `vocabCap` highest-c1 prefixes — the held-out mass KN reserved,
  *    which is exactly what an UNSEEN continuation of a seen prefix
  *    should receive;
  *  - `pcont`: the continuation unigram N1+(·w2)/N1+(··) for the
  *    `vocabCap` highest-N1+ words.
  * Serving-only backoff for bigrams the capped table misses:
  * P = λ(w1)·Pcont(w2), with λ = 1 for an unseen prefix (no evidence —
  * full mass to the continuation model) and Pcont = 1/N1+(··) for an
  * unseen word (one pseudo-continuation — the −∞ floor). These paths
  * never fire on the training corpus itself; on new text they keep
  * every score finite and ordered by evidence.
  *
  * n_bigrams counts ALL of the document's bigrams — unlike the NB gate
  * (where OOV words carry no signal and are excluded), every bigram
  * here IS scored, observed or backed off. A sub-2-word document has no
  * bigram evidence: emitted with n_bigrams = 0 and mean_logprob = 0 so
  * the stream stays total; downstream filters on n_bigrams > 0 (T19
  * itself drops such docs — the parity spec compares on T19's rows). */
object PerplexityStream {

  case class Doc(doc_id: Long, text: String)
  case class Scored(doc_id: Long, mean_logprob: Double, n_bigrams: Long)

  /** The serving artifact. Maps are driver/executor-broadcast sized by
    * the caps (the codebook/centroid discipline). */
  case class KnModel(bigramLp: Map[(String, String), Double],
      lambda: Map[String, Double], pcont: Map[String, Double],
      pUnk: Double)

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** Train from a batch corpus: T19's persisted stats frames, the
    * identical P_KN expression (TextOps.knP), capped by training
    * frequency. Collects are bounded by the caps. */
  def trainModel(docs: DataFrame, d: Double = 0.75,
      bigramCap: Int = 200000, vocabCap: Int = 50000): KnModel = {
    val s = docs.sparkSession
    import s.implicits._
    val (cf, pre, suf, tot) = TextOps.knStats(docs)
    val totRow = tot.first()
    val n1all = if (totRow.isNullAt(0)) 0.0 else totRow.getDouble(0)
    // the QualityStream lesson: a degenerate corpus must fail at
    // training time, not emit ±Infinity at serving time
    require(n1all > 0.0,
      "degenerate training corpus: no bigram was observed")
    val bl = cf.join(pre, "w1").join(suf, "w2")
      .crossJoin(broadcast(tot))
      .select($"w1", $"w2", $"cf",
        round(log10(TextOps.knP(d)), 6).as("lp"))
      .orderBy($"cf".desc, $"w1", $"w2")
      .limit(bigramCap)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    val lam = pre
      .select($"w1", $"c1",
        (lit(d) * $"n1w1".cast("double") / $"c1".cast("double")).as("lam"))
      .orderBy($"c1".desc, $"w1")
      .limit(vocabCap)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(2))
      .toMap
    val pc = suf
      .select($"w2", $"n1w2",
        ($"n1w2".cast("double") / lit(n1all)).as("pc"))
      .orderBy($"n1w2".desc, $"w2")
      .limit(vocabCap)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(2))
      .toMap
    KnModel(bl, lam, pc, 1.0 / n1all)
  }

  /** The scalar scoring fold — tokenization and float discipline
    * bit-identical to T19's distributed aggregation on observed
    * bigrams: term = round6(tf · round6(log10 P)), exact decimal sum,
    * one IEEE division by the bigram count. */
  private[graft] def scoreDoc(dc: Doc, m: KnModel): Scored = {
    val ws = dc.text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    if (ws.length < 2) Scored(dc.doc_id, 0.0, 0L)
    else {
      val pairs = ws.zip(ws.tail)
      var acc = java.math.BigDecimal.ZERO
      var n = 0L
      pairs.groupBy(identity).foreach { case ((w1, w2), occ) =>
        val lp = m.bigramLp.getOrElse((w1, w2), {
          val lam = m.lambda.getOrElse(w1, 1.0)
          val pc = m.pcont.getOrElse(w2, m.pUnk)
          round6(math.log10(lam * pc))
        })
        n += occ.length
        acc = acc.add(java.math.BigDecimal.valueOf(round6(occ.length * lp))
          .setScale(6, java.math.RoundingMode.HALF_UP))
      }
      Scored(dc.doc_id, acc.doubleValue / n, n)
    }
  }

  /** Batch twin: same verdicts from one stateless pass. */
  def batchScores(docs: Dataset[Doc], m: KnModel): Dataset[Scored] = {
    import docs.sparkSession.implicits._
    docs.map(scoreDoc(_, m))
  }

  /** Streaming form: one scored row per arriving document. */
  def apply(docs: Dataset[Doc], m: KnModel): Dataset[Scored] = {
    import docs.sparkSession.implicits._
    docs.map(scoreDoc(_, m))
  }

  // --- T19c serving leg (r16, VERDICT r15 #5): the trigram model ---------

  case class Scored3(doc_id: Long, mean_logprob: Double, n_trigrams: Long)

  /** The capped trigram artifact — one more backoff level than KnModel,
    * same bounded-collect discipline:
    *  - `trigramLp`: 6dp log10 P for the cap highest-count trigrams;
    *  - `lam12`: context backoff weight D·N1+(w1w2·)/c(w1w2·);
    *  - `p2mid`: the MIDDLE KN level P_kn(w3|w2) for capped (w2,w3);
    *  - `lamMid`: middle backoff weight D·N1+(w2·*)/N1+(·w2·);
    *  - `pcont`/`pUnk`: T19's continuation-unigram floor, reused.
    * Serving backoff for a trigram the table misses:
    * P = λ12(w1w2)·P_kn(w3|w2), falling to λmid(w2)·Pcont(w3), with
    * λ = 1 for unseen contexts (no evidence — full mass downward) and
    * Pcont = pUnk for an unseen word. As with KnModel, none of the
    * backoff paths fire on the training corpus itself; the spec pins
    * the uncapped fold bit-identical to t_kn3_logprob. */
  case class Kn3Model(trigramLp: Map[(String, String, String), Double],
      lam12: Map[(String, String), Double],
      p2mid: Map[(String, String), Double],
      lamMid: Map[String, Double],
      pcont: Map[String, Double], pUnk: Double)

  /** Train from a batch corpus off T19c's OWN stats frames
    * (TextOps.kn3Stats + the shared bigram floor) — every shipped number
    * is computed by the same expressions the distributed scorer
    * evaluates. Collects are bounded by the caps. */
  def trainTrigram(docs: DataFrame, d: Double = 0.75,
      trigramCap: Int = 200000, ctxCap: Int = 100000,
      vocabCap: Int = 50000): Kn3Model = {
    val s = docs.sparkSession
    import s.implicits._
    val (cf3, ctx, cc, mid) = TextOps.kn3Stats(docs)
    val (_, _, suf, tot) = TextOps.knStats(docs)
    val totRow = tot.first()
    val n1all = if (totRow.isNullAt(0)) 0.0 else totRow.getDouble(0)
    require(n1all > 0.0,
      "degenerate training corpus: no bigram was observed")
    val sufR = suf.select($"w2".as("w3"), $"n1w2".as("n1w3"))
    val tl = cf3.join(ctx, Seq("w1", "w2")).join(cc, Seq("w2", "w3"))
      .join(mid, Seq("w2")).join(sufR, "w3")
      .crossJoin(broadcast(tot))
      .select($"w1", $"w2", $"w3", $"c3",
        round(log10(TextOps.kn3P(d)), 6).as("lp"))
      .orderBy($"c3".desc, $"w1", $"w2", $"w3")
      .limit(trigramCap)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(4))
      .toMap
    val l12 = ctx
      .select($"w1", $"w2", $"c12",
        (lit(d) * $"n12".cast("double") / $"c12".cast("double")).as("lam"))
      .orderBy($"c12".desc, $"w1", $"w2")
      .limit(ctxCap)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    // the middle level P_kn(w3|w2) — the same sub-expression kn3P nests
    val p2 = cc.join(mid, Seq("w2")).join(sufR, "w3")
      .crossJoin(broadcast(tot))
      .select($"w2", $"w3", $"cc23",
        (($"cc23".cast("double") - lit(d)) / $"ccmid".cast("double") +
          lit(d) * $"nsucc2".cast("double") / $"ccmid".cast("double") *
          ($"n1w3".cast("double") / $"n1all")).as("p2"))
      .orderBy($"cc23".desc, $"w2", $"w3")
      .limit(ctxCap)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    val lm = mid
      .select($"w2", $"ccmid",
        (lit(d) * $"nsucc2".cast("double") / $"ccmid".cast("double")).as("lam"))
      .orderBy($"ccmid".desc, $"w2")
      .limit(vocabCap)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(2))
      .toMap
    val pc = suf
      .select($"w2", $"n1w2",
        ($"n1w2".cast("double") / lit(n1all)).as("pc"))
      .orderBy($"n1w2".desc, $"w2")
      .limit(vocabCap)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(2))
      .toMap
    Kn3Model(tl, l12, p2, lm, pc, 1.0 / n1all)
  }

  /** The trigram scalar fold — bit-identical float discipline to
    * T19c's distributed aggregation on observed trigrams. */
  private[graft] def scoreDoc3(dc: Doc, m: Kn3Model): Scored3 = {
    val ws = dc.text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    if (ws.length < 3) Scored3(dc.doc_id, 0.0, 0L)
    else {
      val tris = (0 until ws.length - 2).map(i => (ws(i), ws(i + 1), ws(i + 2)))
      var acc = java.math.BigDecimal.ZERO
      var n = 0L
      tris.groupBy(identity).foreach { case ((w1, w2, w3), occ) =>
        val lp = m.trigramLp.getOrElse((w1, w2, w3), {
          val lam = m.lam12.getOrElse((w1, w2), 1.0)
          val p2 = m.p2mid.getOrElse((w2, w3), {
            m.lamMid.getOrElse(w2, 1.0) * m.pcont.getOrElse(w3, m.pUnk)
          })
          round6(math.log10(lam * p2))
        })
        n += occ.length
        acc = acc.add(java.math.BigDecimal.valueOf(round6(occ.length * lp))
          .setScale(6, java.math.RoundingMode.HALF_UP))
      }
      Scored3(dc.doc_id, acc.doubleValue / n, n)
    }
  }

  /** Batch twin of the trigram stream. */
  def batchTrigramScores(docs: Dataset[Doc], m: Kn3Model): Dataset[Scored3] = {
    import docs.sparkSession.implicits._
    docs.map(scoreDoc3(_, m))
  }

  /** Streaming trigram form: one scored row per arriving document. */
  def trigram(docs: Dataset[Doc], m: Kn3Model): Dataset[Scored3] = {
    import docs.sparkSession.implicits._
    docs.map(scoreDoc3(_, m))
  }
}
