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
}
