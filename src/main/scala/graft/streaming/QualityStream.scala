package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Streaming quality scoring — the SERVING leg of T20
  * (t_quality_classifier): train the Naive-Bayes filter offline on the
  * curated-vs-rest corpus, then score documents AS THEY ARRIVE, before
  * they cost storage or a batch pass (the IngestClean argument applied
  * to the quality gate a crawler actually wants: "is this page worth
  * keeping" at ingest time, from a model the batch tier trained
  * yesterday).
  *
  * The model is the bounded artifact real serving ships: the logodds
  * table CAPPED to the `vocabCap` highest-training-frequency words
  * (fastText caps its vocab the same way; the tail words a cap drops
  * carry the least evidence by construction — they were seen least).
  * Capped out-of-vocabulary words contribute 0, exactly like words
  * unseen at training time contribute only their smoothing mass.
  * With vocabCap ≥ |V| the scalar fold reproduces T20's distributed
  * scores bit-for-bit (spec-pinned): same tokenization
  * (`split(" ", -1)` + Locale.ROOT lowercase — the NearDupStream r6
  * parity lesson), same 6dp-rounded terms through an exact decimal sum,
  * same final prior + round.
  *
  * Scale: scoring is STATELESS — one `map` per document against the
  * broadcast-sized model (no state store, no watermark, no shuffle);
  * the stream scales with input rate alone. Training stays in the
  * batch tier (T20's two shuffles); only the capped table crosses. */
object QualityStream {

  case class Doc(doc_id: Long, text: String)
  case class Scored(doc_id: Long, n_tokens: Long, score: Double,
      pred_quality: Boolean)

  /** The serving artifact: word → 6dp logodds, plus the class prior. */
  case class NbModel(logodds: Map[String, Double], prior: Double)

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** Train from a batch corpus: T20's persisted word-stats frame, the
    * identical logodds expression, capped to the vocabCap most frequent
    * training words (ties broken by word — deterministic). The collect
    * is bounded by vocabCap — the codebook/centroid discipline. */
  def trainModel(docs: DataFrame, posSources: Seq[String],
      vocabCap: Int = 50000): NbModel = {
    val s = docs.sparkSession
    import s.implicits._
    val (_, wf, dc) = TextOps.nbStats(docs, posSources)
    // fail loudly at TRAINING time on degenerate classes (r15, ADVICE
    // r14 #3): a posSources allowlist matching zero (or all) documents
    // makes the prior log10(0/n) or log10(n/0) = ±Infinity, which would
    // silently poison every streamed score downstream
    val d0 = dc.first()
    // an EMPTY corpus aggregates to one all-NULL row — read null-safely
    // so the require below fires with its message instead of an opaque
    // NPE from Row.getLong (the PerplexityStream.trainModel pattern)
    val npos = if (d0.isNullAt(0)) 0L else d0.getLong(0)
    val nneg = if (d0.isNullAt(1)) 0L else d0.getLong(1)
    require(npos > 0 && nneg > 0,
      s"degenerate training classes: npos=$npos nneg=$nneg — " +
        "posSources must match at least one and not all documents")
    val st = wf.agg(sum($"cpos").as("tpos"), sum($"cneg").as("tneg"),
        count(lit(1)).as("v"))
      .crossJoin(dc)
      .select($"tpos", $"tneg", $"v",
        log10($"npos".cast("double") / $"nneg".cast("double")).as("prior"))
    val rows = wf.crossJoin(broadcast(st))
      .select($"wrd", $"prior",
        round(
          log10(($"cpos" + 1L).cast("double") / ($"tpos" + $"v").cast("double")) -
            log10(($"cneg" + 1L).cast("double") / ($"tneg" + $"v").cast("double")),
          6).as("logodds"),
        ($"cpos" + $"cneg").as("freq"))
      .orderBy($"freq".desc, $"wrd")
      .limit(vocabCap)
      .collect()
    NbModel(rows.map(r => r.getString(0) -> r.getDouble(2)).toMap,
      if (rows.isEmpty) 0.0 else rows.head.getDouble(1))
  }

  /** The scalar scoring fold — tokenization and float discipline
    * bit-identical to T20's distributed aggregation. n_tokens counts
    * MODEL-MATCHED token mass — SUM(tf) over words the logodds table
    * knows — mirroring T20's vocab-joined SUM(tf) exactly (r15, ADVICE
    * r14 #4: raw split length only coincides with that on the training
    * corpus itself; on genuinely new documents OOV words must not count,
    * or the parity claim silently narrows to `score` alone). */
  private[graft] def scoreDoc(d: Doc, m: NbModel): Scored = {
    val ws = d.text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    var acc = java.math.BigDecimal.ZERO
    var nTok = 0L
    ws.groupBy(identity).foreach { case (w, occ) =>
      m.logodds.get(w).foreach { lo =>
        nTok += occ.length
        acc = acc.add(java.math.BigDecimal.valueOf(round6(occ.length * lo))
          .setScale(6, java.math.RoundingMode.HALF_UP))
      }
    }
    val score = round6(m.prior + acc.doubleValue)
    Scored(d.doc_id, nTok, score, score > 0)
  }

  /** Batch twin: same verdicts from one stateless pass. */
  def batchScores(docs: Dataset[Doc], m: NbModel): Dataset[Scored] = {
    import docs.sparkSession.implicits._
    docs.map(scoreDoc(_, m))
  }

  /** Streaming form: one scored row per arriving document. */
  def apply(docs: Dataset[Doc], m: NbModel): Dataset[Scored] = {
    import docs.sparkSession.implicits._
    docs.map(scoreDoc(_, m))
  }
}
