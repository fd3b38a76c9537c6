package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingest-time corpus cleaning — the streaming twin of P1's first two
  * stages (exact dedup + quality floor), fused into one verdict per
  * arriving document: `kept`, `exact_dup`, or `low_quality`. A crawler
  * consults the verdict BEFORE writing the corpus store, so at 100 TB a
  * clone or junk page never costs its storage, its shuffle, or any
  * downstream pass (the batch pipeline cleans after the fact).
  *
  * Semantics mirror `CorpusPipeline.corpusClean` UNDER IN-ORDER ARRIVAL
  * (the IngestDedup convention, ADVICE r7): the streaming keeper is
  * first-arrival while the batch keeper is the group's global min
  * doc_id, so stream ≡ batch holds exactly when doc_ids arrive in
  * nondecreasing order across micro-batches — a crawler assigning
  * monotone ids satisfies this; replaying shuffled history does not
  * (a later batch carrying a smaller-id clone swaps the kept/dup
  * roles). Within that precondition the dedup decision is
  * quality-INDEPENDENT (a low-quality keeper still claims its text
  * group, so a later high-quality clone stays a dup — in batch the
  * whole group dies with its keeper, and the stream must agree), and
  * `exact_dup` takes precedence over `low_quality` in the verdict
  * label. Dedup state is IngestDedup's shape: one row per distinct
  * content hash, sharded by hash key; the quality gate is stateless.
  *
  * Tokenization parity (the NearDupStream r6 lesson): the scalar gate
  * splits with `split(" ", -1)` and lowercases with Locale.ROOT so its
  * word array is bit-identical to Spark SQL's `split(lower(text), ' ')`
  * on trailing-space and locale-edge inputs.
  */
object IngestClean {

  case class Doc(doc_id: Long, text: String)
  case class Seen(keep_id: Long, n_copies: Long)
  case class Verdict(doc_id: Long, keep_id: Long, reason: String)

  private val stops = Set("the", "a", "of", "and")

  /** Scalar twin of the P1 quality floor: stopword density ≥ thr/10. */
  private[graft] def qualityOk(text: String, minQuality: Double): Boolean = {
    val ws = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    ws.count(stops) .toDouble / ws.length >= minQuality / 10.0
  }

  /** Batch twin: the same verdicts from one window pass — keep_id is the
    * text group's smallest id regardless of quality (corpusClean's
    * keepExact is computed over ALL docs), reason classifies dup first. */
  def batchVerdicts(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5($"text"))
    docs
      .withColumn("keep_id", min($"doc_id").over(w))
      .withColumn("q",
        size(filter(split(lower($"text"), " "),
          t => t.isInCollection(stops))).cast("double") /
          size(split(lower($"text"), " ")))
      .select($"doc_id", $"keep_id",
        when($"doc_id" =!= $"keep_id", "exact_dup")
          .when($"q" < minQuality / 10.0, "low_quality")
          .otherwise("kept").as("reason"))
      .orderBy($"doc_id")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def update(minQuality: Double)(h: String, docs: Iterator[Doc],
      state: GroupState[Seen]): Iterator[Verdict] = {
    val sorted = docs.toSeq.sortBy(_.doc_id) // smallest id wins in-batch
    var st = state.getOption
    val out = sorted.map { d =>
      st match {
        case None =>
          st = Some(Seen(d.doc_id, 1L))
          Verdict(d.doc_id, d.doc_id,
            if (qualityOk(d.text, minQuality)) "kept" else "low_quality")
        case Some(s0) =>
          st = Some(s0.copy(n_copies = s0.n_copies + 1L))
          Verdict(d.doc_id, s0.keep_id, "exact_dup")
      }
    }
    st.foreach(state.update) // materialized above — safe to update now
    out.iterator
  }

  /** Streaming form: one verdict per arriving document. */
  def apply(docs: Dataset[Doc], minQuality: Double = 0.5): Dataset[Verdict] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => md5hex(d.text))
      .flatMapGroupsWithState[Seen, Verdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update(minQuality))
  }
}
