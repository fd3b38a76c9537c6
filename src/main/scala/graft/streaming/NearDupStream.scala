package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Dedup

/** Streaming near-dup candidate detection — D2's banded MinHash at
  * ingest time (the probabilistic leg next to IngestDedup's exact-hash
  * leg): every arriving document lands in its 4 band buckets, and a
  * bucket with prior occupants emits (old, new) candidate pairs at
  * arrival — a crawler can route suspects to quarantine/re-rank before
  * they join the training corpus, instead of re-pairing the corpus
  * nightly.
  *
  * The signature arithmetic is BIT-IDENTICAL to the distributed D2
  * (md5-derived word-3-gram hashes, 16 permutations (2j+1)·h + 17j+3
  * mod 1e9+7, 4 bands of 4), so the stream's candidate set provably
  * equals the batch band join — the spec pins stream ≡ batch including
  * pairs that straddle a batch boundary.
  *
  * State = one row per occupied (band, sig) bucket holding its member
  * ids; like IngestDedup the state is history-long by nature (4 rows
  * per distinct document) — production bounds it with state-store TTL
  * or periodic compaction into the batch index.
  */
object NearDupStream {

  case class Doc(doc_id: Long, text: String)
  case class BandRow(band: Long, sig: String, doc_id: Long)
  case class Bucket(ids: List[Long])
  case class Cand(doc_a: Long, doc_b: Long, band: Long)

  private val M = 1000000007L

  /** Scalar twin of TextOps.h64 ∘ (% M): first 15 md5 hex chars as a
    * 60-bit value, reduced mod M — matches the codegen'd column exactly. */
  private def h64m(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % M
  }

  /** The 4 band signatures of one document — scalar replay of D2's
    * 16-permutation minhash (documents under 3 words carry no signature,
    * exactly as the distributed form's size(w) >= 3 filter). */
  private[graft] def bandSigsOf(d: Doc): Seq[BandRow] = {
    // Locale.ROOT + limit -1: Spark's lower() is locale-independent and
    // split(text,' ') keeps trailing empty strings — JVM-default-locale
    // toLowerCase (e.g. Turkish dotless-i) or Java's trailing-empty
    // stripping split would shift the word array and break the
    // bit-identical stream ≡ batch signature contract (ADVICE r6)
    val words = d.text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    if (words.length < 3) return Seq.empty
    val hvs = words.sliding(3).map(w => h64m(w.mkString(" "))).toSeq
    val mins = (0 until 16).map { j =>
      hvs.map(h => ((2L * j + 1) * h + 17L * j + 3) % M).min
    }
    (0 until 4).map { b =>
      BandRow(b.toLong, (0 until 4).map(k => mins(4 * b + k)).mkString(","), d.doc_id)
    }
  }

  private def update(key: (Long, String), rows: Iterator[BandRow],
      state: GroupState[Bucket]): Iterator[Cand] = {
    val incoming = rows.map(_.doc_id).toSeq.distinct.sorted // in-batch determinism
    val old = state.getOption.map(_.ids).getOrElse(Nil)
    val out = scala.collection.mutable.ListBuffer.empty[Cand]
    var seen = old
    incoming.foreach { n =>
      seen.foreach { o =>
        out += Cand(math.min(o, n), math.max(o, n), key._1)
      }
      seen = n :: seen
    }
    state.update(Bucket(seen))
    out.iterator
  }

  /** Streaming candidates: (doc_a < doc_b, band) per shared band bucket. */
  def apply(docs: Dataset[Doc]): Dataset[Cand] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap(bandSigsOf)
      .groupByKey(r => (r.band, r.sig))
      .flatMapGroupsWithState[Bucket, Cand](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  /** Distributed band signatures for a (doc_id, text) frame — the frame
    * `bandSigsOf` must replay bit-identically (tokenization-parity spec). */
  private[graft] def batchBandSigs(docs: DataFrame): DataFrame =
    Dedup.minhashBandSigs(
      Dedup.shinglesOf(docs, 3, dedup = false), nPerm = 16, bandSize = 4)

  /** Batch twin: the distributed D2 band join on the same corpus —
    * candidate pairs with the bands they collide in. */
  def batchCandidates(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val sigs = batchBandSigs(docs)
    sigs.as("a")
      .join(sigs.as("b"),
        $"a.band" === $"b.band" && $"a.sig" === $"b.sig" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"), $"a.band".as("band"))
  }
}
