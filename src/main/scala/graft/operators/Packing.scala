package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps.h64

/** Sequence packing for training batches: greedily pack documents into
  * token-budget bins (each training sequence concatenates whole documents
  * up to the context size; an over-budget document opens its own bin).
  *
  * A global greedy fold is inherently sequential, so the corpus is first
  * salted into (lang, shard) groups — shard = doc-hash % nShards keeps
  * every group bounded no matter how large a language stratum grows —
  * and packing runs as an independent in-memory fold per group (the same
  * shuffle-by-key + bounded-group-fold shape as the place_order fold).
  * Packing quality is unaffected by sharding beyond ≤1 partially-filled
  * bin per shard, the usual distributed-packing trade.
  */
object Packing {

  case class PackDoc(lang: String, shard: Int, doc_id: Long, tokens: Long)
  case class PackedDoc(lang: String, shard: Int, doc_id: Long, tokens: Long,
      bin_id: Long, fill_after: Long)

  private def packGroup(key: (String, Int), docs: Iterator[PackDoc],
      budget: Long): Iterator[PackedDoc] = {
    val ds = docs.toArray.sortBy(_.doc_id)
    var bin = 1L
    var fill = 0L
    ds.iterator.map { d =>
      if (fill > 0 && fill + d.tokens > budget) { bin += 1; fill = 0L }
      fill += d.tokens
      PackedDoc(d.lang, d.shard, d.doc_id, d.tokens, bin, fill)
    }
  }

  private[graft] def docsWithTokens(s: SparkSession, dir: String,
      nShards: Int): Dataset[PackDoc] =
    docsWithTokensOf(Tables.documents(s, dir), nShards)

  /** Same over any (doc_id, lang, text) frame (pipeline composition). */
  private[graft] def docsWithTokensOf(docs: DataFrame, nShards: Int): Dataset[PackDoc] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"lang", (h64(concat(lit("pack:"), $"doc_id")) % nShards).cast("int").as("shard"),
        $"doc_id", size(split(trim($"text"), " +")).cast("long").as("tokens"))
      .as[PackDoc]
  }

  /** Core fold on any PackDoc dataset — fixture/property-testable. */
  private[graft] def packDocs(docs: Dataset[PackDoc], budget: Long): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => (d.lang, d.shard))
      .flatMapGroups((k: (String, Int), it: Iterator[PackDoc]) => packGroup(k, it, budget))
  }

  /** queries entry `p_pack_tokens`: per-document bin assignment, hash-
    * matched against a DuckDB recursive-CTE replay of the same greedy
    * fold. */
  def packTokens(s: SparkSession, dir: String, budget: Long = 200L,
      nShards: Int = 4): DataFrame = {
    import s.implicits._
    packDocs(docsWithTokens(s, dir, nShards), budget)
      .toDF()
      .orderBy($"lang", $"shard", $"doc_id")
  }

  /** Best-fit-decreasing fold for one group: items in size-desc order
    * (doc_id tie-break), each placed in the open bin with the LEAST
    * remaining capacity that still fits (ties → lowest bin id); no fit →
    * new bin. Deterministic, but the per-step state is the whole
    * open-bins vector — not a scalar — so unlike the arrival-order
    * greedy there is no recursive-CTE replay; the contract entry is
    * rows-only and the spec carries the semantics (reference equality +
    * validity + never-worse-than-greedy on random inputs). */
  private def packGroupBestFit(docs: Iterator[PackDoc],
      budget: Long): Iterator[PackedDoc] = {
    val ds = docs.toArray.sortBy(d => (-d.tokens, d.doc_id))
    val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
    ds.iterator.map { d =>
      var best = -1
      var i = 0
      while (i < fills.length) {
        if (fills(i) + d.tokens <= budget &&
            (best < 0 || fills(i) > fills(best))) best = i
        i += 1
      }
      if (best < 0) { fills += 0L; best = fills.length - 1 }
      fills(best) += d.tokens
      PackedDoc(d.lang, d.shard, d.doc_id, d.tokens, best + 1L, fills(best))
    }
  }

  /** BFD on any PackDoc dataset — same shard-and-fold shape as packDocs. */
  private[graft] def packDocsBestFit(docs: Dataset[PackDoc],
      budget: Long): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => (d.lang, d.shard))
      .flatMapGroups((_: (String, Int), it: Iterator[PackDoc]) =>
        packGroupBestFit(it, budget))
  }

  /** queries entry `p_pack_bestfit`: best-fit-decreasing packing — the
    * higher-utilization offline variant next to P2's arrival-order greedy
    * (BFD waste is bounded at 11/9·OPT+1 bins vs greedy's 2·OPT; size-
    * sorting is free here because the group is already materialized for
    * the fold). Same salted (lang, shard) grouping, so group size stays
    * bounded at any corpus scale. */
  def packTokensBestFit(s: SparkSession, dir: String, budget: Long = 200L,
      nShards: Int = 4): DataFrame = {
    import s.implicits._
    packDocsBestFit(docsWithTokens(s, dir, nShards), budget)
      .toDF()
      .orderBy($"lang", $"shard", $"doc_id")
  }
}
