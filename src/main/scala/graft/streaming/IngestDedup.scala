package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Corpus ingest dedup — D1 (exact dedup) as a stream: documents dedup
  * against the full ingest history at arrival time, so a crawler can
  * drop clones before they ever land in the corpus store (the batch
  * operator dedups after the fact; at 100 TB dropping a clone at ingest
  * saves its storage, its shuffle, and every downstream pass).
  *
  * State = one row per distinct content hash (keeper id + copy count),
  * sharded by the hash key across the state store. Dedup state is
  * history-long by nature, so there is no watermark; a production
  * deployment bounds it by TTL'ing the state store or compacting it
  * into the batch hash table periodically.
  *
  * Within a batch the smallest doc_id wins (deterministic under replay);
  * across batches the established keeper wins — feeding batches in id
  * order makes the stream's decisions equal the batch D1 keep-set, which
  * is what the spec pins.
  */
object IngestDedup {

  case class Doc(doc_id: Long, text: String)
  case class Seen(keep_id: Long, n_copies: Long)
  case class Decision(doc_id: Long, keep_id: Long, is_dup: Boolean)

  /** Batch twin: per-doc decisions from the D1 grouping — a doc is a dup
    * iff it is not its text group's smallest id. */
  def batchDecisions(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5($"text"))
    docs
      .withColumn("keep_id", min($"doc_id").over(w))
      .select($"doc_id", $"keep_id", ($"doc_id" =!= $"keep_id").as("is_dup"))
      .orderBy($"doc_id")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def update(h: String, docs: Iterator[Doc],
      state: GroupState[Seen]): Iterator[Decision] = {
    val sorted = docs.toSeq.sortBy(_.doc_id) // smallest id wins in-batch
    var st = state.getOption
    val out = sorted.map { d =>
      st match {
        case None =>
          st = Some(Seen(d.doc_id, 1L))
          Decision(d.doc_id, d.doc_id, is_dup = false)
        case Some(s0) =>
          st = Some(s0.copy(n_copies = s0.n_copies + 1L))
          Decision(d.doc_id, s0.keep_id, is_dup = true)
      }
    }
    st.foreach(state.update) // materialized above — safe to update now
    out.iterator
  }

  /** Streaming twin: one decision per arriving document. */
  def apply(docs: Dataset[Doc]): Dataset[Decision] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => md5hex(d.text))
      .flatMapGroupsWithState[Seen, Decision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
