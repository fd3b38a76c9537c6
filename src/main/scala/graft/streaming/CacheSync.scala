package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Semantic-cache write path (reference semantic_cache.py:60
  * add_to_semantic_cache, :76 clear_semantic_cache): V2 covers the lookup;
  * this models insertion and invalidation as a mutation-log fold.
  *
  * Events are keyed by the query fingerprint (the cache key the reference
  * derives from the normalized query). `put` upserts an entry, `evict`
  * removes one key, `clear` is the admin wipe-everything action. Keyed
  * streaming state handles put/evict (one row per live key, bounded by
  * cache size); the global `clear` is a maintenance barrier — in the
  * batch fold it invalidates every entry whose last put precedes the
  * latest clear, which is exactly Chroma's delete-collection-and-recreate
  * semantics replayed over a log.
  */
object CacheSync {

  case class CacheEvent(key: String, response: String, seq: Long, op: String)
  case class CacheEntry(key: String, response: String, last_seq: Long,
      live: Boolean)

  /** Batch snapshot: per key, the latest put/evict wins; a global clear at
    * seq C kills any entry whose winning put is ≤ C. */
  def snapshot(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val keyed = events.filter($"op" =!= "clear")
    val clearSeq = events.filter($"op" === "clear")
      .agg(coalesce(max($"seq"), lit(Long.MinValue)).as("clear_seq"))
    val w = Window.partitionBy($"key").orderBy($"seq".desc)
    keyed
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .crossJoin(broadcast(clearSeq)) // single row
      .select($"key", $"response", $"seq".as("last_seq"),
        ($"op" === "put" && $"seq" > $"clear_seq").as("live"))
      .orderBy($"key")
  }

  /** Live entries only (what the V2 lookup would search). */
  def liveSnapshot(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    snapshot(events).filter($"live").drop("live")
  }

  private def update(key: String, evs: Iterator[CacheEvent],
      state: GroupState[CacheEntry]): CacheEntry = {
    val prior = state.getOption.map(e =>
      CacheEvent(e.key, e.response, e.last_seq, if (e.live) "put" else "evict"))
    val latest = (prior.iterator ++ evs).maxBy(_.seq)
    val next = CacheEntry(key, latest.response, latest.seq, latest.op == "put")
    if (next.live) state.update(next) else state.remove()
    next
  }

  /** Streaming twin for the keyed ops (put/evict): one state row per live
    * key, re-emitted on change; `clear` runs as a maintenance barrier
    * through the batch fold, not the keyed stream. */
  def apply(events: Dataset[CacheEvent]): Dataset[CacheEntry] = {
    import events.sparkSession.implicits._
    events.filter(_.op != "clear")
      .groupByKey(_.key)
      .mapGroupsWithState[CacheEntry, CacheEntry](
        GroupStateTimeout.NoTimeout())(update)
  }
}
