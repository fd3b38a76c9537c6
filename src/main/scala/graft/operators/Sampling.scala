package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps.h64

/** Deterministic corpus sampling — the reproducibility-critical prep
  * stage of a training-data pipeline. `rand()` re-rolls per task retry
  * and per plan re-execution; hash-based sampling (a keyed md5 draw) is
  * the distributed answer: the same document always lands on the same
  * side of the cut, on any cluster, any partitioning, any engine — which
  * is also what makes it DuckDB-oracle-checkable.
  */
object Sampling {

  /** T5a — Bernoulli sample at `pct`% by document-id hash: embarrassingly
    * parallel, no shuffle, reproducible. */
  def hashSample(s: SparkSession, dir: String, pct: Int = 20): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .filter(h64(concat(lit("sample:"), $"doc_id")) % 100 < pct)
      .select($"doc_id", $"lang", $"text")
      .orderBy($"doc_id")
  }

  /** T5c — source-mix rebalancing (the "data mixing" stage of a training
    * pipeline: cap over-represented sources so no source exceeds its
    * budget share). cap = ceil(share × N / #sources); sources under the
    * cap keep everything, sources over it keep their `cap` lowest hash
    * draws (deterministic — same kept set on any cluster/partitioning).
    * The cap derives from a single-row broadcast aggregate, never a
    * driver-side count; the per-source rank is one shuffle by source
    * (salt the source key if a 100 TB source is hot enough to skew). */
  def sourceMix(s: SparkSession, dir: String, share: Double = 0.6): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val capRow = docs.agg(
      ceil(lit(share) * count(lit(1)) / countDistinct($"source")).cast("long").as("cap"))
    val w = Window.partitionBy($"source")
      .orderBy(h64(concat(lit("mix:"), $"doc_id")), $"doc_id")
    docs
      .withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(capRow))
      .filter($"rk" <= $"cap")
      .select($"source", $"doc_id")
      .orderBy($"source", $"doc_id")
  }

  /** T5b — stratified sample: a fixed quota per language, taking each
    * stratum's lowest hash draws (a deterministic reservoir). One shuffle
    * by stratum; quota rank via window — at scale the stratum key is
    * high-cardinality enough (lang × shard salt if needed) to spread. */
  def stratifiedSample(s: SparkSession, dir: String, perStratum: Int = 50): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang")
      .orderBy(h64(concat(lit("strat:"), $"doc_id")), $"doc_id")
    Tables.documents(s, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= perStratum)
      .select($"lang", $"rk", $"doc_id")
      .orderBy($"lang", $"rk")
  }
}
