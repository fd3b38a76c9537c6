package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Distribution-drift monitoring — the observability stage of a long-running
  * ingest/training pipeline: is today's data still shaped like the data the
  * model was trained on? The standard scalar is the Population Stability
  * Index, PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) (a symmetrized KL over a
  * fixed binning; credit-scoring folklore thresholds: < 0.1 stable, > 0.25
  * investigate). Reference behavior: the scraper pipeline re-ingests
  * social/web payloads on a schedule (backend/src/api/services/
  * db_service.py ingest_data) with no check that the feed's shape held —
  * this operator is that missing monitor.
  */
object Drift {

  /** P10 — `p_drift_psi`: PSI of the event-value distribution, first half
    * of the time range (baseline) vs second half (current). Everything is
    * engine-replayable arithmetic: the split point is integer epoch-micro
    * midpoint, bins are fixed-width floor(value/width) clamped to
    * [0, nBins), Laplace-smoothed shares (+0.5 per bin) keep empty bins
    * total, per-bin terms round to 6dp and the PSI total is an exact
    * DECIMAL sum. Scale: one corpus pass into a `nBins`-row aggregate; the
    * windows below run on that bounded bin frame, never on the corpus. */
  def psiDrift(s: SparkSession, dir: String, nBins: Int = 20,
      width: Double = 25.0): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val span = ev.agg(min(unix_micros($"ts")).as("t0"), max(unix_micros($"ts")).as("t1"))
      .select(expr("t0 + (t1 - t0) DIV 2").as("mid")) // integer micros
    val binned = ev.crossJoin(broadcast(span))
      .withColumn("bin", least(greatest(floor($"value" / lit(width)), lit(0.0)),
        lit((nBins - 1).toDouble)).cast("int"))
      .withColumn("side", when(unix_micros($"ts") < $"mid", lit("base")).otherwise(lit("cur")))
    val counts = binned.groupBy($"bin").agg(
      sum(when($"side" === "base", 1L).otherwise(0L)).as("n_base"),
      sum(when($"side" === "cur", 1L).otherwise(0L)).as("n_cur"))
    val w = Window.partitionBy() // bounded: nBins rows
    val sm = lit(0.5 * nBins)
    counts
      .withColumn("p", ($"n_base" + lit(0.5)) / (sum($"n_base").over(w) + sm))
      .withColumn("q", ($"n_cur" + lit(0.5)) / (sum($"n_cur").over(w) + sm))
      .withColumn("psi_term", round(($"p" - $"q") * log($"p" / $"q"), 6))
      .withColumn("psi_total", round(
        sum($"psi_term".cast("decimal(18,6)")).over(w).cast("double"), 6))
      .select($"bin", $"n_base", $"n_cur", $"psi_term", $"psi_total")
      .orderBy($"bin")
  }

  /** V18 — `v_embedding_drift`: per-dimension mean shift of the embedding
    * STORE, reference slice (even vec_id) vs current slice (odd), plus
    * the aggregate L2 shift of the mean vector — the vector sibling of
    * P10. PSI watches a scalar column's histogram; this watches the space
    * the ANN serves: when the embedding distribution moves (model
    * refresh, corpus shift), LSH planes and IVF centroids trained on the
    * old mass lose recall — V17 measures that symptom, this measures the
    * cause, and together they are the store-health dashboard.
    *
    * Engine-replayable arithmetic: per-dim sums go through
    * DECIMAL(28,12) so they are order-independent (a float sum would
    * disagree across partitionings — the dsum discipline); the cast
    * chain is float → double (exact) → decimal, the same double→decimal
    * path every money aggregate already exercises; means divide the
    * exact decimal (as double) by the exact count and round 6dp; the L2
    * total is one decimal window-sum over the bounded dim frame. Scale:
    * ONE corpus pass (posexplode → dim-keyed partial aggs) into a
    * dim-sized aggregate; everything downstream runs on ≤ dim rows. */
  def embeddingDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = Tables.embeddings(s, dir)
      .select($"vec_id", posexplode($"embedding").as(Seq("dim", "x")))
      .select($"dim".cast("bigint").as("dim"),
        when($"vec_id" % 2 === 0, lit("ref")).otherwise(lit("cur")).as("side"),
        $"x".cast("double").cast("decimal(28,12)").as("xd"))
    val agg = x.groupBy($"dim").agg(
      sum(when($"side" === "ref", $"xd")).as("s_ref"),
      sum(when($"side" === "ref", 1L).otherwise(0L)).as("n_ref"),
      sum(when($"side" === "cur", $"xd")).as("s_cur"),
      sum(when($"side" === "cur", 1L).otherwise(0L)).as("n_cur"))
    val w = Window.partitionBy() // bounded: one row per dimension
    agg
      .withColumn("mean_ref", round($"s_ref".cast("double") / $"n_ref", 6))
      .withColumn("mean_cur", round($"s_cur".cast("double") / $"n_cur", 6))
      .withColumn("shift", round($"mean_cur" - $"mean_ref", 6))
      .withColumn("l2_shift", round(sqrt(
        sum(($"shift" * $"shift").cast("decimal(28,12)")).over(w)
          .cast("double")), 6))
      .select($"dim", $"mean_ref", $"mean_cur", $"shift", $"l2_shift")
      .orderBy($"dim")
  }
}
