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

  /** P6 — DSIR-style importance resampling (`p_dsir_sample`): select the
    * k documents most like a TARGET distribution (here the `lang='en'`
    * slice) under a unigram likelihood-ratio weight, the data-selection
    * method of Xie et al. 2023 ("Data Selection for Language Models via
    * Importance Resampling"). Per-doc importance logw = Σ_w tf_w ·
    * (ln P_target(w) − ln P_source(w)) with add-1 smoothing; sampling
    * uses the Gumbel-max trick — key = logw + Gumbel(hash(doc_id)) — so
    * the weighted draw is deterministic, cluster-independent, and
    * oracle-replayable (same md5 draw discipline as T5a-c).
    *
    * Parity discipline (see unigramLogprob): every transcendental lands
    * in a 6dp round, per-term products round then sum as DECIMAL(18,6)
    * (exact, order-independent), the ranking key is a DECIMAL add — both
    * engines order identically, so the selected SET mirrors exactly.
    * Scale: two keyed shuffles (word counts, per-doc sum) + one
    * broadcast scalar row; top-k is a TakeOrdered, never a global sort. */
  def dsirSample(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select($"doc_id", $"lang", explode(split(lower($"text"), " ")).as("w"))
    val tf = words.groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    val cnt = words.groupBy($"w").agg(
      count(lit(1)).as("cs"),
      sum(when($"lang" === "en", 1L).otherwise(0L)).as("ct"))
    val stats = cnt.agg(
      sum($"cs").as("ns"), sum($"ct").as("nt"), count(lit(1)).as("v"))
    val terms = tf.join(cnt, "w")
      .crossJoin(broadcast(stats))
      .withColumn("lr", round(
        log(($"ct" + lit(1)).cast("double") / ($"nt" + $"v")) -
        log(($"cs" + lit(1)).cast("double") / ($"ns" + $"v")), 6))
      .withColumn("term", round($"tf" * $"lr", 6).cast("decimal(18,6)"))
    val logw = terms.groupBy($"doc_id").agg(sum($"term").as("logw"))
    // Gumbel(0,1) from the 60-bit md5 draw: u=(h+0.5)/2^60, g=-ln(-ln u)
    val u = (h64(concat(lit("dsir:"), $"doc_id")).cast("double") + lit(0.5)) /
      lit(1.152921504606846976e18)
    logw
      .withColumn("gum", round(-log(-log(u)), 6).cast("decimal(18,6)"))
      .withColumn("gkey", $"logw" + $"gum")
      .orderBy($"gkey".desc, $"doc_id")
      .limit(k)
      .select($"doc_id", $"logw".cast("double").as("logw"),
        $"gkey".cast("double").as("gkey"))
  }

  /** P7 — `p_shuffle_shards`: the deterministic GLOBAL SHUFFLE + shard
    * assignment a training run consumes (the last batch stage of every
    * LLM data pipeline: break source/temporal locality, write N shard
    * files a loader streams sequentially). `rand()`-based shuffles
    * re-roll per retry and differ per cluster; here both the shard and
    * the within-shard order ride the same keyed md5 draw as T5a-c, so
    * the layout is bit-reproducible on any engine/partitioning — which
    * is what makes a training run resumable and its data order
    * auditable. shard = h % nShards needs no global coordination
    * (embarrassingly parallel), and pos is a per-shard window rank —
    * one shuffle by shard, each shard sorts independently. At 100 TB
    * nShards scales with the corpus (real pipelines write 10k+ shards,
    * each executor-sized), so the per-shard sort stays bounded; there
    * is deliberately NO global row_number (a single-reducer rank is the
    * anti-pattern this shape avoids). Reference behavior: the batch
    * corpus export (backend/scrapers/product_scraper.py:221
    * save_to_csv materializes one ordered file); this is that step made
    * distributed, shuffled, and reproducible. */
  def shuffleShards(s: SparkSession, dir: String, nShards: Int = 8): DataFrame =
    shuffleShardsOf(Tables.documents(s, dir), nShards)

  private[graft] def shuffleShardsOf(docs: DataFrame, nShards: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val w = Window.partitionBy($"shard").orderBy($"h", $"doc_id")
    docs
      .select($"doc_id", h64(concat(lit("shuffle:"), $"doc_id")).as("h"))
      .withColumn("shard", ($"h" % nShards).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select($"shard", $"pos", $"doc_id")
      .orderBy($"shard", $"pos")
  }

  /** P9 — temperature-scaled source sampling (`p_temperature_sample`):
    * draw a k-doc mixture whose source shares follow p_i ∝ n_i^α — the
    * multilingual/source rebalancing rule of mT5 (Xue et al. 2021) and
    * the exponential-smoothing mixing in XLM-R (Conneau et al. 2020).
    * α = 1 keeps natural proportions, α → 0 approaches uniform; α = 0.5
    * (the common default) upsamples small sources without flattening the
    * head. T5c's cap is the budget-clip version of this; the temperature
    * draw is the allocation version a pretraining mix actually uses.
    *
    * Determinism/parity: s_i = round(n_i^α, 6) as DECIMAL so the share
    * sum is exact; quota_i = floor(k · (s_i/S)) with the division and
    * multiply in IEEE double written identically in the oracle; member
    * selection is the per-source lowest-hash rank (the T5b reservoir).
    * Scale: one count-by-source agg (broadcast back — #sources rows),
    * one rank shuffle by source. floor() can leave ≤ #sources docs of
    * budget unspent — deliberate (a largest-remainder top-up would need
    * a global sort over sources; at any real k the remainder is noise). */
  def temperatureSample(s: SparkSession, dir: String, alpha: Double = 0.5,
      k: Int = 200): DataFrame =
    temperatureSampleOf(Tables.documents(s, dir), alpha, k)

  /** P9 core over any (source, doc_id) frame (fixture-testable). */
  private[graft] def temperatureSampleOf(docs: DataFrame, alpha: Double,
      k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val weights = docs.groupBy($"source").agg(count(lit(1)).as("n"))
      .withColumn("sw", round(pow($"n".cast("double"), alpha), 6).cast("decimal(18,6)"))
    val tot = weights.agg(sum($"sw").as("tw"))
    val quota = weights.crossJoin(broadcast(tot))
      .withColumn("quota",
        floor(lit(k) * ($"sw".cast("double") / $"tw".cast("double"))).cast("long"))
      .select($"source", $"quota")
    val w = Window.partitionBy($"source")
      .orderBy(h64(concat(lit("temp:"), $"doc_id")), $"doc_id")
    docs
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quota), "source")
      .filter($"rk" <= $"quota")
      .select($"source", $"rk", $"doc_id")
      .orderBy($"source", $"rk")
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

  /** P13 — token-budget mix planner (`p_mix_budget`): the arithmetic a
    * training run does before it reads a byte — given a total token
    * budget B and P9's temperature rule for target shares (p_i ∝
    * n_i^α), emit the per-source plan: token count, target share, token
    * quota, sampling rate, and epochs (rate rounded UP — how many
    * passes over a small source the quota implies; rate > 1 IS the
    * oversampling/repetition decision the data-budgeting literature
    * warns about, surfaced as a number instead of discovered mid-run).
    * P3/P9/T5c select documents; this emits the PLAN they execute — the
    * mixing block of a data card.
    *
    * Scale: one corpus aggregation (token counts per source, map-side
    * combined) collapsing to a #sources-row frame; everything after is
    * broadcast arithmetic. Float discipline = P9's: s_i = round(n_i^α,
    * 6) as DECIMAL so the share denominator is exact, quotas floor an
    * identically-written IEEE product on both engines. */
  def mixBudget(s: SparkSession, dir: String, alpha: Double = 0.5,
      budget: Long = 1000000L): DataFrame =
    mixBudgetOf(Tables.documents(s, dir), alpha, budget)

  private[graft] def mixBudgetOf(docs: DataFrame, alpha: Double,
      budget: Long): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs.groupBy($"source")
      .agg(sum(size(split($"text", " ")).cast("long")).as("n_tokens"))
    val weights = toks.withColumn("sw",
      round(pow($"n_tokens".cast("double"), alpha), 6).cast("decimal(18,6)"))
    val tot = weights.agg(sum($"sw").as("tw"))
    weights.crossJoin(broadcast(tot))
      .withColumn("share",
        round($"sw".cast("double") / $"tw".cast("double"), 6))
      .withColumn("quota",
        floor(lit(budget) * ($"sw".cast("double") / $"tw".cast("double")))
          .cast("long"))
      .withColumn("rate",
        round($"quota".cast("double") / $"n_tokens".cast("double"), 6))
      // epochs = ceil of the ROUNDED rate column — the published
      // contract (r15, ADVICE r14 #2: ceil of the unrounded ratio
      // disagrees with ceil(rate) for ratios within 5e-7 above an
      // integer; both engines now ceil the same 6dp value)
      .withColumn("epochs", ceil($"rate").cast("long"))
      .select($"source", $"n_tokens", $"share", $"quota", $"rate", $"epochs")
      .orderBy($"source")
  }

  /** P12 — quality-curriculum training order (`p_curriculum`): phase
    * docs by T13's quality tier (ascending — the "anneal on quality"
    * schedule: noisy web text early, curated-grade text in the final
    * phase, the FineWeb-Edu/Llama-style annealing recipe made explicit)
    * and shuffle deterministically WITHIN each phase. The output
    * contract is P7's made curriculum-aware: (phase, shard, pos) is a
    * total training order a reader walks phase by phase, interleaving
    * shards within a phase.
    *
    * Scale shape: the tier assignment is T13 (one agg + a 3-value
    * broadcast); ordering inherits P7's no-global-rank discipline — the
    * window is (phase, shard)-partitioned, so every rank group is
    * ~corpus/(4·nShards) and there is deliberately no single-reducer
    * global ROW_NUMBER; at 100 TB nShards scales with the corpus
    * exactly as in P7. Same md5 draw ⇒ bit-reproducible + oracle-
    * replayable. */
  def curriculum(s: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"phase", $"shard").orderBy($"h", $"doc_id")
    TextOps.qualityTiers(s, dir)
      .select($"doc_id", $"tier".as("phase"))
      .withColumn("h", h64(concat(lit("curriculum:"), $"doc_id")))
      .withColumn("shard", ($"h" % nShards).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select($"phase", $"shard", $"pos", $"doc_id")
      .orderBy($"phase", $"shard", $"pos")
  }
}
