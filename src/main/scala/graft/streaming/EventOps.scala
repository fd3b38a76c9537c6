package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Relational.dsum

/** Event-stream operators over `events` (reference analogue: the ingest /
  * order-event flow the agent reacts to).
  *
  * Each transform is written against a plain DataFrame so the SAME function
  * serves the batch query (what Verify checks) and the Structured Streaming
  * job (`readStream` source — see EventStreamSpec): windowed aggregation and
  * watermarked dedup run unchanged under `writeStream`; sessionization has a
  * `flatMapGroupsWithState` streaming twin sketched in the spec.
  */
object EventOps {

  // S1 — tumbling 5-minute activity aggregation. Under streaming, add
  // `.withWatermark("ts", "10 minutes")` and the same groupBy runs
  // incrementally with bounded state.
  def windowAgg(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .select($"window.start".as("win_start"), $"event_type", $"n_events", $"sum_value")
  }

  def windowAggQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    windowAgg(Tables.events(s, dir)).orderBy($"win_start", $"event_type")
  }

  // S1b — sliding 10-minute window every 5 minutes: each event lands in
  // two overlapping windows (window() materializes the assignment list —
  // no self-union). Streaming form is identical plus a watermark.
  def slidingAgg(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupBy(window($"ts", "10 minutes", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .select($"window.start".as("win_start"), $"event_type", $"n_events", $"sum_value")
  }

  def slidingAggQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    slidingAgg(Tables.events(s, dir)).orderBy($"win_start", $"event_type")
  }

  // S15 — sliding-window anomaly flags: each event's value scored against
  // the mean/σ of its user's previous W events (the ingest-monitoring op:
  // bot bursts and price glitches surface as |z| > 3 at arrival). Keyed
  // by user_id (high cardinality → scales out); the trailing frame makes
  // the flag CAUSAL — computable at arrival, so the streaming twin is a
  // flatMapGroupsWithState fold holding the last W values per user.
  // Float parity for the oracle: values pass through DECIMAL(18,6) so
  // the windowed sums are exact at any frame evaluation order (DuckDB
  // evaluates window aggregates via segment trees — double sums would
  // diverge), and mean/σ² derive from the exact sums through the same
  // IEEE expression shape on both engines.
  def valueAnomaly(events: DataFrame, w: Int = 10, z: Double = 3.0): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val frame = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-w, -1)
    events
      .withColumn("vd", $"value".cast("decimal(18,6)"))
      .withColumn("n", count($"vd").over(frame))
      .withColumn("sum_d", sum($"vd").over(frame))
      .withColumn("sumsq_d", sum($"vd" * $"vd").over(frame))
      .filter($"n" >= 3) // no meaningful σ below 3 observations
      .withColumn("mean", $"sum_d".cast("double") / $"n")
      .withColumn("varr", greatest(lit(0.0),
        ($"sumsq_d".cast("double") - $"sum_d".cast("double") * $"sum_d".cast("double") / $"n")
          / ($"n" - 1)))
      .withColumn("is_anomaly", abs($"value" - $"mean") > lit(z) * sqrt($"varr"))
      .select($"event_id", $"user_id", $"value",
        round($"mean", 6).as("mean"), round(sqrt($"varr"), 6).as("sigma"),
        $"is_anomaly")
  }

  def valueAnomalyQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    valueAnomaly(Tables.events(s, dir)).orderBy($"event_id")
  }

  // S2 — gap-based sessionization (30-min inactivity closes a session).
  // Batch form uses lag/running-sum windows partitioned by user_id (high
  // cardinality → scales out); the streaming twin is
  // flatMapGroupsWithState with a session timeout.
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_us".isNull ||
          unix_micros($"ts") - $"prev_us" > gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("sess_id",
        sum($"new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"), min($"ts").as("sess_start"), max($"ts").as("sess_end"))
      .orderBy($"user_id", $"sess_id")
  }

  def sessionizeQuery(s: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(s, dir))

  // S3 — view → click → purchase funnel: per-user first-touch timestamps,
  // strict temporal ordering between stages.
  def funnel(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupBy($"user_id")
      .agg(
        min(when($"event_type" === "view", $"ts")).as("mv"),
        min(when($"event_type" === "click", $"ts")).as("mc"),
        min(when($"event_type" === "purchase", $"ts")).as("mp"))
      .withColumn("funnel_stage",
        when($"mv".isNotNull && $"mc" > $"mv" && $"mp" > $"mc", 3)
          .when($"mv".isNotNull && $"mc" > $"mv", 2)
          .when($"mv".isNotNull, 1)
          .otherwise(0))
      .groupBy($"funnel_stage")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"funnel_stage")
  }

  def funnelQuery(s: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(s, dir))

  // S7 — semi-structured payload extraction: the `props` JSON column
  // parsed in-flight (get_json_object) and aggregated — the scraped-JSON
  // payload shape (db_service.ingest_data) handled without a schema pass.
  def propsStats(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS long)")) // ANSI mode: a bad value must yield null, not kill the job
      .groupBy($"event_type")
      .agg(count($"k").as("n_with_k"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  def propsStatsQuery(s: SparkSession, dir: String): DataFrame =
    propsStats(Tables.events(s, dir))

  // S5 — per-user recent interaction history: the reference's Redis chat
  // history shape (chat_service.get_redis_history — session-scoped
  // retrieval with a 24 h TTL), as a TTL window + last-k per user.
  def recentHistory(events: DataFrame, ttlHours: Int = 24, lastK: Int = 10): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val maxTs = events.agg(max(unix_micros($"ts")).as("max_us"))
    val live = events.crossJoin(broadcast(maxTs))
      .filter(unix_micros($"ts") >= $"max_us" - ttlHours * 3600L * 1000000L)
    val w = Window.partitionBy($"user_id")
      .orderBy(unix_micros($"ts").desc, $"event_id".desc)
    live.withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= lastK)
      .select($"user_id", $"rn", $"event_id", $"ts", $"event_type")
      .orderBy($"user_id", $"rn")
  }

  def recentHistoryQuery(s: SparkSession, dir: String): DataFrame =
    recentHistory(Tables.events(s, dir))

  // S4 — at-least-once → exactly-once reduction: collapse duplicate
  // deliveries within a minute per (user, type). Streaming twin:
  // `.withWatermark("ts","10 minutes").dropDuplicates(...)`.
  def eventDedup(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupBy($"user_id", $"event_type", date_trunc("minute", $"ts").as("win_minute"))
      .agg(min($"event_id").as("first_event_id"), count(lit(1)).as("n_dups"))
      .orderBy($"user_id", $"event_type", $"win_minute")
  }

  def eventDedupQuery(s: SparkSession, dir: String): DataFrame =
    eventDedup(Tables.events(s, dir))

  // S12 — stream-stream interval join: purchases matched to the same
  // user's views within the preceding hour. Under Structured Streaming
  // both sides carry watermarks and the time-range condition bounds the
  // join state (views older than the interval + watermark are evicted);
  // the same function runs as a batch inequality join for Verify/specs.
  def attributionJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val s = views.sparkSession
    import s.implicits._
    val v = views.select($"user_id".as("vu"), $"event_id".as("view_id"), $"ts".as("vts"))
    val p = purchases.select($"user_id".as("pu"), $"event_id".as("purchase_id"), $"ts".as("pts"))
    p.join(v, expr("pu = vu AND vts <= pts AND vts >= pts - interval 1 hour"))
      .select($"pu".as("user_id"), $"purchase_id", $"pts", $"view_id", $"vts")
  }

  // S12b — LEFT OUTER stream-stream interval join: every purchase emits,
  // matched to its preceding-hour views, or with null view columns once
  // no view can still arrive. Unmatched-row emission is the hard part of
  // streaming outer joins: a purchase is held in state until the view
  // side's watermark passes the interval bound, then released with
  // nulls — so attribution reports un-attributed conversions instead of
  // silently dropping them (the inner join above keeps matches only).
  def attributionJoinOuter(views: DataFrame, purchases: DataFrame): DataFrame = {
    val s = views.sparkSession
    import s.implicits._
    val v = views.select($"user_id".as("vu"), $"event_id".as("view_id"), $"ts".as("vts"))
    val p = purchases.select($"user_id".as("pu"), $"event_id".as("purchase_id"), $"ts".as("pts"))
    p.join(v, expr("pu = vu AND vts <= pts AND vts >= pts - interval 1 hour"),
        "left_outer")
      .select($"pu".as("user_id"), $"purchase_id", $"pts", $"view_id", $"vts")
  }

  def attributionOuterQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
    attributionJoinOuter(
        e.filter($"event_type" === "view"),
        e.filter($"event_type" === "purchase"))
      .orderBy($"user_id", $"purchase_id", asc_nulls_first("view_id"))
  }

  // S11 — stream-static enrichment: attach the customer dimension to the
  // event stream (user_id = c_custkey). The dim broadcasts, so under
  // Structured Streaming every micro-batch joins against executor-local
  // state with no shuffle of the stream — the standard streaming-enrich
  // shape at any scale (dim refresh = re-broadcast, not a stream rewind).
  def enrich(events: DataFrame, customer: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events.join(
        broadcast(customer.select($"c_custkey", $"c_name", $"c_mktsegment")),
        $"user_id" === $"c_custkey")
      .select($"user_id", $"event_id", $"ts", $"event_type",
        $"c_name", $"c_mktsegment")
  }

  def enrichQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    enrich(Tables.events(s, dir), Tables.customer(s, dir))
      .orderBy($"user_id", $"event_id")
  }

  // S13 — SCD type-2 dimension build: fold each user's event stream into
  // a versioned state history (state = event_type run; a row per change,
  // effective_from/effective_to half-open, open-ended row = current).
  // This is the CDC→dimension backfill shape: one shuffle keyed by the
  // entity (high cardinality), windows do the rest — no state larger than
  // a user's change list, so it scales like sessionize. The incremental
  // twin is the ProductSync/OrderFold mapGroupsWithState family (latest
  // state per key); this batch form is what rebuilds the full history.
  def scd2(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events
      .select($"event_id", $"user_id", $"ts", $"event_type")
      .withColumn("prev", lag($"event_type", 1).over(byUser))
      .filter($"prev".isNull || $"prev" =!= $"event_type")
      .select($"user_id",
        row_number().over(byUser).cast("long").as("version"),
        $"event_type".as("state"),
        $"ts".as("eff_from"),
        lead($"ts", 1).over(byUser).as("eff_to"))
  }

  def scd2Query(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    scd2(Tables.events(s, dir)).orderBy($"user_id", $"version")
  }

  def attributionQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
    attributionJoin(
        e.filter($"event_type" === "view"),
        e.filter($"event_type" === "purchase"))
      .orderBy($"user_id", $"purchase_id", $"view_id")
  }

  // S16 — behavioral transition matrix: per-user consecutive event-type
  // pairs (the first-order Markov model of the clickstream — the "what do
  // users do after a view" funnel-diagnostics table; the reference logs
  // the raw activity stream and reads it back verbatim, this is its
  // first model). One shuffle keyed by user for the lag window (a user's
  // stream is the bounded partition, sessionize's argument), then the
  // pair agg collapses to |types|² rows with map-side combine. The
  // per-row probability divides by the prev-type total via a window over
  // that bounded pair frame; round 6dp for engine parity.
  def transitionMatrix(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(byUser))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy($"prev_type") // bounded: |types|² rows
    pairs
      .withColumn("p", round($"n" / sum($"n").over(byPrev), 6))
      .select($"prev_type", $"event_type", $"n", $"p")
      .orderBy($"prev_type", $"event_type")
  }

  def transitionsQuery(s: SparkSession, dir: String): DataFrame =
    transitionMatrix(Tables.events(s, dir))

  // S18 — daily + rolling 7-day distinct active users (the DAU/WAU
  // engagement series every event log feeds). The rolling distinct is
  // deliberately NOT a COUNT(DISTINCT) window over raw events: a 7-day
  // frame re-ships every event into 7 windows BEFORE deduplication, and
  // a distinct-over-window isn't map-side combinable — at 100 TB that's
  // the event firehose amplified 7× through one shuffle. Instead: dedup
  // to (day,user) pairs first (one keyed shuffle with map-side
  // combine — the pair frame is bounded by days × active users, orders
  // of magnitude smaller than events), then each PAIR votes into the ≤7
  // window-days it covers and a second distinct+count lands the series.
  // All integer/date arithmetic — replayable to the bit.
  def rollingActives(events: DataFrame, windowDays: Int = 7,
      cacheKey: String = "rolling-du"): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    // three consumers (DAU agg, vote explosion, observed-day clip) share
    // one materialization of the deduped pair frame
    val du = graft.Caches.cached(cacheKey) {
      events.select(to_date($"ts").as("d"), $"user_id").distinct()
    }
    val dau = du.groupBy($"d".as("day")).agg(count(lit(1)).as("dau"))
    val days = du.select($"d".as("day")).distinct() // bounded: calendar-sized
    val votes = du
      .select(explode(expr(s"sequence(d, date_add(d, ${windowDays - 1}))"))
        .as("day"), $"user_id")
      .distinct()
      .join(broadcast(days), "day") // clip windows past the observed range
      .groupBy($"day").agg(count(lit(1)).as("active_7d"))
    dau.join(votes, "day").orderBy($"day")
  }

  def rollingActivesQuery(s: SparkSession, dir: String): DataFrame =
    rollingActives(Tables.events(s, dir), cacheKey = s"rolling-du:$dir")

  // S19 — the MERGEABLE-SKETCH twin of S18: daily + rolling 7-day
  // distinct actives from Apache DataSketches HLL (hll_sketch_agg /
  // hll_union_agg — Spark 4 natives). S18's exact pair frame is bounded
  // by days × ACTIVES; at 100 TB-of-events with ~10⁹ actives that frame
  // is itself a monster, and re-answering "uniques over any window" means
  // re-shuffling it. The sketch path pays one events scan into a
  // days-sized frame of ~KB sketches (map-side combinable — partials
  // merge by register-max), and every rolling window after that is a
  // union over ≤7 SKETCHES per day on the calendar-bounded frame —
  // re-aggregable to any window without touching events again. That
  // re-aggregation property (union = register max, associative,
  // order-independent) is why pre-aggregated uniques exist at scale;
  // ±1.04/√2^lgK standard error is the price (lgK=12 → ~1.6%).
  // DataSketches binaries have no DuckDB twin ⇒ rows-only; the spec pins
  // estimate-vs-exact error, sketch mergeability (half-split union ≡
  // whole), and partitioning invariance.
  def rollingActivesHll(events: DataFrame, windowDays: Int = 7,
      lgK: Int = 12): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val daily = events
      .select(to_date($"ts").as("d"), $"user_id")
      .groupBy($"d")
      .agg(hll_sketch_agg($"user_id", lgK).as("sk"))
      .localCheckpoint(eager = true) // three consumers, one materialization
    val days = daily.select($"d".as("day"))
    val dau = daily.select($"d".as("day"),
      hll_sketch_estimate($"sk").as("dau_est"))
    val rolled = daily
      .select(explode(expr(s"sequence(d, date_add(d, ${windowDays - 1}))"))
        .as("day"), $"sk")
      .join(broadcast(days), "day") // clip windows past the observed range
      .groupBy($"day")
      .agg(hll_sketch_estimate(hll_union_agg($"sk", allowDifferentLgConfigK = false))
        .as("active_7d_est"))
    dau.join(rolled, "day").orderBy($"day")
  }

  def rollingActivesHllQuery(s: SparkSession, dir: String): DataFrame =
    rollingActivesHll(Tables.events(s, dir))

  // S20 — audience-overlap estimation via KMV bottom-k distinct sketches
  // (Beyer et al. 2007, "Distinct-value synopses over ...") — the
  // set-OPERATION sketch HLL lacks: per event type keep the k smallest
  // md5-derived user hashes; |A| ≈ (k−1)/θ_k, and A∩B/A∪B come from the
  // bottom-k of the UNION (U = k smallest of kmin_A ∪ kmin_B; Jaccard ≈
  // |U ∩ kmin_A ∩ kmin_B|/|U|). Sets smaller than k are EXACT (their
  // whole hash set is the sketch). Why it scales: the only corpus-sized
  // work is one map-side-combinable distinct + one range-shuffled
  // grouped rank (Ranking.rowNumberWithin — |types| groups would skew a
  // plain window); everything after runs on k·|types| rows. Why it
  // hash-matches: bottom-k of a deterministic hash is a pure FACT of the
  // data — no registers, no randomness — so DuckDB replays the sketch
  // itself, exact-regime branches and all (the V4/D5b argument).
  def audienceOverlap(events: DataFrame, k: Int = 64,
      cacheKey: String = "aud-km"): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val dom = 1152921504606846976.0 // 2^60 — h64's 15-hex-digit domain
    def estOf(n: Column, kth: Column): Column =
      when(n < k, n.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(dom) / kth.cast("double"))
    val uh = events.select($"event_type".as("t"),
        graft.operators.TextOps.h64(
          concat(lit("aud:"), $"user_id".cast("string"))).as("h"))
      .distinct()
    val km = graft.Caches.cached(cacheKey) { // feeds per-type AND pair legs
      graft.operators.Ranking
        .rowNumberWithin(uh, "t", Seq($"h"), "rk", cacheKey + ":rk")
        .filter($"rk" <= k)
        .select($"t", $"h")
    }
    val pe = km.groupBy($"t")
      .agg(count(lit(1)).as("n"), max($"h").as("kth"))
      .select($"t", estOf($"n", $"kth").as("est"))
    val pairs = pe.select($"t".as("ta")).crossJoin(pe.select($"t".as("tb")))
      .filter($"ta" < $"tb")
    // (pair, h) rows; sides=2 ⇔ h sits in BOTH types' bottom-k sets
    val pu = km.join(broadcast(pairs), $"t" === $"ta" || $"t" === $"tb")
      .groupBy($"ta", $"tb", $"h").agg(count(lit(1)).as("sides"))
    // bottom-k of the union: the windowed frame is ≤2k rows per pair —
    // k-bounded, not data-bounded, so a plain window is safe here
    val w = Window.partitionBy($"ta", $"tb").orderBy($"h")
    val pa = pu.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
      .groupBy($"ta", $"tb")
      .agg(count(lit(1)).as("ku"), max($"h").as("kthu"),
        sum(when($"sides" === 2, 1L).otherwise(0L)).as("nboth"))
    pa.join(pe.select($"t".as("ta"), $"est".as("ea")), "ta")
      .join(pe.select($"t".as("tb"), $"est".as("eb")), "tb")
      .select($"ta".as("t_a"), $"tb".as("t_b"),
        round($"ea", 6).as("est_a"), round($"eb", 6).as("est_b"),
        round(estOf($"ku", $"kthu"), 6).as("est_union"),
        round($"nboth".cast("double") / $"ku".cast("double"), 6)
          .as("est_jaccard"),
        round($"nboth".cast("double") / $"ku".cast("double")
          * estOf($"ku", $"kthu"), 6).as("est_intersection"))
      .orderBy($"t_a", $"t_b")
  }

  def audienceOverlapQuery(s: SparkSession, dir: String): DataFrame =
    audienceOverlap(Tables.events(s, dir), cacheKey = s"aud-km:$dir")
}
