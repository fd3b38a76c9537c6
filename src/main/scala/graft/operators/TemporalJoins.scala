package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.EventOps

/** Temporal join operators Spark has no built-in form for — the north
  * star's named examples (as-of join, range join) — expressed as
  * compositions that keep every join an equi-join:
  *
  *  - As-of (point-in-time) join: attach to each left row the latest
  *    right row at-or-before its timestamp. The scalable form is NOT an
  *    inequality join (quadratic blow-up per key) but a union of the two
  *    tagged streams + a carry-forward window: one shuffle by key, one
  *    sort within partitions, last(ignoreNulls) does the matching.
  *  - Range (interval) join: match fact rows to irregular intervals by
  *    expanding each interval to the fixed-width buckets it covers,
  *    equi-joining on the bucket, then post-filtering the exact bounds.
  *    The bucket join shuffles on a uniform key; interval count and
  *    per-bucket interval fanout are bounded, so no nested-loop join
  *    appears at any scale.
  */
object TemporalJoins {

  // J1 — as-of attribution: each purchase event matched to the same
  // user's most recent view at-or-before the purchase (ties: view sorts
  // before purchase at equal ts; among equal-ts views the highest
  // event_id wins). The marketing-attribution query shape.
  def asofAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .filter($"event_type".isin("view", "purchase"))
      .select($"event_id", $"user_id", $"ts", $"event_type",
        when($"event_type" === "view", 0).otherwise(1).as("tag"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"tag", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("view_id",
        last(when($"tag" === 0, $"event_id"), ignoreNulls = true).over(w))
      .withColumn("view_ts",
        last(when($"tag" === 0, $"ts"), ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"),
        $"view_id", $"view_ts",
        (unix_micros($"ts") - unix_micros($"view_ts")).as("lag_us"))
      .orderBy($"user_id", $"purchase_ts", $"purchase_id")
  }

  /** Deterministic irregular promo windows (month-granularity bounds,
    * deliberately overlapping so the join is a true many-to-many range
    * match, not a partition). */
  private[graft] val promos: Seq[(Int, String, String)] = Seq(
    (1, "1995-02-01", "1995-07-01"),
    (2, "1996-11-15", "1997-02-15"),
    (3, "1997-01-01", "1998-01-01"),
    (4, "1997-06-10", "1997-06-20"),
    (5, "1999-12-01", "2000-03-01"))

  // J2 — range join: revenue per promo window over lineitem shipdates.
  // Interval bucketing: each promo expands to the calendar months it
  // covers (bounded fanout), lineitem buckets by ship month, equi-join
  // on the month + exact [start, end) post-filter.
  def promoRangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val promoDf = s.createDataFrame(promos).toDF("promo_id", "start_s", "end_s")
      .select($"promo_id", to_timestamp($"start_s").as("start_ts"),
        to_timestamp($"end_s").as("end_ts"))
    val promoMonths = promoDf
      .withColumn("m", explode(expr(
        "sequence(date_trunc('month', start_ts), date_trunc('month', end_ts), interval 1 month)")))
    val li = Tables.lineitem(s, dir)
      .select($"l_shipdate", ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      .withColumn("m", date_trunc("month", $"l_shipdate"))
    li.join(broadcast(promoMonths), Seq("m"))
      .filter($"l_shipdate" >= $"start_ts" && $"l_shipdate" < $"end_ts")
      .groupBy($"promo_id")
      .agg(count(lit(1)).as("n_lines"),
        Relational.dsum($"rev").as("revenue"))
      .orderBy($"promo_id")
  }

  // J3 — SCD2 dimension lookup: attach to each purchase the dimension
  // version (state + version number) valid at its event time — the
  // consumption side of S13's versioned build, and THE warehouse query
  // SCD2 exists for. The dimension is the user's ACTIVITY state (S13's
  // build over the non-purchase stream — building it over all events
  // would make every purchase trivially carry state 'purchase'), and the
  // lookup is LEFT: a purchase before any activity keeps null version.
  // The scalable form is J1's move, not an inequality join against
  // [eff_from, eff_to) (per-key quadratic): version-start rows and
  // purchases union into one stream keyed by entity, a carry-forward
  // window attaches the latest version at-or-before each purchase — one
  // shuffle, one sort. Version rows sort before same-ts purchases (a
  // change effective at t governs an event at t).
  def scd2Lookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = EventOps.scd2(
        Tables.events(s, dir).filter($"event_type" =!= "purchase"))
      .select($"user_id", $"eff_from".as("ts"), $"version", $"state",
        lit(0).as("tag"), lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value"))
    val facts = Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts", lit(null).cast("long").as("version"),
        lit(null).cast("string").as("state"), lit(1).as("tag"),
        $"event_id", $"value")
    // version in the sort: two versions can START at the same ts (two
    // changes at one instant — the earlier one's interval is empty); the
    // carry-forward must deterministically keep the LATEST, and facts
    // (null version) are unaffected
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"tag", $"version", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.unionByName(facts)
      .withColumn("v_at", last($"version", ignoreNulls = true).over(w))
      .withColumn("s_at", last($"state", ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"user_id", $"event_id".as("purchase_id"), $"ts",
        $"v_at".as("version"), $"s_at".as("state"), $"value")
      .orderBy($"user_id", $"ts", $"purchase_id")
  }
}
