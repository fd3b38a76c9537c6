package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

/** The temporal joins must equal their brute-force inequality-join
  * definitions while planning only equi-joins (the scalable forms). */
class TemporalJoinsSpec extends SparkSpecBase {

  test("as-of attribution equals the brute-force latest-view-at-or-before join") {
    val s = spark
    import s.implicits._
    val e = Tables.events(s, sfDir).filter($"event_type".isin("view", "purchase"))
      .select($"event_id", $"user_id", $"ts", $"event_type").cache()
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"event_id".as("purchase_id"), $"ts".as("pts"))
    val v = e.filter($"event_type" === "view")
      .select($"user_id".as("vu"), $"event_id".as("vid"), $"ts".as("vts"))
    // brute force: inequality join + argmax by (ts, event_id) — fine at
    // spec scale, quadratic per key at real scale (why the operator is a
    // carry-forward window instead)
    val brute = p.join(v, $"pu" === $"vu" && $"vts" <= $"pts", "left")
      .groupBy($"pu", $"purchase_id", $"pts")
      .agg(max_by(struct($"vid", $"vts"), struct($"vts", $"vid")).as("m"))
      .select($"pu".as("user_id"), $"purchase_id", $"pts".as("purchase_ts"),
        $"m.vid".as("view_id"), $"m.vts".as("view_ts"))
      .withColumn("lag_us", unix_micros($"purchase_ts") - unix_micros($"view_ts"))
      .orderBy($"user_id", $"purchase_ts", $"purchase_id")
      .collect().map(_.toString).toSeq
    val got = TemporalJoins.asofAttribution(s, sfDir)
      .collect().map(_.toString).toSeq
    assert(got == brute)
    e.unpersist()
  }

  test("promo range join equals the inequality join and plans no nested loop") {
    val s = spark
    import s.implicits._
    val promoDf = s.createDataFrame(TemporalJoins.promos)
      .toDF("promo_id", "start_s", "end_s")
      .select($"promo_id", to_timestamp($"start_s").as("start_ts"),
        to_timestamp($"end_s").as("end_ts"))
    val brute = Tables.lineitem(s, sfDir)
      .join(promoDf, $"l_shipdate" >= $"start_ts" && $"l_shipdate" < $"end_ts")
      .groupBy($"promo_id")
      .agg(count(lit(1)).as("n_lines"))
      .orderBy($"promo_id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val q = TemporalJoins.promoRangeJoin(s, sfDir)
    val got = q.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == brute)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "range join fell back to a nested loop")
    // overlap sanity: promos 3 and 4 overlap, so the same June-1997 lines
    // must count under both (a join, not a partition)
    val m = got.toMap
    assert(m(3) >= m(4) && m(4) > 0)
  }
}
