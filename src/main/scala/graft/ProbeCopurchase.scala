package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** g_copurchase_edges residue probe (r13, §5 r12 watch item): the sf10
  * reading sits 1.4-1.7× over the r8 record with a wide rep band on
  * dual-quiet hosts, attributed to GC band on the pair-expansion's
  * allocation profile. This A/Bs the shipped plan against a
  * lower-allocation variant, interleaved reps, plus the stage-1
  * aggregation alone to locate the cost split:
  *
  *  - `agg1`: groupBy(ok).collect_set alone (the ObjectHashAggregate
  *    stage) — everything above it is the pair stage's own cost.
  *  - `struct`: the shipped plan — sorted set → in-row pair expansion
  *    into an ARRAY OF STRUCTS → explode → groupBy(src, dst).
  *  - `packed`: same expansion but each pair packed into ONE BIGINT
  *    (src<<32 | dst) — the transform emits a primitive long array
  *    (no per-element InternalRow), the shuffle key is a single long,
  *    and src/dst are unpacked AFTER the count. Requires part keys
  *    < 2^32 (holds to TPC-H sf ~400k; the probe asserts it).
  *
  *   SPARK_GRAFT_SF_DIR=target/sf1 sbt "runMain graft.ProbeCopurchase"
  */
object ProbeCopurchase {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def sets: DataFrame = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
      .groupBy($"ok").agg(sort_array(collect_set($"pk")).as("pks"))

    def structPlan: DataFrame = sets
      .select(explode(expr(
        "flatten(transform(pks, (x, i) -> " +
        "transform(slice(pks, i + 2, size(pks) - i - 1), " +
        "y -> struct(x AS src, y AS dst))))")).as("e"))
      .select($"e.src", $"e.dst")
      .groupBy($"src", $"dst")
      .agg(count(lit(1)).as("weight"))

    def packedPlan: DataFrame = sets
      .select(explode(expr(
        "flatten(transform(pks, (x, i) -> " +
        "transform(slice(pks, i + 2, size(pks) - i - 1), " +
        "y -> x * 4294967296L + y)))")).as("p"))
      .groupBy($"p").agg(count(lit(1)).as("weight"))
      .select(shiftrightunsigned($"p", 32).as("src"),
        ($"p".bitwiseAND(lit(4294967295L))).as("dst"), $"weight")

    // key-bound check for the packed form
    val maxPk = Tables.lineitem(spark, sfDir).agg(max($"l_partkey")).as[Long].first()
    require(maxPk < (1L << 32), s"packed form needs pk < 2^32, got $maxPk")
    // identical relations (sorted-set expansion already yields src < dst)
    val diff = structPlan.unionAll(packedPlan)
      .groupBy($"src", $"dst", $"weight").agg(count(lit(1)).as("n"))
      .filter($"n" =!= 2).count()
    require(diff == 0, s"packed relation differs from struct: $diff rows")

    val fixtures = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try { f; (System.nanoTime() - t0) / 1e9 }
      finally Caches.clearAllExcept(spark, fixtures)
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    timed(noop(structPlan)); timed(noop(packedPlan)) // warm-up
    val rs = (1 to reps).map { _ =>
      (timed(noop(sets)), timed(noop(structPlan)), timed(noop(packedPlan)))
    }
    def arr(ts: Seq[Double]) = ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    println(f"""{"probe":"copurchase","sf":"$sfDir","max_pk":$maxPk,""" +
      f""""agg1_min":${rs.map(_._1).min}%.3f,"agg1_runs":${arr(rs.map(_._1))},""" +
      f""""struct_min":${rs.map(_._2).min}%.3f,"struct_runs":${arr(rs.map(_._2))},""" +
      f""""packed_min":${rs.map(_._3).min}%.3f,"packed_runs":${arr(rs.map(_._3))}}""")
    spark.stop()
  }
}
