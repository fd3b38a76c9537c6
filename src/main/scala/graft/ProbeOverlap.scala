package graft

import org.apache.spark.sql.SparkSession

/** J4 leg probe (r13): grid-bucketed interval join vs the rank (sweep)
  * count path at scale. The grid's candidate mass is Σ k_cell² — hour
  * cells at sf1 density put ~1326 sessions in each of 720 cells
  * (~1.27 B candidate pairs for ~30 M true overlaps); a duration-sized
  * cell cuts that to near the true pair mass; the rank path enumerates
  * no pairs at all. Interleaved reps, keep-what-preexisted cleanup.
  *
  *   SPARK_GRAFT_SF_DIR=target/sf1 dev/run_main.sh graft.ProbeOverlap [reps]
  */
object ProbeOverlap {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TemporalJoins

    val fixtures = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try { f; (System.nanoTime() - t0) / 1e9 }
      finally Caches.clearAllExcept(spark, fixtures)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // legs via GRAFT_OVERLAP_LEGS (csv of grid3600,grid120,rank):
    // hour cells at sf10 density are ~125 B candidates — a leg one
    // measures once, not something to rep blindly
    val legs = sys.env.getOrElse("GRAFT_OVERLAP_LEGS", "grid3600,grid120,rank")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val run: Map[String, () => Unit] = Map(
      "grid3600" -> (() => noop(TemporalJoins.sessionOverlap(spark, sfDir))),
      "grid120" -> (() => noop(TemporalJoins.sessionOverlap(spark, sfDir, cellSeconds = 120L))),
      "rank" -> (() => noop(TemporalJoins.sessionOverlapRank(spark, sfDir))))
    require(legs.forall(run.contains), s"unknown leg in $legs")
    timed(run(legs.last)()) // warm-up
    val rs = (1 to reps).map(_ => legs.map(l => l -> timed(run(l)())))
    def arr(ts: Seq[Double]) = ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    val out = legs.map { l =>
      val ts = rs.map(_.toMap.apply(l))
      f""""${l}_min":${ts.min}%.3f,"${l}_runs":${arr(ts)}"""
    }.mkString(",")
    println(s"""{"probe":"overlap","sf":"$sfDir",$out}""")
    spark.stop()
  }
}
