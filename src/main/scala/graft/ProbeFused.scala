package graft

import org.apache.spark.sql.SparkSession
import graft.operators.GraphOps

/** Fused-pass probe (r15, VERDICT r14 #3): a session reading BOTH
  * g_reach_profile and g_harmonic_all must pay ONE sketch-growth loop.
  * Times the first entry cold (runs the fused loop) and the second in
  * the same session (memoized — should be near-zero), vs the r14 world
  * where each ran its own ~equal-cost loop.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> dev/run_main.sh graft.ProbeFused
  */
object ProbeFused {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val tFirst = time(noop(GraphOps.reachProfile(spark, sfDir)))
    val tSecond = time(noop(GraphOps.harmonicAll(spark, sfDir)))
    println(f"""{"first_reach_profile":$tFirst%.3f,"second_harmonic_memo":$tSecond%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
