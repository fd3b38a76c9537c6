package graft

import org.apache.spark.sql.SparkSession

/** Focused scale-probe main: times the named `SparkEntry.queries`
  * entries (min of 2 runs each) on SPARK_GRAFT_SF_DIR and prints one
  * JSON line — the per-operator 10×/30× scaling check new operators get
  * before they are called done (SURVEY §5 discipline).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ProbeQueries q1 q2 ...
  */
object ProbeQueries {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
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
    def runOnce(name: String): Double = {
      System.err.println(s"[probe] running $name") // attributes a fatal OOM
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      finally Caches.clearAll()
      (System.nanoTime() - t0) / 1e9
    }
    runOnce(args.head) // warm-up
    val qs = args.toSeq
      .map(n => "\"" + n + f"\":${Seq.fill(2)(runOnce(n)).min}%.3f")
      .mkString("{", ",", "}")
    println(s"""{"probe":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
