package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run ONE contract query end-to-end through the noop sink
  * and print its wall time — `sbt "runMain graft.RunOne <name> [sfDir]"`.
  * Used for targeted scale probes (e.g. the sf1 node-similarity guard)
  * without paying for a full Bench sweep.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: RunOne <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[runone] $name $sfDir $dt%.2f s")
    spark.stop()
  }
}
