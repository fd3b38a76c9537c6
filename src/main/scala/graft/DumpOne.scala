package graft

import org.apache.spark.sql.SparkSession

/** Dump ONE contract query's result as parquet — the single-query twin
  * of Verify for iterating on a new oracle without paying the full
  * 168-entry drive.
  *
  *   sbt "runMain graft.DumpOne <query> <sfDir> <outDir>"
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: DumpOne <query> <sfDir> <outDir>"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(2).getOrElse("/tmp/dumpone")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    // the query's oracle SQL too (r16), so one DuckDB call closes the loop
    SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_oracle.sql"),
        sql.getBytes("UTF-8"))
    }
    println(s"[dumpone] $name $sfDir -> $outDir/$name.parquet")
    spark.stop()
  }
}
