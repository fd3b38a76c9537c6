package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 A/B: one HyperANF round's aggregation, built-in hll_union_agg vs
  * the register-max kernel, same materialized input, alternating reps
  * in one JVM. */
object ProbeHllAb {
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
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = graft.operators.GraphOps.edgesUnsorted(spark, sfDir)
    val arcs = graft.operators.GraphOps.loopArcs(edges, withWeight = false)
    // round-2-shaped input: DENSE balls (union of each node's neighborhood)
    val balls0 = graft.operators.GraphOps.partitionedCheckpoint(
      arcs.select($"src".as("v")).distinct()
        .groupBy($"v").agg(hll_sketch_agg($"v", 8).as("sk")), "v")
    val balls1 = graft.operators.GraphOps.partitionedCheckpoint(
      arcs.join(balls0.select($"v".as("src"), $"sk"), "src")
        .select($"dst".as("v"), $"sk")
        .unionAll(balls0.select($"v", $"sk"))
        .groupBy($"v").agg(graft.functions.GraftFunctions
          .hllRegMaxUnion($"sk", 8).as("sk")), "v")
    def round(myKernel: Boolean) = {
      val joined = arcs.join(balls1.select($"v".as("src"), $"sk"), "src")
        .select($"dst".as("v"), $"sk")
        .unionAll(balls1.select($"v", $"sk"))
      val agg = if (myKernel)
        joined.groupBy($"v").agg(graft.functions.GraftFunctions
          .hllRegMaxUnion($"sk", 8).as("sk"))
      else
        joined.groupBy($"v").agg(hll_union_agg($"sk").as("sk"))
      val t0 = System.nanoTime()
      agg.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    round(true); round(false) // warm both codepaths
    for (i <- 1 to 3) {
      val a = round(false); val b = round(true)
      val a2 = round(false); val b2 = round(true)
      println(f"rep$i builtin=$a%.2f/$a2%.2f s  regmax=$b%.2f/$b2%.2f s")
    }
    spark.stop()
  }
}
