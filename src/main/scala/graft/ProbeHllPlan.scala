package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 probe: the physical plan of ONE HyperANF round body — which join
  * strategy does the arcs-join-balls round use, and does it sort the
  * arc side per round? (The query-level PlanDump only shows the final
  * driver-created profile frame; the loop body plans live inside the
  * checkpoint calls.) */
object ProbeHllPlan {
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
    val balls = graft.operators.GraphOps.partitionedCheckpoint(
      arcs.select($"src".as("v")).distinct()
        .groupBy($"v").agg(hll_sketch_agg($"v", 8).as("sk")), "v")
    val nxt = arcs.join(balls.select($"v".as("src"), $"sk"), "src")
      .select($"dst".as("v"), $"sk")
      .unionAll(balls.select($"v", $"sk"))
      .groupBy($"v").agg(hll_union_agg($"sk").as("sk"))
    println("==== round body (AQE session view, pre-checkpoint) ====")
    println(nxt.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
