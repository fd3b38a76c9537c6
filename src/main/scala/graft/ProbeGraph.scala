package graft

import org.apache.spark.sql.SparkSession
import graft.operators.GraphOps

/** Scale-probe main for the graph leg (SURVEY §5): times GraphX
  * staticPageRank against the checkpointed-DataFrame fixpoint
  * (`GraphOps.pageRankDF`) on the same co-purchase edge frame, so the
  * documented "DF iteration is the fallback when GraphX runs out of
  * memory" claim carries a measured number at every probed SF.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ProbeGraph [iters] [mode]
  * mode ∈ {both, graphx, df} — df-only exists to test the fallback in a
  * deliberately small heap where GraphX itself would OOM first — or
  * {tri, tri-graphx, tri-df} to time the G7 triangle legs, or
  * {sp, sp-graphx, sp-df} for the G8 landmark-BFS legs (r8), or
  * {lpa, lpa-graphx, lpa-df} / {hits, hits-graphx, hits-df} to time the
  * G11/G17 aggregateMessages-vs-checkpointed-DF legs (r9; iters = LPA
  * rounds / HITS rounds there).
  * Prints one JSON line {"graphx":s,"df":s,"iters":n,"sf":dir}.
  */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = if (args.nonEmpty) args(0).toInt else 10
    val mode = if (args.length > 1) args(1) else "both"
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
    val edges = GraphOps.edgesUnsorted(spark, sfDir)
    // warm the edge build once so both timings measure iteration, not scan
    edges.write.format("noop").mode("overwrite").save()
    val tri = mode.startsWith("tri")
    val sp = mode.startsWith("sp")
    val lpa = mode.startsWith("lpa")
    val hits = mode.startsWith("hits")
    def hitsEd = { // the bipartite purchase arcs, built once per leg
      import spark.implicits._
      Tables.orders(spark, sfDir).select($"o_custkey".as("u"), $"o_orderkey")
        .join(Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_partkey".as("p")),
          $"o_orderkey" === $"l_orderkey")
        .select($"u", $"p").distinct()
    }
    val tGx = if (mode.endsWith("-df") || mode == "df") -1.0 else time {
      (if (tri) GraphOps.triangleCountGraphX(edges)
       else if (sp) GraphOps.shortestPathsOf(edges, nLandmarks = 3)
       else if (lpa) GraphOps.communitiesGX(edges, iters)
       else if (hits) GraphOps.hitsGX(hitsEd, iters)
       else GraphOps.pageRankOf(edges, iters))
        .write.format("noop").mode("overwrite").save()
    }
    Caches.clearAll()
    val tDf = if (mode.endsWith("-graphx") || mode == "graphx") -1.0 else time {
      (if (tri) GraphOps.triangleCountDF(edges, Some(s"probe-tri:$sfDir"))
       else if (sp) GraphOps.shortestPathsDF(edges, nLandmarks = 3)
       else if (lpa) GraphOps.communitiesOf(edges, iters)
       else if (hits) GraphOps.hitsOf(hitsEd, iters)
       else GraphOps.pageRankDF(edges, iters))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"""{"graphx":$tGx%.3f,"df":$tDf%.3f,"iters":$iters,"sf":"$sfDir"}""")
    spark.stop()
  }
}
