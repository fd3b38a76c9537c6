package graft

import org.apache.spark.sql.SparkSession
import graft.operators.GraphOps

/** Early-exit probe for G24 (r16, VERDICT r15 #4): at a given sweep
  * budget, how many sweeps does louvainOf actually execute before the
  * even-period cycle detector fires (fixpoints are period-2 cycles;
  * the corpus orbits a small limit cycle instead of converging), and
  * what does the exit save vs paying the whole budget? Reports executed
  * counts per budget and wall time; exit ≡ full-chain parity is
  * spec-pinned (Wave16Spec), so this probe only measures.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ProbeLouvainExit [budgets...]
  */
object ProbeLouvainExit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val budgets = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = GraphOps.edgesUnsorted(spark, sfDir).localCheckpoint(true)
    val parts = budgets.map { b =>
      val t0 = System.nanoTime()
      val (labels, executed) = GraphOps.louvainCounted(e, b)
      val n = labels.count()
      val dt = (System.nanoTime() - t0) / 1e9
      f""""budget_$b":{"executed":$executed,"nodes":$n,"sec":$dt%.1f}"""
    }
    println(s"""{"sf":"$sfDir",${parts.mkString(",")}}""")
    spark.stop()
  }
}
