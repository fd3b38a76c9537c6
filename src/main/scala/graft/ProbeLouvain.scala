package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Sweep-count probe for G24 (SURVEY §5 r15): Q after k synchronous
  * Louvain sweeps vs the G11 LPA labeling's Q on the same corpus —
  * the measurement that picked the entry's default sweep count.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ProbeLouvain
  */
object ProbeLouvain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = GraphOps.edgesUnsorted(spark, sfDir).localCheckpoint(true)
    def q(labels: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val r = GraphOps.modularityScoreOf(e, labels)
        .agg(sum(col("q_term")), count(lit(1))).first()
      (r.getDouble(0), r.getLong(1))
    }
    val (qLpa, nLpa) = q(GraphOps.communitiesOf(e, 5))
    println(f"""{"sf":"$sfDir","lpa_q":$qLpa%.6f,"lpa_communities":$nLpa""")
    (1 to 6).foreach { k =>
      val t0 = System.nanoTime()
      val (qk, nk) = q(GraphOps.louvainOf(e, k))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f""","louvain_s$k":{"q":$qk%.6f,"communities":$nk,"sec":$dt%.1f}""")
    }
    // the coarsening level's Q gain over the flat sweeps (G24b)
    val t0 = System.nanoTime()
    val (qm, nm) = q(GraphOps.louvainLevelsOf(e, 5, 2))
    val dtm = (System.nanoTime() - t0) / 1e9
    println(f""","louvain_multi_s5_l2":{"q":$qm%.6f,"communities":$nm,"sec":$dtm%.1f}}""")
    spark.stop()
  }
}
