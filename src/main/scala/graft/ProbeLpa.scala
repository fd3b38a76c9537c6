package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LPA leg probe (r11): time `communitiesOf` (plain full-vote loop) vs
  * `communitiesDeltaOf` (delta-frontier loop) on the SAME corpus under
  * identical conditions, and report the per-round changed-label counts —
  * the quantity the delta leg's payoff rests on. The r10 delta design
  * assumed LPA's change rate collapses after round 2; this probe measures
  * that assumption instead of trusting it.
  *
  *   sbt "runMain graft.ProbeLpa <sfDir> [iters]"
  */
object ProbeLpa {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // per-round changed counts via the plain loop's own label frames
    // (node-sized checkpointed frames — the diff count is cheap)
    val edges = graft.operators.GraphOps.edgesUnsorted(spark, sfDir)
    val nEdges = edges.count()
    val arcs = edges.select($"src", $"dst", $"weight")
      .unionAll(edges.select($"dst".as("src"), $"src".as("dst"), $"weight"))
      .localCheckpoint(true)
    var labels = arcs.select($"src".as("v")).distinct()
      .select($"v", $"v".as("lbl")).localCheckpoint(true)
    val nNodes = labels.count()
    val changes = (1 to iters).map { _ =>
      val votes = arcs.join(labels, $"src" === $"v")
        .groupBy($"dst", $"lbl").agg(sum($"weight").as("vote"))
      val next = votes.groupBy($"dst")
        .agg(min(struct((-$"vote").as("nv"), $"lbl".as("lbl"))).as("m"))
        .select($"dst".as("v"), $"m.lbl".as("lbl")).localCheckpoint(true)
      val ch = next.as("n")
        .join(labels.select($"v", $"lbl".as("prev")), "v")
        .filter($"lbl" =!= $"prev").count()
      labels = next
      ch
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try f finally Caches.clearAll()
      (System.nanoTime() - t0) / 1e9
    }
    def reps(n: Int)(f: => Unit): Seq[Double] = Seq.fill(n)(timed(f))
    val plain = reps(2)(graft.operators.GraphOps
      .communitiesOf(graft.operators.GraphOps.edgesUnsorted(spark, sfDir), iters)
      .write.format("noop").mode("overwrite").save())
    val delta = reps(2)(graft.operators.GraphOps
      .communitiesDeltaOf(graft.operators.GraphOps.edgesUnsorted(spark, sfDir), iters)
      .write.format("noop").mode("overwrite").save())
    println(f"""{"probe":"lpa","sf":"$sfDir","nodes":$nNodes,"edges":$nEdges,""" +
      f""""changed_per_round":${changes.mkString("[", ",", "]")},""" +
      f""""plain_min":${plain.min}%.3f,"plain_runs":${plain.map(t => f"$t%.3f").mkString("[", ",", "]")},""" +
      f""""delta_min":${delta.min}%.3f,"delta_runs":${delta.map(t => f"$t%.3f").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
