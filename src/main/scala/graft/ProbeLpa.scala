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
  * r12 (VERDICT r11 #2): a WARM-START leg — the regime the delta twin is
  * actually built for. Run the plain loop `warmIters` rounds to
  * near-convergence, perturb the graph (drop a deterministic ~1% of
  * edges), then A/B plain-vs-delta for `iters` MORE rounds seeded with
  * the warm labels. The delta leg pays one full vote (round 1, changed
  * unknown) and then re-votes only the perturbation's cascade; the plain
  * leg pays a full vote every round. Reps are INTERLEAVED
  * plain/delta/plain/delta (ADVICE r11: back-to-back blocks let storage
  * and page-cache state bias the second block).
  *
  *   sbt "runMain graft.ProbeLpa <sfDir> [iters] [warmIters]"
  */
object ProbeLpa {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val warmIters = args.lift(2).map(_.toInt).getOrElse(10)
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
      // keep only the current round's checkpoint (r13, ADVICE r12): the
      // superseded label frames otherwise stay persisted through the
      // timed ab() legs below — timed()'s keep-set protects whatever
      // preexists it, so the trace must clean up after itself
      labels.unpersist(blocking = false)
      labels = next
      ch
    }
    labels.unpersist(blocking = false) // final trace frame, never read again
    arcs.unpersist(blocking = false)   // trace-only arc fixture

    // Per-rep cleanup with KEEP-WHAT-PREEXISTED semantics (r12): the
    // loops localCheckpoint their label frames each round and nothing
    // unpersisted them between reps — leaked checkpoints accumulate heap
    // pressure across reps (the g_pagerank degradation class). A blanket
    // clearAll(spark) would ALSO sever the probe's own cross-rep
    // fixtures (warmLabels/perturbed below — unpersisting a local
    // checkpoint makes the frame unrecomputable), so each rep drops only
    // the RDDs IT created.
    def timed(f: => Unit): Double = {
      val keep = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val t0 = System.nanoTime()
      try f finally Caches.clearAllExcept(spark, keep)
      (System.nanoTime() - t0) / 1e9
    }
    // interleaved reps (ADVICE r11): a/b/a/b, not aa/bb
    def ab(n: Int)(a: => Unit)(b: => Unit): (Seq[Double], Seq[Double]) = {
      val ts = (0 until n).map(_ => (timed(a), timed(b)))
      (ts.map(_._1), ts.map(_._2))
    }
    val (plain, delta) = ab(2)(graft.operators.GraphOps
      .communitiesOf(graft.operators.GraphOps.edgesUnsorted(spark, sfDir), iters)
      .write.format("noop").mode("overwrite").save())(graft.operators.GraphOps
      .communitiesDeltaOf(graft.operators.GraphOps.edgesUnsorted(spark, sfDir), iters)
      .write.format("noop").mode("overwrite").save())

    // ---- warm-start leg: near-converged labels + 1% edge perturbation ----
    val warmLabels = graft.operators.GraphOps
      .communitiesOf(graft.operators.GraphOps.edgesUnsorted(spark, sfDir), warmIters)
      .localCheckpoint(true)
    // deterministic ~1% edge drop: the incremental-update event
    val perturbed = graft.operators.GraphOps.edgesUnsorted(spark, sfDir)
      .filter(pmod(hash($"src", $"dst"), lit(100)) =!= 0)
      .localCheckpoint(true)
    val nPerturbed = perturbed.count()
    // changed-per-round trace of the warm regime (plain loop arithmetic)
    val warcs = perturbed.select($"src", $"dst", $"weight")
      .unionAll(perturbed.select($"dst".as("src"), $"src".as("dst"), $"weight"))
      .localCheckpoint(true)
    var wl = warcs.select($"src".as("v")).distinct()
      .join(warmLabels.select($"v", $"lbl".as("wlbl")), Seq("v"), "left")
      .select($"v", coalesce($"wlbl", $"v").as("lbl")).localCheckpoint(true)
    val warmChanges = (1 to iters).map { _ =>
      val votes = warcs.join(wl, $"src" === $"v")
        .groupBy($"dst", $"lbl").agg(sum($"weight").as("vote"))
      val next = votes.groupBy($"dst")
        .agg(min(struct((-$"vote").as("nv"), $"lbl".as("lbl"))).as("m"))
        .select($"dst".as("v"), $"m.lbl".as("lbl")).localCheckpoint(true)
      val ch = next.as("n")
        .join(wl.select($"v", $"lbl".as("prev")), "v")
        .filter($"lbl" =!= $"prev").count()
      wl.unpersist(blocking = false) // same trace-leak discipline as above
      wl = next
      ch
    }
    wl.unpersist(blocking = false)    // final warm trace frame
    warcs.unpersist(blocking = false) // trace-only; the ab legs use `perturbed`
    val (wplain, wdelta) = ab(2)(graft.operators.GraphOps
      .communitiesOf(perturbed, iters, Some(warmLabels))
      .write.format("noop").mode("overwrite").save())(graft.operators.GraphOps
      .communitiesDeltaOf(perturbed, iters, initialLabels = Some(warmLabels))
      .write.format("noop").mode("overwrite").save())

    def arr(ts: Seq[Double]) = ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    println(f"""{"probe":"lpa","sf":"$sfDir","nodes":$nNodes,"edges":$nEdges,""" +
      f""""changed_per_round":${changes.mkString("[", ",", "]")},""" +
      f""""plain_min":${plain.min}%.3f,"plain_runs":${arr(plain)},""" +
      f""""delta_min":${delta.min}%.3f,"delta_runs":${arr(delta)},""" +
      f""""warm_iters":$warmIters,"perturbed_edges":$nPerturbed,""" +
      f""""warm_changed_per_round":${warmChanges.mkString("[", ",", "]")},""" +
      f""""warm_plain_min":${wplain.min}%.3f,"warm_plain_runs":${arr(wplain)},""" +
      f""""warm_delta_min":${wdelta.min}%.3f,"warm_delta_runs":${arr(wdelta)}}""")
    spark.stop()
  }
}
