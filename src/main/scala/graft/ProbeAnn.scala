package graft

import org.apache.spark.sql.SparkSession
import graft.operators.VectorOps

/** Scale-probe for the ANN serving split (SURVEY §5): one offline
  * `lshIndexBuild`, then per-query `lshAnnIndexed` vs the inline
  * `lshAnn` that re-derives every signature per query.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ProbeAnn
  * Prints {"build":s,"indexed_query":s,"inline_query":s,"sf":dir}.
  */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-ann-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // r15 (VERDICT r14 #6): nBuckets is env-tunable so the sf10 probe can
    // build the REALISTIC thousands-of-buckets layout where bucket
    // pruning actually bites (the 64-bucket test layout reduces pruning
    // to skipping the signature pass — VectorOps.scala's honest note)
    val nBuckets = sys.env.get("GRAFT_ANN_BUCKETS").map(_.toInt).getOrElse(64)
    val tBuild = time(VectorOps.lshIndexBuild(spark, sfDir, "lsh_sigs",
      nBuckets = nBuckets))
    Caches.clearAll()
    def q(id: Long) = time {
      VectorOps.lshAnnIndexed(spark, sfDir, "lsh_sigs", queryId = id)
        .write.format("noop").mode("overwrite").save()
    }
    q(1L) // warm-up: normed() cache + codegen
    val tIdx = Seq(q(0L), q(2L), q(3L)).min
    def qi(id: Long) = {
      val t = time {
        VectorOps.lshAnn(spark, sfDir, queryId = id)
          .write.format("noop").mode("overwrite").save()
      }
      t
    }
    val tInl = Seq(qi(0L), qi(2L), qi(3L)).min
    // r14 (VERDICT r13 #8): the recall monitor against the same table.
    // Caches cleared between reps so BOTH legs pay their full per-eval
    // cost — the shared ground-truth sim scan plus their own candidate
    // path (inline: the corpus-wide signature pass; indexed: the
    // key-pruned table read). The delta is the signature pass the
    // serving split amortizes into the offline build.
    def rec(f: => org.apache.spark.sql.DataFrame): Double = {
      Caches.clearAll(spark)
      time { f.write.format("noop").mode("overwrite").save() }
    }
    rec(VectorOps.annRecallIndexed(spark, sfDir, "lsh_sigs")) // warm-up
    val tRecIdx = Seq.fill(2)(
      rec(VectorOps.annRecallIndexed(spark, sfDir, "lsh_sigs"))).min
    val tRecInl = Seq.fill(2)(rec(VectorOps.annRecall(spark, sfDir))).min
    // record what the bucketed scan actually pruned: the executed plan's
    // SelectedBucketsCount is the proof the key list reached the FileScan
    val planStr = VectorOps.annRecallIndexed(spark, sfDir, "lsh_sigs")
      .queryExecution.executedPlan.toString
    val selected = "SelectedBucketsCount: [^)\\n]*".r
      .findFirstIn(planStr).getOrElse("SelectedBucketsCount: absent")
    println(f"""{"build":$tBuild%.3f,"indexed_query":$tIdx%.3f,"inline_query":$tInl%.3f,"recall_indexed":$tRecIdx%.3f,"recall_inline":$tRecInl%.3f,"n_buckets":$nBuckets,"bucket_pruning":"$selected","sf":"$sfDir"}""")
    spark.stop()
  }
}
