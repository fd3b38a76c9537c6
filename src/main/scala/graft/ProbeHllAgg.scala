package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** A/B probe (r18): is the hll_union_agg round cost dominated by
  * ObjectHashAggregate's sort-based fallback? The partial aggregation
  * falls back to sort-based aggregation after
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default
  * 128) DISTINCT GROUPS per task — the union loop has every node as a
  * group, so every per-round partial aggregation of ~2.4M sketch rows
  * (sf0.1) sorts them first. Raising the threshold keeps the partial
  * hash-based (memory bound = threshold x union-buffer size per task).
  *
  * Usage: runMain graft.ProbeHllAgg [query ...defaults to g_reach_profile]
  * Alternates A (default conf) / B (raised) twice each after a warmup.
  */
object ProbeHllAgg {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val q = if (args.nonEmpty) args(0) else "g_reach_profile"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
    })
    def run(thresh: Option[Int]): (Double, Double) = {
      thresh match {
        case Some(t) =>
          spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", t)
        case None =>
          spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      }
      taskMs.set(0L)
      val t0 = System.nanoTime()
      try SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      finally Caches.clearAll(spark)
      Thread.sleep(400)
      ((System.nanoTime() - t0) / 1e9, taskMs.get / 1e3)
    }
    run(None) // warmup
    for (i <- 1 to 2) {
      val (wa, ta) = run(None)
      val (wb, tb) = run(Some(1 << 20))
      println(f"[$q rep $i] default: wall=$wa%.2fs task=$ta%.1fs | raised(1M): wall=$wb%.2fs task=$tb%.1fs")
    }
    spark.stop()
  }
}
