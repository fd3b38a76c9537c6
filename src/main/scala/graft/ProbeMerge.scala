package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sinks.TableWriter

/** Scale probe for TableWriter.mergeInto (VERDICT r10 #5): table ≫ delta,
  * delta touching k of N partitions. Times the DEFAULT path (which pays a
  * column-pruned keyed semi-join over the full table to find the
  * partitions hosting the delta's keys — the Delta/Iceberg matching-scan
  * price) against `assumeStablePartitionKeys` (which skips that scan and
  * trusts the delta's own partition values). Both paths then rewrite the
  * same k-partition footprint, so the measured gap IS the host-partition
  * scan's cost at this table:delta ratio.
  *
  *   sbt "runMain graft.ProbeMerge [rows] [nParts] [deltaRows] [kParts]"
  *
  * The delta is key-stable (cat is a pure function of pk), so both paths
  * produce identical tables and re-merging is idempotent — each timed
  * merge rewrites the same k partitions with the same bytes, making the
  * comparison same-work by construction.
  */
object ProbeMerge {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val nParts = args.lift(1).map(_.toInt).getOrElse(50)
    val deltaRows = args.lift(2).map(_.toLong).getOrElse(100000L)
    val kParts = args.lift(3).map(_.toInt).getOrElse(5)
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

    val path = java.nio.file.Files.createTempDirectory("probemerge").toString + "/t"
    spark.range(rows)
      .select($"id".as("pk"), concat(lit("name-"), $"id").as("name"),
        ($"id" % nParts).cast("int").as("cat"))
      .write.partitionBy("cat").parquet(path)
    // delta keys live in partitions 0..kParts-1 and keep their partition
    // (cat = pk % nParts by construction): pk = (i / k) * N + (i % k)
    val delta = spark.range(deltaRows)
      .select((($"id" / kParts).cast("long") * nParts + $"id" % kParts).as("pk"))
      .select($"pk", concat(lit("updated-"), $"pk").as("name"),
        ($"pk" % nParts).cast("int").as("cat"))
      .localCheckpoint(true)

    // r12 (ADVICE r11, low): each mergeInto leaves its `merged`
    // localCheckpoint persisted; un-persisting between reps (outside the
    // timed span) keeps accumulated storage pressure out of the later
    // timings. KEEP-WHAT-PREEXISTED semantics (the ProbeLpa discipline):
    // the `delta` fixture above is itself a localCheckpoint reused by
    // every rep — a blanket unpersist severs its lineage and the next
    // merge dies with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
    val fixtures = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try { f; (System.nanoTime() - t0) / 1e9 }
      finally Caches.clearAllExcept(spark, fixtures, blocking = true)
    }
    // warm-up merge (untimed): page cache, codegen, committer paths
    TableWriter.mergeInto(spark, path, delta, Seq("pk"), "cat")
    // r12 (ADVICE r11, low): INTERLEAVED default/stable reps — running
    // the three default merges as a block before the three stable ones
    // let page-cache and storage state drift bias the second block; the
    // a/b/a/b ordering puts both paths under the same ambient state
    val pairs = Seq.fill(3)((
      timed(TableWriter.mergeInto(spark, path, delta, Seq("pk"), "cat")),
      timed(TableWriter.mergeInto(spark, path, delta, Seq("pk"), "cat",
        assumeStablePartitionKeys = true))))
    val defSecs = pairs.map(_._1)
    val stableSecs = pairs.map(_._2)
    val n = spark.read.parquet(path).count()
    assert(n == rows, s"merge changed row count: $n != $rows")
    println(f"""{"probe":"mergeInto","rows":$rows,"nParts":$nParts,""" +
      f""""deltaRows":$deltaRows,"kParts":$kParts,""" +
      f""""default_min":${defSecs.min}%.3f,"default_runs":${defSecs.map(t => f"$t%.3f").mkString("[", ",", "]")},""" +
      f""""stable_min":${stableSecs.min}%.3f,"stable_runs":${stableSecs.map(t => f"$t%.3f").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
