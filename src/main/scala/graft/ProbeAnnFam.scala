package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{VecCluster, VecPQ, VectorOps}

/** r17 scratch probe: phase decomposition of v_ann_recall_family —
  * which of (sims, kmeans, pq-train, coded pass, lsh, bq, grading)
  * owns the 12-14 s / ~200 CPU-s cost at sf0.1. */
object ProbeAnnFam {
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
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm-up: full entry once
    SparkEntry.queries("v_ann_recall_family")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    Caches.clearAll(spark)
    println("[phase] ---- warm, phases now ----")

    val nQueries = 8
    val e = VectorOps.normed(spark, sfDir)
    time("normed")(e.write.format("noop").mode("overwrite").save())
    val queries = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val corpus = e.filter($"vec_id" >= nQueries)
    val sims = corpus.crossJoin(broadcast(queries))
      .withColumn("sim", round(graft.functions.GraftFunctions.vecDot($"v", $"qv") / ($"nrm" * $"qnrm"), 6))
      .select($"query_id", $"vec_id", $"sim")
    time("sims")(sims.write.format("noop").mode("overwrite").save())
    val cents = time("kmeans")(VecCluster.kmeans(corpus.select($"vec_id", $"u"), 16, 5))
    time("kmeans-2nd")(VecCluster.kmeans(corpus.select($"vec_id", $"u"), 16, 5))
    val books = time("pq-train")(VecPQ.train(corpus.select($"vec_id", $"u"), 16, 16, 3))
    time("pq-train-2nd")(VecPQ.train(corpus.select($"vec_id", $"u"), 16, 16, 3))
    val qUnit = e.filter($"vec_id" < nQueries)
      .select($"vec_id", $"u").as[(Long, Seq[Double])].collect().sortBy(_._1)
    val allTables = qUnit.map { case (_, qu) =>
      VecPQ.adcTable(qu.toArray, books).map(_.toSeq).toSeq }.toSeq
    val m = 16
    val scored = corpus
      .select($"vec_id", VecCluster.cellOf($"u", cents).as("cell"),
        VecPQ.encode($"u", books).as("codes"))
      .select($"vec_id", $"cell", $"codes",
        posexplode(typedLit(qUnit.map(_._1).toSeq)).as(Seq("qpos", "query_id")))
      .select($"vec_id", $"cell", $"query_id",
        (0 until m).map(j => element_at(element_at(element_at(
            typedLit(allTables), $"qpos" + 1), j + 1), $"codes".getItem(j) + 1))
          .reduce(_ + _).as("approx"))
    time("coded-pass")(scored.write.format("noop").mode("overwrite").save())
    // coded pass WITHOUT the adc lookup terms
    val scored2 = corpus
      .select($"vec_id", VecCluster.cellOf($"u", cents).as("cell"),
        VecPQ.encode($"u", books).as("codes"))
    time("cell+encode-only")(scored2.write.format("noop").mode("overwrite").save())
    val wadc = Window.partitionBy($"query_id").orderBy($"approx".desc, $"vec_id")
    val pqCands = scored.withColumn("rn", row_number().over(wadc))
      .filter($"rn" <= 50).select($"query_id", $"vec_id")
    time("pq-cands")(pqCands.write.format("noop").mode("overwrite").save())
    val sigs = VectorOps.bandSigs(e.select($"vec_id", $"u"), 16, 8)
      .select($"vec_id", $"k", $"bv")
    time("band-sigs")(sigs.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
