package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing entry points.
  *
  * A reference-stack user migrates by pointing graft at a scale-factor
  * dir: `Graft.registerViews` exposes every table as a temp view (so
  * plain `spark.sql` works against the same relations the operators
  * read — through `Tables`, so the ns-timestamp events fix and scan
  * widening apply), and `Graft.query` runs any driver-contract query by
  * key. Combined with `GraftExtensions` (SQL `vec_dot` + the HOF
  * rewrite rule), the whole library is reachable from SQL-only code.
  */
object Graft {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register every corpus table as a temp view named after it. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case "documents" => Tables.documents(spark, dir).createOrReplaceTempView("documents")
      case "embeddings" => Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
      case t => Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
  }

  /** Run a driver-contract query by key (the library's named surface). */
  def query(spark: SparkSession, dir: String, key: String): DataFrame =
    SparkEntry.queries.getOrElse(key,
      throw new IllegalArgumentException(
        s"unknown query '$key'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    )(spark, dir)
}
