package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q_region_revenue", "q_user_orders", "q_revenue_by_category",
        "q_top_customers", "d_minhash_lsh", "s_sessionize",
        "g_copurchase_edges", "d_embedding_neardup", "d_embedding_neardup_lsh",
        "s_place_order", "v_lsh_ann", "v_ivf_ann")) {
      println(s"===== $q")
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      val lines = plan.split("\n")
      println(lines.filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("PushedFilters") || l.contains("Scan")).map(_.trim.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
