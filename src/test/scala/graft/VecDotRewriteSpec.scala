package graft

import org.apache.spark.sql.functions._
import graft.functions.VecDotRewrite

class VecDotRewriteSpec extends SparkSpecBase {

  test("optimizer rewrites aggregate(zip_with(a,b,*),0.0,+) to vec_dot") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ VecDotRewrite
    try {
      import spark.implicits._
      val df = Tables.embeddings(spark, sfDir)
        .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
        .withColumn("dot",
          aggregate(zip_with($"v", $"v", (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("vec_dot"), s"rewrite did not fire:\n$plan")
      // embeddings are unit vectors: v·v == 1
      val vals = df.select("dot").limit(20).collect().map(_.getDouble(0))
      assert(vals.forall(d => math.abs(d - 1.0) < 1e-5))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == VecDotRewrite)
    }
  }
}
