package graft

import org.apache.spark.sql.functions.{col, var_samp}

class WelfordVarSpec extends SparkSpecBase {
  test("typed Welford aggregator matches var_samp, survives a shifted mean") {
    val s = spark
    import s.implicits._
    // offset 1e9 makes naive sum-of-squares cancel; Welford must not care
    val xs = (1 to 5000).map(i => 1e9 + (i % 37) * 0.25)
    val ds = xs.toDF("x").repartition(7).as[Double]
    val got = ds.select(graft.functions.WelfordVar.toColumn).collect()(0)
    // ground truth from the unshifted values (no cancellation possible):
    // variance is shift-invariant
    val small = xs.map(_ - 1e9)
    val mean = small.sum / small.length
    val exact = small.map(v => (v - mean) * (v - mean)).sum / (small.length - 1)
    assert(math.abs(got - exact) / exact < 1e-8, s"welford $got vs exact $exact")
    val builtin = xs.toDF("x").agg(var_samp(col("x"))).collect()(0).getDouble(0)
    assert(math.abs(builtin - exact) / exact < 1e-6) // var_samp drifts more
    assert(math.abs(got - exact) <= math.abs(builtin - exact),
      "welford must be at least as accurate as the builtin under mean shift")
  }
}

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
