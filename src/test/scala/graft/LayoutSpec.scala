package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** P8 Z-order layout: shard balance, two-dimensional pruning quality,
  * Morton-key structure. */
class LayoutSpec extends SparkSpecBase {

  test("zorder: equal-depth shards, every order exactly once") {
    val s = spark
    import s.implicits._
    val z = Layout.zorderLayout(spark, sfDir).cache()
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(z.count() == nOrders)
    assert(z.select($"ok").distinct().count() == nOrders)
    val sizes = z.groupBy($"shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 16)
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: ${sizes.toSeq}")
    z.unpersist()
    Caches.clearAll()
  }

  test("zorder: shards span a bounded fraction of BOTH dims (a single-dim sort does not)") {
    val s = spark
    import s.implicits._
    val li = Tables.orders(spark, sfDir)
      .select($"o_orderkey".as("ok"),
        datediff($"o_orderdate", lit("1992-01-01")).cast("long").as("od"),
        $"o_custkey".as("ck"))
    val z = Layout.zorderLayout(spark, sfDir).select($"ok", $"shard")
    def meanSpan(assigned: org.apache.spark.sql.DataFrame, dim: String): Double = {
      val range = li.agg((max(col(dim)) - min(col(dim))).cast("double")).head.getDouble(0)
      assigned.join(li, Seq("ok"))
        .groupBy($"shard").agg(((max(col(dim)) - min(col(dim))).cast("double") / range).as("f"))
        .agg(avg($"f")).head.getDouble(0)
    }
    val zOd = meanSpan(z, "od")
    val zCk = meanSpan(z, "ck")
    // min-max pruning works on BOTH columns: each shard covers a bounded
    // slice of each dim (ideal 2D split at 16 shards = 0.25 + curve jumps)
    assert(zOd < 0.7, s"zorder od span $zOd")
    assert(zCk < 0.7, s"zorder ck span $zCk")
    // contrast: a plain date sort leaves custkey footers useless (span ~ 1)
    val byOd = li.withColumn("shard",
      ntile(16).over(org.apache.spark.sql.expressions.Window.orderBy($"od", $"ok")))
      .select($"ok", $"shard")
    val sortCk = meanSpan(byOd, "ck")
    assert(sortCk > 0.9, s"date-sorted layout unexpectedly clustered ck: $sortCk")
    assert(zCk < sortCk * 0.75)
    Caches.clearAll()
  }

  test("morton key deinterleaves back to the dim buckets") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 0L), (255L, 255L), (1L, 2L), (170L, 85L), (37L, 200L))
      .toDF("hi", "lo")
      .withColumn("z", Layout.morton($"hi", $"lo", 8))
    df.collect().foreach { r =>
      val (hi, lo, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var (h, l) = (0L, 0L)
      for (i <- 0 until 8) {
        h |= ((z >> (2 * i + 1)) & 1L) << i
        l |= ((z >> (2 * i)) & 1L) << i
      }
      assert(h == hi && l == lo, s"z=$z")
    }
  }
}
