package graft

import org.apache.spark.sql.functions._

/** Proves the §5 claim that runtime skew handling is real, not config
  * folklore: a pathologically skewed join must come out of AQE with its
  * hot partition split (`skew=true` on the join node). */
class AqeSkewSpec extends SparkSpecBase {
  test("AQE splits the hot partition of a skewed sort-merge join") {
    val s = spark
    import s.implicits._
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> s.conf.getOption(k)).toMap
    try {
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 50k rows on one key, a trickle elsewhere: one partition dwarfs the rest
      val fact = s.range(0, 50000).select(lit(1L).as("k"), $"id".as("payload"))
        .unionAll(s.range(0, 50).select(($"id" % 4 + 2).as("k"), $"id".as("payload")))
      val dim = Seq((1L, "hot"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")).toDF("k", "name")
      val joined = fact.join(dim, "k")
      // collect() executes THIS queryExecution, so the adaptive plan we
      // inspect below is the final one (count() would plan separately)
      assert(joined.collect().length == 50050)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not split the skew:\n$plan")
    } finally restore.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    }
  }
}

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpecBase {

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sfDir).select("l_partkey", "l_orderkey", "l_quantity")
    val p = Tables.part(spark, sfDir).select("p_partkey", "p_name")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(p, "l_partkey")
      .orderBy("l_partkey", "l_orderkey", "p_name").collect().toSeq
    val salted = SkewJoin.salted(li, p, "l_partkey", salt = 8)
      .select(plain.headOption.map(_ => li.join(p, "l_partkey").columns).getOrElse(Array[String]()).map(org.apache.spark.sql.functions.col): _*)
      .orderBy("l_partkey", "l_orderkey", "p_name").collect().toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
