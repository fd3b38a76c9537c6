package graft

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
