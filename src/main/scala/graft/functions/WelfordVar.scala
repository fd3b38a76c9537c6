package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Numerically stable sample variance as a typed `Aggregator` — the
  * custom-aggregation extension point (north-star preference (b):
  * a TypedColumn agg function) demonstrated on the classic case where
  * naive sum-of-squares cancels catastrophically for large means.
  *
  * State is the Chan/Welford triple (count, mean, M2); `merge` is the
  * pairwise-combine form, so partial aggregation (map-side combine) is
  * exact and order-stable to ~1 ulp — safe at any partitioning.
  */
object WelfordVar extends Aggregator[Double, (Long, Double, Double), Double] {

  override def zero: (Long, Double, Double) = (0L, 0.0, 0.0)

  override def reduce(b: (Long, Double, Double), x: Double): (Long, Double, Double) = {
    val (n, mean, m2) = b
    val n1 = n + 1
    val d = x - mean
    val mean1 = mean + d / n1
    (n1, mean1, m2 + d * (x - mean1))
  }

  override def merge(a: (Long, Double, Double), b: (Long, Double, Double)): (Long, Double, Double) = {
    val (na, ma, m2a) = a
    val (nb, mb, m2b) = b
    if (na == 0) b
    else if (nb == 0) a
    else {
      val n = na + nb
      val d = mb - ma
      (n, ma + d * nb / n, m2a + m2b + d * d * na * nb / n)
    }
  }

  override def finish(r: (Long, Double, Double)): Double =
    if (r._1 < 2) Double.NaN else r._3 / (r._1 - 1)

  override def bufferEncoder: Encoder[(Long, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
