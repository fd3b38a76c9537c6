package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications") as a typed
  * `Aggregator` — bounded-state approximate per-key counting for an OPEN
  * key domain, the batch twin of `streaming.HeavyHitters`' SpaceSaving.
  * An exact `groupBy(key).count` holds one row per distinct key (a 100 TB
  * URL/user/token stream has billions); the sketch holds `depth × width`
  * longs total, regardless of cardinality.
  *
  * Guarantees (the paper's): `estimate(k) ≥ true(k)` always (one-sided),
  * and `estimate(k) ≤ true(k) + εN` with probability ≥ 1 − (1/2)^depth
  * for width = ⌈e/ε⌉, N = total stream mass. `merge` is element-wise
  * addition — commutative and associative, so map-side partial sketches
  * combine exactly: the final sketch is identical under ANY partitioning,
  * which also makes it deterministic (unlike a sampled counter).
  *
  * Row hashing is md5-derived per depth row (the repo's deterministic
  * hash-family convention — D5b's hyperplanes, T5a's sampling draw), so
  * the sketch is a pure function of the multiset of keys.
  */
class CountMin(width: Int, depth: Int)
    extends Aggregator[String, Array[Long], Array[Long]] with Serializable {

  override def zero: Array[Long] = new Array[Long](width * depth)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    var i = 0
    while (i < depth) {
      buf(i * width + CountMin.bucket(key, i, width)) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMin {
  /** Deterministic row-`i` bucket for `key` (md5 of "i:key" → first 8
    * bytes as a long, floor-mod width). */
  private[graft] def bucket(key: String, i: Int, width: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$key".getBytes("UTF-8"))
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (md(b) & 0xffL); b += 1 }
    java.lang.Math.floorMod(h, width.toLong).toInt
  }

  /** Point estimate: the row-wise minimum over the key's buckets. */
  def estimate(sketch: Array[Long], key: String, width: Int, depth: Int): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val v = sketch(i * width + bucket(key, i, width))
      if (v < best) best = v
      i += 1
    }
    best
  }
}
