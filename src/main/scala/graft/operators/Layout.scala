package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * step behind `OPTIMIZE ... ZORDER BY` in lakehouse engines: interleave
  * the bits of each dimension's RANK (rank, not raw value — ranks are
  * skew-immune) so rows close in ANY dimension land in the same shard,
  * and min-max footer stats prune scans on BOTH columns. A single-column
  * sort gives perfect pruning on one dim and none on the other; the
  * Z-curve pays a bounded factor on each dim instead (shard spans ~1/4 of
  * each dim's range at 16 shards in 2D vs 1.0 for the unsorted dim).
  *
  * Every stage is engine-replayable: ranks are total-order ROW_NUMBERs
  * (computed scale-safely via [[Ranking.rowNumberWithin]] — a global
  * window would funnel the corpus through one task), bucket = exact
  * integer (rank-1)·2^bits div N, the interleave is integer bit
  * arithmetic, and shards are equal-depth cuts of the z rank. Three
  * range shuffles total — the same cost profile as the sort a zorder
  * rewrite pays in any engine.
  */
object Layout {

  private def bitAt(c: Column, i: Int): Column =
    shiftright(c, i).bitwiseAND(lit(1L))

  /** Interleave the low `bits` bits of `hi` (odd positions) and `lo`
    * (even positions) into one Morton key. */
  private[graft] def morton(hi: Column, lo: Column, bits: Int): Column =
    (0 until bits).map { i =>
      bitAt(hi, i) * lit(1L << (2 * i + 1)) + bitAt(lo, i) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** P8 — Z-order layout of orders by (order date, customer key): the two
    * columns dashboard queries actually filter on (date ranges + per-
    * customer lookups). Output: one row per order with its Morton key and
    * target shard; `shard` is an equal-depth cut of the z rank (what a
    * layout writer would `repartitionByRange` on before writing files).
    * (lineitem would be the bigger win but the synthetic generator does
    * not keep (l_orderkey, l_linenumber) unique — layout needs a real
    * row key.) */
  def zorderLayout(s: SparkSession, dir: String,
      bits: Int = 8, nShards: Int = 16): DataFrame = {
    import s.implicits._
    val l = Tables.orders(s, dir)
      .select($"o_orderkey".as("ok"), $"o_orderdate".as("od"),
        $"o_custkey".as("ck"))
      .withColumn("g", lit("all"))
    val n = l.agg(count(lit(1)).as("n"))
    val w = 1L << bits
    // per-dim global rank -> equal-depth bucket in [0, 2^bits)
    val rd = Ranking.rowNumberWithin(l, "g", Seq($"od", $"ok"),
        "rd", s"zorder-od:$dir")
      .select($"ok", $"rd")
    val rp = Ranking.rowNumberWithin(l, "g", Seq($"ck", $"ok"),
        "rp", s"zorder-ck:$dir")
      .select($"ok".as("ok2"), $"rp")
    val z = rd.join(rp, $"ok" === $"ok2")
      .crossJoin(broadcast(n))
      .select($"ok", $"n", morton(
        expr(s"(rd - 1) * $w div n"), expr(s"(rp - 1) * $w div n"), bits).as("z"))
      .withColumn("g", lit("all"))
    // equal-depth shard cut along the curve = the file-write partitioning
    Ranking.rowNumberWithin(z, "g", Seq($"z", $"ok"),
        "zr", s"zorder-z:$dir")
      .select($"ok", $"z", expr(s"(zr - 1) * $nShards div n").as("shard"))
      .orderBy($"ok")
  }
}
