package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.regionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational (SURVEY §2 R1–R14)
    "q1_pricing_summary" -> ((s, d) => Relational.q1PricingSummary(s, d)),
    "q_product_search" -> ((s, d) => Relational.productSearch(s, d)),
    "q_category_search" -> ((s, d) => Relational.categorySearch(s, d)),
    "q_broad_search" -> ((s, d) => Relational.broadSearch(s, d)),
    "q_check_stock" -> ((s, d) => Relational.checkStock(s, d)),
    "q_user_orders" -> ((s, d) => Relational.userOrders(s, d)),
    "q_order_status_counts" -> ((s, d) => Relational.orderStatusCounts(s, d)),
    "q_cancel_eligible" -> ((s, d) => Relational.cancelEligible(s, d)),
    "q_top_customers" -> ((s, d) => Relational.topCustomers(s, d)),
    "q_revenue_by_category" -> ((s, d) => Relational.revenueByCategory(s, d)),
    "q_top_products" -> ((s, d) => Relational.topProducts(s, d)),
    "q_region_revenue" -> ((s, d) => Relational.regionRevenue(s, d)),
    "q_segment_stats" -> ((s, d) => Relational.segmentStats(s, d)),
    "q_order_priority_dist" -> ((s, d) => Relational.orderPriorityDist(s, d)),
  )

  /** DuckDB-dialect equivalents of `queries`, same column names (driver
    * compares after sorting columns by name). Money sums go through
    * DECIMAL(18,6) on both engines so results are bit-identical. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | COUNT(*) AS count_order,
        | ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*), 4) AS avg_qty,
        | ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*), 4) AS avg_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_product_search" ->
      """SELECT p_partkey, p_name, p_retailprice, score FROM (
        | SELECT p_partkey, p_name, p_retailprice,
        |  (CASE WHEN contains(lower(p_name),'red') THEN 1 ELSE 0 END
        |   + CASE WHEN contains(lower(p_name),'bolt') THEN 1 ELSE 0 END) AS score
        | FROM part) t WHERE score >= 1
        |ORDER BY score DESC, p_partkey LIMIT 10""".stripMargin,
    "q_category_search" ->
      """SELECT p_partkey, p_name, p_type, p_retailprice FROM part
        |WHERE contains(lower(p_type), 'small') ORDER BY p_partkey""".stripMargin,
    "q_broad_search" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_partkey LIMIT 10""".stripMargin,
    "q_check_stock" ->
      """WITH m AS (
        | SELECT p_partkey, p_name, p_size,
        |  CASE WHEN contains(lower(p_name), 'red bolt turbo') THEN 1
        |       WHEN contains(lower(p_name),'red') AND contains(lower(p_name),'bolt') THEN 2
        |       WHEN contains(lower(p_name),'red') THEN 3 END AS stage
        | FROM part)
        |SELECT stage, p_partkey, p_name, p_size*10 AS stock_qty
        |FROM m WHERE stage = (SELECT MIN(stage) FROM m WHERE stage IS NOT NULL)
        |ORDER BY p_partkey LIMIT 1""".stripMargin,
    "q_user_orders" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice,
        | l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_custkey = 42
        |ORDER BY o_orderdate DESC, o_orderkey, l_linenumber""".stripMargin,
    "q_order_status_counts" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_amount
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_cancel_eligible" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders
        |WHERE o_custkey = 42 AND o_orderstatus IN ('O','P')
        |ORDER BY o_orderkey""".stripMargin,
    "q_top_customers" ->
      """SELECT c_custkey, c_name, revenue, n_orders FROM (
        | SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |        COUNT(*) AS n_orders
        | FROM orders GROUP BY o_custkey) j JOIN customer ON o_custkey = c_custkey
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "q_revenue_by_category" ->
      """SELECT p_type,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
        | COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin,
    "q_top_products" ->
      """SELECT p_partkey, p_name, total_qty, revenue FROM (
        | SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
        |        CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        | FROM lineitem GROUP BY l_partkey) a JOIN part ON l_partkey = p_partkey
        |ORDER BY total_qty DESC, p_partkey LIMIT 10""".stripMargin,
    "q_region_revenue" ->
      """SELECT r_name,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        | JOIN customer ON o_custkey=c_custkey
        | JOIN nation ON c_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_segment_stats" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal,
        | ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*),4) AS avg_acctbal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_order_priority_dist" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  )
}
