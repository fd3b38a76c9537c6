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
    // Text analysis (SURVEY §2 T1–T4)
    "t_lang_id" -> ((s, d) => TextOps.langId(s, d)),
    "t_quality_score" -> ((s, d) => TextOps.qualityScore(s, d)),
    "t_token_count" -> ((s, d) => TextOps.tokenCount(s, d)),
    "t_fingerprint" -> ((s, d) => TextOps.fingerprint(s, d)),
    // Dedup (SURVEY §2 D1–D5)
    "d_exact_dedup" -> ((s, d) => Dedup.exactDedup(s, d)),
    "d_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "d_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "d_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "d_embedding_neardup" -> ((s, d) => Dedup.embeddingNearDup(s, d)),
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
    "t_lang_id" ->
      """SELECT doc_id, en_hits, de_hits, fr_hits,
        | CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
        |      WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
        |      WHEN fr_hits > 0 THEN 'fr' ELSE 'und' END AS pred_lang, lang
        |FROM (
        | SELECT doc_id, lang,
        |  len(list_filter(string_split(lower(text),' '), w -> w IN ('the','a','of'))) AS en_hits,
        |  len(list_filter(string_split(lower(text),' '), w -> w IN ('der','die','und'))) AS de_hits,
        |  len(list_filter(string_split(lower(text),' '), w -> w IN ('le','la','et'))) AS fr_hits
        | FROM documents) t ORDER BY doc_id""".stripMargin,
    "t_quality_score" ->
      """SELECT doc_id, len_chars, n_words, n_punct, stop_hits,
        | ROUND(CAST(stop_hits AS DOUBLE)/n_words - CAST(n_punct AS DOUBLE)/len_chars
        |   + LEAST(1.0, CAST(n_words AS DOUBLE)/100.0), 4) AS quality
        |FROM (
        | SELECT doc_id, CAST(length(text) AS BIGINT) AS len_chars,
        |  CAST(len(string_split(lower(text),' ')) AS BIGINT) AS n_words,
        |  CAST(length(regexp_replace(text,'[^.,;:!?]','','g')) AS BIGINT) AS n_punct,
        |  CAST(len(list_filter(string_split(lower(text),' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS stop_hits
        | FROM documents) t ORDER BY doc_id""".stripMargin,
    "t_token_count" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(trim(text),' +')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text,'[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(list_sort(list_distinct(string_split(lower(text),' '))),' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_exact_dedup" ->
      """SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "d_minhash_lsh" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |   unnest(list_transform(range(1,len(w)-1), i -> w[i]||' '||w[i+1]||' '||w[i+2])) s
        | FROM d WHERE len(w) >= 3),
        |h AS (SELECT doc_id, CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) % 1000000007 AS hv FROM sh),
        |mh AS (SELECT doc_id, j, MIN(((2*j+1)*hv + 17*j+3) % 1000000007) AS m
        |       FROM h CROSS JOIN (SELECT unnest(range(0,16)) AS j) js GROUP BY doc_id, j),
        |bands AS (SELECT doc_id, j//4 AS band,
        |   concat_ws(',', CAST(MAX(CASE WHEN j%4=0 THEN m END) AS VARCHAR),
        |                  CAST(MAX(CASE WHEN j%4=1 THEN m END) AS VARCHAR),
        |                  CAST(MAX(CASE WHEN j%4=2 THEN m END) AS VARCHAR),
        |                  CAST(MAX(CASE WHEN j%4=3 THEN m END) AS VARCHAR)) AS sig
        | FROM mh GROUP BY doc_id, j//4)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
        |FROM bands a JOIN bands b ON a.band=b.band AND a.sig=b.sig AND a.doc_id<b.doc_id
        |GROUP BY a.doc_id, b.doc_id ORDER BY doc_a, doc_b""".stripMargin,
    "d_simhash" ->
      """WITH wd AS (SELECT doc_id, unnest(list_distinct(string_split(lower(text),' '))) wrd FROM documents),
        |h AS (SELECT doc_id, CAST(('0x'||substr(md5(wrd),1,8)) AS BIGINT) h FROM wd),
        |v AS (SELECT doc_id, i, SUM(CASE WHEN (h // (1::BIGINT << i)) % 2 = 1 THEN 1 ELSE -1 END) vote
        |      FROM h CROSS JOIN (SELECT unnest(range(0,32)) i) t GROUP BY doc_id, i),
        |fp AS (SELECT doc_id, CAST(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) fp
        |       FROM v GROUP BY doc_id),
        |bd AS (SELECT doc_id, fp, k, (fp // (1::BIGINT << CAST(8*k AS INTEGER))) % 256 bv
        |       FROM fp CROSS JOIN (SELECT unnest(range(0,4)) k) t)
        |SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b, CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) hamming
        |FROM bd a JOIN bd b ON a.k=b.k AND a.bv=b.bv AND a.doc_id<b.doc_id
        |WHERE bit_count(xor(a.fp,b.fp)) <= 4
        |ORDER BY doc_a, doc_b""".stripMargin,
    "d_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1,len(w)), i -> w[i]||' '||w[i+1])) s
        |       FROM d WHERE len(w) >= 2),
        |sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
        |pr AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) ni
        |       FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2)
        |SELECT da AS doc_a, db AS doc_b, ROUND(CAST(ni AS DOUBLE)/(sa.n+sb.n-ni),6) AS jacc
        |FROM pr JOIN sz sa ON da=sa.doc_id JOIN sz sb ON db=sb.doc_id
        |WHERE CAST(ni AS DOUBLE)/(sa.n+sb.n-ni) >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    "d_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) nrm FROM e),
        |p AS (SELECT a.vec_id va, b.vec_id vb,
        |   ROUND(list_sum(list_transform(range(1,len(a.v)+1), i -> a.v[i]*b.v[i]))/(a.nrm*b.nrm), 6) sim
        | FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT va AS vec_a, vb AS vec_b, sim FROM p WHERE sim >= 0.35 ORDER BY vec_a, vec_b""".stripMargin,
  )
}
