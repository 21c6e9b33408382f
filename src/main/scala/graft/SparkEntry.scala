package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q2LookupJoin(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) => Relational.q1Agg(Tables(s, dir))),
    "q2_lookup_join" -> ((s, dir) => Relational.q2LookupJoin(Tables(s, dir))),
    "q3_topk_pergroup" -> ((s, dir) => Relational.q3TopkPerGroup(Tables(s, dir))),
    "q4_upsert" -> ((s, dir) => Relational.q4Upsert(Tables(s, dir))),
    "q5_anti_insert" -> ((s, dir) => Relational.q5AntiInsert(Tables(s, dir))),
    "q6_standings" -> ((s, dir) => Relational.q6Standings(Tables(s, dir))),
    "q7_running_total" -> ((s, dir) => Relational.q7RunningTotal(Tables(s, dir))),
    "q8_time_parse" -> ((s, dir) => Relational.q8TimeParse(Tables(s, dir))),
    "q9_incremental" -> ((s, dir) => Relational.q9Incremental(Tables(s, dir))),
    "q10_sanitize" -> ((s, dir) => Relational.q10Sanitize(Tables(s, dir))),
    "q11_sync_stats" -> ((s, dir) => Relational.q11SyncStats(Tables(s, dir))),
    "q12_pivot" -> ((s, dir) => Relational.q12Pivot(Tables(s, dir), EventTypes)),
    "q13_order_revenue" -> ((s, dir) => Relational.q13OrderRevenue(Tables(s, dir))),
  )

  /** DuckDB-equivalent SQL per query key; the driver hash-compares results
    * (columns sorted by name), so aliases here match the Spark side
    * exactly, money sums go through DECIMAL for order-independence, and
    * integer aggregates are cast to BIGINT (DuckDB SUM(int) is HUGEINT).
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_lookup_join" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q3_topk_pergroup" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders) x
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q4_upsert" ->
      """SELECT user_id, event_type, event_id AS last_event_id, value AS last_value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) x
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "q5_anti_insert" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q6_standings" ->
      """SELECT s_suppkey, s_name, points, win_count,
        |  CAST(ROW_NUMBER() OVER (ORDER BY points DESC, s_suppkey) AS INT) AS position
        |FROM (
        |  SELECT s_suppkey, s_name,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS points,
        |    COUNT(DISTINCT l_orderkey) AS win_count
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY s_suppkey, s_name) x
        |ORDER BY position""".stripMargin,
    "q7_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q8_time_parse" ->
      """SELECT l_orderkey, l_linenumber,
        |  printf('%d:%06.3f', l_linenumber, l_quantity % 60) AS time_str,
        |  CAST(FLOOR((l_linenumber * 60 +
        |    CAST(string_split(printf('%d:%06.3f', l_linenumber, l_quantity % 60), ':')[2] AS DOUBLE)
        |  ) * 1000) AS BIGINT) AS time_ms
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q9_incremental" ->
      """SELECT user_id,
        |  COUNT(*) AS n_new,
        |  MIN(event_id) AS first_new_event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS new_value_total
        |FROM events e
        |WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
        |  AND EXISTS (SELECT 1 FROM events o
        |              WHERE o.ts <= TIMESTAMP '2024-01-15 00:00:00'
        |                AND o.user_id = e.user_id)
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q10_sanitize" ->
      """SELECT p_partkey,
        |  CAST(LEAST(GREATEST(p_size, 5), 20) AS INT) AS size_clamped,
        |  UPPER(TRIM(p_brand)) AS brand_norm,
        |  COALESCE(NULLIF(TRIM(p_type), ''), 'unknown') AS type_norm,
        |  CAST(ROUND(p_retailprice, 0) AS BIGINT) AS price_rounded
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q11_sync_stats" ->
      """SELECT event_type, n, total_value, n_users,
        |  ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS share
        |FROM (
        |  SELECT event_type,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |    COUNT(DISTINCT user_id) AS n_users
        |  FROM events GROUP BY event_type) x
        |ORDER BY event_type""".stripMargin,
    "q12_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q13_order_revenue" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
  )
}
