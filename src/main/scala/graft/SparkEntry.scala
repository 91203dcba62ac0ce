package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_signals_prep" -> ((s, dir) => SignalPrep.prepared(Tables.events(s, dir))),
    "q1_pricing_summary" -> ((s, dir) => Analytics.pricingSummary(Tables.lineitem(s, dir))),
    "q3_shipping_priority" -> ((s, dir) =>
      Analytics.shippingPriority(
        Tables.customer(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q6_revenue_delta" -> ((s, dir) => Analytics.revenueDelta(Tables.lineitem(s, dir))),
    "q_top_customers_window" -> ((s, dir) =>
      Analytics.topCustomersByNation(
        Tables.customer(s, dir), Tables.orders(s, dir), Tables.nation(s, dir))),
    "q_events_sessionize" -> ((s, dir) => Analytics.sessionize(Tables.events(s, dir))),
    "q_events_tumbling_agg" -> ((s, dir) => Analytics.tumblingAgg(Tables.events(s, dir)))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_signals_prep" ->
      """SELECT user_id AS symbol, CAST(ts AS TIMESTAMP) AS ts, event_id, value AS close,
        |  CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS buy,
        |  CASE WHEN event_type='click' THEN 1 ELSE 0 END AS sell,
        |  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS price_movement
        |FROM events""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)/count(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)/count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |  JOIN customer ON o_custkey=c_custkey
        |WHERE c_mktsegment='BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15' AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY 1,2,3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q6_revenue_delta" ->
      """SELECT CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q_top_customers_window" ->
      """WITH rev AS (
        |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT n_name, c_custkey, c_name, revenue, rank FROM (
        |  SELECT n_name, c_custkey, c_name, revenue,
        |    CAST(rank() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_custkey) AS BIGINT) AS rank
        |  FROM customer JOIN rev ON c_custkey=o_custkey
        |    JOIN nation ON c_nationkey=n_nationkey) t
        |WHERE rank <= 3""".stripMargin,
    "q_events_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value FROM events),
        |flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, CAST(SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS session_value
        |FROM sess GROUP BY 1,2""".stripMargin,
    "q_events_tumbling_agg" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart, event_type,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1,2""".stripMargin
  )
}
