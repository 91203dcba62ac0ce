package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General analytics operators: scan-heavy aggregation, multi-way joins,
  * window ranking, sessionization, tumbling-window aggregation.
  *
  * These exercise the engine's generic query surface and serve as the
  * benchmark headliners. Numeric discipline: per-row arithmetic stays in
  * doubles (bit-identical across engines), while SUMs quantize to 1e-6
  * units and accumulate exactly, so the result is independent of
  * aggregation order — at 100 TB a double sum's value depends on
  * partitioning, which would make results non-reproducible run to run.
  */
object Analytics {

  /** Exact, order-independent, engine-agnostic sum of a double
    * expression at 1e-6 (price-scale) resolution — see [[ExactNum]].
    */
  private def dsum(c: Column): Column = ExactNum.sumExact(c, 1e6)

  /** Pricing summary aggregate (TPC-H Q1 shape): single scan, map-side
    * partial aggregation, tiny result. Filter + 7 needed columns reach
    * the parquet scan (pushdown + pruning).
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order")
      )

  /** Shipping-priority top-N (TPC-H Q3 shape): two selective joins then
    * agg + top-k. NO broadcast hints: the date filter keeps ~half of
    * orders and the segment filter ~1/5 of customer — fact-sized sides
    * at scale, where a forced broadcast hard-fails at Spark's 8 GB
    * broadcast ceiling instead of degrading to a shuffle join. AQE
    * broadcasts them anyway whenever the filtered sides actually fit —
    * size-based at runtime, which is the decision this join needs.
    * Unique-key tiebreak (o_orderkey) makes the top-10 deterministic.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cutoff = lit("1995-03-15").cast("timestamp")
    val c = customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = orders.filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = lineitem.filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Selective filter + global aggregate (TPC-H Q6 shape): the pushdown
    * showcase — every predicate is a parquet-level filter, projection is
    * two columns, result is one row.
    */
  def revenueDelta(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(
        col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24
      )
      .agg(
        dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items")
      )

  /** Order revenue per priority class over the full orders⋈lineitem
    * fact⋈fact join — the query shape where bucketing pays. The merge
    * hint pins a sort-merge join on both callers: fed plain parquet both
    * sides shuffle on the order key (the 100 TB worst case); fed
    * [[graft.sources.BucketedTables]] copies, the bucketed scans already
    * satisfy the join's distribution and the ONLY exchange left is the
    * tiny 5-row priority rollup (asserted in BucketedJoinSpec). Same
    * results either way — layout changes the plan, not the answer.
    */
  def orderRevenueByPriority(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.hint("merge")
      .join(lineitem.hint("merge"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Top-3 customers by order revenue within each nation: broadcast the
    * 25-row nation dim, aggregate orders per customer (shuffle on
    * custkey), then a nation-partitioned rank window. Unique-key
    * tiebreak for determinism.
    */
  def topCustomersByNation(customer: DataFrame, orders: DataFrame, nation: DataFrame): DataFrame = {
    val rev = orders.groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("revenue").desc, col("c_custkey"))
    customer.join(rev, col("c_custkey") === col("o_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_name"), col("revenue"))
      .withColumn("rank", rank().over(w).cast("bigint"))
      .filter(col("rank") <= 3)
  }

  /** Exact value percentiles per event type. Exact `percentile`
    * materializes and sorts EVERY group's values inside one final-agg
    * task — parallelism is the grouping-key cardinality, so 5 event
    * types means 5 working tasks no matter how many executors exist,
    * and a single group's values must fit one task's heap. That is the
    * wrong shape the moment rows/group reaches the tens of millions;
    * [[percentilesApprox]] is the 100 TB path (its sketch is
    * partial-aggregable, so it map-side combines and never concentrates
    * raw values), and [[percentilesAuto]] encodes the routing decision.
    * Interpolation (continuous quantile) matches DuckDB's quantile_cont
    * definition.
    */
  def percentiles(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      expr("percentile(value, 0.5)").as("p50"),
      expr("percentile(value, 0.95)").as("p95"),
      expr("percentile(value, 0.99)").as("p99"))

  /** The 100 TB percentile path: approx_percentile's sketch combines
    * map-side, so no task ever holds a group's raw values. Accuracy is
    * spec'd against [[percentiles]] (PercentileSpec), not oracled —
    * the sketch is engine-specific by construction.
    */
  def percentilesApprox(events: DataFrame, accuracy: Int = 10000): DataFrame =
    events.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      expr(s"approx_percentile(value, 0.5, $accuracy)").as("p50"),
      expr(s"approx_percentile(value, 0.95, $accuracy)").as("p95"),
      expr(s"approx_percentile(value, 0.99, $accuracy)").as("p99"))

  /** The grouped-scale guard: route to [[percentiles]] while every
    * group's value set comfortably fits one task, else to
    * [[percentilesApprox]]. The probe (row count + approx group count)
    * is one cheap partial-aggregated job — noise next to the per-group
    * sort the exact path would run, and the honest alternative to
    * letting a low-cardinality groupBy concentrate a 100 TB column into
    * a handful of tasks. Callers that know their shape statically
    * should call the specific operator; this exists so a generic
    * entry point cannot pick the non-scaling plan by default.
    */
  def percentilesAuto(events: DataFrame, maxExactRowsPerGroup: Long = 10000000L): DataFrame = {
    // probe the LARGEST group, not the mean: a skewed distribution (one
    // hot group + many rare ones) keeps n/g small while the hot group
    // alone would blow the exact path's one-task-per-group sort. Still
    // one cheap job — the per-group counts partial-aggregate map-side.
    val probe = events.groupBy(col("event_type")).agg(count(lit(1)).as("gn"))
      .agg(max(col("gn"))).head()
    val maxGroup = if (probe.isNullAt(0)) 0L else probe.getLong(0)
    if (maxGroup > maxExactRowsPerGroup) percentilesApprox(events)
    else percentiles(events)
  }

  /** Salted-join headline: events joined back to a per-user activity
    * dim through [[SkewJoin.salted]], then rolled up per event type.
    * The merge hint forces the shuffle-join path the salt exists for
    * (a broadcastable dim needs no salt; at 100 TB user dims aren't).
    * Result is salt-invariant, so the oracle is the plain USING join.
    */
  def saltedEventRollup(events: DataFrame, saltFactor: Int = 8): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"), col("value"))
    val dim = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    SkewJoin.salted(e, dim.hint("merge"), Seq("user_id"), saltFactor)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("value") * col("n_events")).as("weighted_value"))
  }

  /** As-of join headline: each purchase matched to the user's latest
    * click at-or-before it ([[AsofJoin]] — union + one shuffle + window,
    * no join node). Clicks dedup to one row per (user, ts) first
    * (max_by on event_id) so the prevailing row is well-defined; the
    * DuckDB oracle is a native ASOF LEFT JOIN over the same dedup.
    */
  def asofPurchaseClicks(events: DataFrame): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val clicks = events
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(
        max(col("event_id")).as("event_id"),
        max_by(col("value"), col("event_id")).as("value"))
    AsofJoin(purchases, clicks, Seq("user_id"), "ts")
  }

  /** Gap-based sessionization (30-minute inactivity gap) of the event
    * stream per user: classic lag + cumulative-sum session ids, one
    * shuffle on user_id. Micros arithmetic keeps both engines exact.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMicros = gapMinutes * 60L * 1000000L
    val flagged = events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn(
        "new_session",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapMicros, 1)
          .otherwise(0)
      )
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        dsum(col("value")).as("session_value")
      )
  }

  /** 1-hour tumbling-window aggregation per event type — the batch twin
    * of the streaming job (graft.streaming). date_trunc keeps the bucket
    * function portable across engines.
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("wstart"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"),
        countDistinct(col("user_id")).as("n_users")
      )

  /** Hopping (sliding) window aggregation: 1-hour windows advancing
    * every 15 minutes, the third classic window family beside tumbling
    * and session. Spark's `window()` explodes each row into
    * windowDur/slide = 4 epoch-aligned windows BEFORE the partial
    * aggregation, so the exchange moves (window, type) partials — the
    * ×4 fan-out never crosses the wire. Same quantized value sum as the
    * tumbling twin.
    */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value")
      )
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n_events"), col("total_value"))

  /** The 100 TB variant of [[tumblingAgg]]: exact `countDistinct` plans
    * an Expand (one row copy per aggregate) plus a distinct shuffle —
    * at corpus scale that multiplies the exchange by the distinct-column
    * count. HyperLogLog++ keeps the plan a single pass with fixed-size
    * sketch buffers (mergeable map-side), trading ≤`rsd` relative error
    * on the distinct count.
    */
  def tumblingAggApprox(events: DataFrame, rsd: Double = 0.01): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("wstart"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"),
        approx_count_distinct(col("user_id"), rsd).as("n_users_approx")
      )
}
