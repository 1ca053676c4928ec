package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** The relational query surface (SURVEY.md §2B): scans, joins (broadcast /
  * shuffle / semi / anti / as-of), aggregations, window functions, sorts,
  * top-k, set ops, rollup, scalar functions, JSON access, time windows.
  *
  * Numeric discipline for oracle parity: every aggregate is computed in
  * exact arithmetic (decimal or integer) and only the final value is cast
  * to double — a float sum is order-dependent and would hash-mismatch the
  * DuckDB oracle. Every timestamp output is formatted to a string so
  * parquet physical encodings can't diverge. Every query ends in a
  * deterministic ORDER BY (full key, ties broken).
  */
object Relational {

  /** Exact 2-decimal view of a money column (stored as double). */
  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  val queries: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // q01: full-scan hash aggregation (TPC-H Q1 shape). Partial (map-side)
    // aggregation + single shuffle on the 2 grouping keys; scan prunes to
    // the 7 referenced columns of lineitem.
    GraftQuery(
      "q01_pricing_summary",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.lineitem
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
              .cast("double").as("sum_disc_price"),
            sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount"))
              * dec2(lit(1) + col("l_tax"))).cast("double").as("sum_charge"),
            (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)))
              .as("avg_qty"),
            (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1)))
              .as("avg_price"),
            (sum(dec2(col("l_discount"))).cast("double") / count(lit(1)))
              .as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
          CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ------------------------------------------------------------------
    // q02: 5-way join (TPC-H Q5 shape). region/nation are tiny -> broadcast;
    // orders⨝lineitem is the one real shuffle join on orderkey; customer is
    // broadcast at test SF and would be a shuffle join at 100 TB (Catalyst/
    // AQE picks by size, which is why we don't hard-code the hint on the
    // large side).
    GraftQuery(
      "q02_region_revenue",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val revenue =
          dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount"))
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(sum(revenue).cast("double").as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy(col("n_name"))
      },
      Some("""
        SELECT n_name,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY n_name""")),

    // ------------------------------------------------------------------
    // q03: broadcast dimension join + aggregation by brand. part is the
    // classic broadcast side (fits in memory at any SF that matters here;
    // at 100 TB part is ~GBs -> still broadcastable per executor).
    GraftQuery(
      "q03_brand_revenue",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.lineitem
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
              .cast("double").as("revenue"),
            sum(dec2(col("l_quantity"))).cast("double").as("qty"),
            count(lit(1)).as("n_items"))
          .orderBy(col("p_brand"))
      },
      Some("""
        SELECT p_brand,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
          COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand""")),

    // ------------------------------------------------------------------
    // q04: left-semi join (EXISTS). Spark plans a broadcast/shuffle semi
    // join — no row multiplication, which is the point vs. JOIN+DISTINCT.
    GraftQuery(
      "q04_priority_with_returns",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val returned = t.lineitem.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"))
        t.orders
          .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ------------------------------------------------------------------
    // q05: left-anti join (NOT EXISTS): customers with no order in 1995
    // (every customer has *some* order at sf>=0.01, so the unfiltered
    // variant would be vacuously empty).
    GraftQuery(
      "q05_customers_without_orders",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val orders95 = t.orders.filter(year(col("o_orderdate")) === 1995)
        t.customer
          .join(orders95, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"),
               sum(dec2(col("c_acctbal"))).cast("double").as("sum_acctbal"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND EXTRACT(year FROM o_orderdate) = 1995)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    // ------------------------------------------------------------------
    // q06: ranking window function — top-3 orders per customer. One shuffle
    // on o_custkey; ties broken by o_orderkey so the row set is
    // deterministic.
    GraftQuery(
      "q06_top_orders_per_customer",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t.orders
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("rk"), col("o_orderkey"),
                  dec2(col("o_totalprice")).cast("double").as("totalprice"))
          .orderBy(col("o_custkey"), col("rk"))
      },
      Some("""
        SELECT o_custkey, CAST(rk AS INT) AS rk, o_orderkey, totalprice FROM (
          SELECT o_custkey, o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders)
        WHERE rk <= 3
        ORDER BY o_custkey, rk""")),

    // ------------------------------------------------------------------
    // q07: analytic window functions — running sum + lag over a frame,
    // partitioned by supplier. Exact integer/decimal running sums.
    GraftQuery(
      "q07_supplier_running_qty",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        // l_quantity tie-break: the sf0.1 testdata contains duplicate
        // (orderkey, linenumber) keys, and a running sum needs a TOTAL
        // order on quantities to be engine-independent
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"),
                   col("l_linenumber"), col("l_quantity"))
        t.lineitem
          .withColumn("running_qty",
            sum(dec2(col("l_quantity")))
              .over(w.rowsBetween(Window.unboundedPreceding, 0))
              .cast("double"))
          .withColumn("prev_qty",
            lag(dec2(col("l_quantity")).cast("double"), 1).over(w))
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
                  col("running_qty"), col("prev_qty"))
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER w AS DOUBLE) AS running_qty,
          LAG(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE), 1) OVER w AS prev_qty
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
        ORDER BY l_suppkey, l_orderkey, l_linenumber""")),

    // ------------------------------------------------------------------
    // q08: top-k by aggregate (global sort + limit after a keyed agg), then
    // broadcast join back to the dimension for names. orderBy+limit plans
    // as TakeOrderedAndProject — no full sort materialization.
    GraftQuery(
      "q08_top10_parts_by_revenue",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val rev = t.lineitem
          .groupBy(col("l_partkey"))
          .agg(sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
                 .as("rev_d"),
               count(lit(1)).as("n_items"))
          .orderBy(col("rev_d").desc, col("l_partkey"))
          .limit(10)
        rev.join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey").as("partkey"), col("p_name"),
                  col("rev_d").cast("double").as("revenue"), col("n_items"))
          .orderBy(col("revenue").desc, col("partkey"))
      },
      Some("""
        WITH rev AS (
          SELECT l_partkey AS partkey,
            SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS rev_d,
            COUNT(*) AS n_items
          FROM lineitem GROUP BY l_partkey
          ORDER BY rev_d DESC, partkey LIMIT 10)
        SELECT partkey, p_name, CAST(rev_d AS DOUBLE) AS revenue, n_items
        FROM rev JOIN part ON partkey = p_partkey
        ORDER BY revenue DESC, partkey""")),

    // ------------------------------------------------------------------
    // q09: set operations — UNION / INTERSECT / EXCEPT (all DISTINCT
    // semantics, matching SQL). Tagged so one result covers all three.
    GraftQuery(
      "q09_set_ops",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val building = t.customer
          .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        val bigSpenders = t.orders
          .filter(col("o_totalprice") > 250000).select(col("o_custkey"))
        val i = building.intersect(bigSpenders)
          .withColumn("op", lit("intersect"))
        val e = building.except(bigSpenders)
          .withColumn("op", lit("except"))
        val u = building.union(bigSpenders).distinct()
          .withColumn("op", lit("union"))
        i.union(e).union(u)
          .select(col("op"), col("c_custkey").as("custkey"))
          .orderBy(col("op"), col("custkey"))
      },
      Some("""
        WITH building AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
             big AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000)
        SELECT 'intersect' AS op, custkey FROM (SELECT custkey FROM building INTERSECT SELECT custkey FROM big)
        UNION ALL
        SELECT 'except' AS op, custkey FROM (SELECT custkey FROM building EXCEPT SELECT custkey FROM big)
        UNION ALL
        SELECT 'union' AS op, custkey FROM (SELECT custkey FROM building UNION SELECT custkey FROM big)
        ORDER BY op, custkey""")),

    // ------------------------------------------------------------------
    // q10: ROLLUP grouping sets; NULL group markers coalesced to 'ALL' so
    // null-ordering differences between engines can't bite.
    GraftQuery(
      "q10_rollup_flag_status",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.lineitem
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_items"),
               sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("n_items"), col("sum_qty"))
          .orderBy(col("returnflag"), col("linestatus"))
      },
      Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus""")),

    // ------------------------------------------------------------------
    // q11: exact distinct aggregation (count_distinct plans as a two-phase
    // expand+agg; the approx_count_distinct variant is benched separately —
    // an approximate value can't hash-match an oracle).
    GraftQuery(
      "q11_distinct_users",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.events
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users"),
               count(lit(1)).as("n_events"),
               sum(dec2(col("value"))).cast("double").as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events,
               CAST(SUM(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // q12: scalar function library — string / date / math, all codegen'd
    // built-ins (no UDFs), over a pruned projection.
    GraftQuery(
      "q12_scalar_functions",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.orders
          .filter(col("o_orderkey") % 100 === 0)
          .select(
            col("o_orderkey"),
            upper(substring(col("o_orderpriority"), 3, 20)).as("prio_upper"),
            concat_ws("|", col("o_orderstatus"), col("o_orderpriority"))
              .as("status_prio"),
            length(col("o_orderpriority")).as("prio_len"),
            year(col("o_orderdate")).as("order_year"),
            month(col("o_orderdate")).as("order_month"),
            date_format(col("o_orderdate"), "yyyy/MM/dd").as("order_ymd"),
            round(dec2(col("o_totalprice")) / 1000, 1).cast("double")
              .as("price_k"),
            dec2(col("o_totalprice")).cast("double").as("abs_price"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey,
               UPPER(SUBSTRING(o_orderpriority, 3, 20)) AS prio_upper,
               CONCAT_WS('|', o_orderstatus, o_orderpriority) AS status_prio,
               CAST(LENGTH(o_orderpriority) AS INT) AS prio_len,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
               CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
               STRFTIME(o_orderdate, '%Y/%m/%d') AS order_ymd,
               CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)) / 1000, 1) AS DOUBLE) AS price_k,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS abs_price
        FROM orders
        WHERE o_orderkey % 100 = 0
        ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    // q13: JSON access (the reference stores Docling output as raw JSON
    // strings — SURVEY.md §1.2; get_json_object is the lazy-parse path).
    GraftQuery(
      "q13_json_props",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.events
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"),
               max(col("k")).as("max_k"),
               count(col("k")).as("n_with_k"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // q14: conditional aggregation — the reference's headline monitoring
    // query (failure ratio, k8s/monitoring/alerts.yaml:28-38) in daily
    // batch form. Ratio is a double division of two exact longs.
    GraftQuery(
      "q14_daily_error_ratio",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.events
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("n_errors"))
          .withColumn("error_ratio",
            col("n_errors").cast("double") / col("n_events"))
          .orderBy(col("day"))
      },
      Some("""
        SELECT STRFTIME(ts, '%Y-%m-%d') AS day,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS error_ratio
        FROM events
        GROUP BY 1
        ORDER BY day""")),

    // ------------------------------------------------------------------
    // q70: full-outer join breadth — customer activity rollup keeping
    // BOTH unmatched sides (a truncated customer dim makes orphan orders
    // real). COALESCE folds the two key columns; the left-only rows keep
    // null order stats, the right-only rows null dim attributes.
    GraftQuery(
      "q70_full_outer_activity",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val dim = t.customer.filter(col("c_custkey") <= 400)
          .select(col("c_custkey"), col("c_mktsegment"))
        val act = t.orders
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
               sum(col("o_totalprice").cast("decimal(12,2)"))
                 .cast("double").as("total_spend"))
        dim.join(act, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_mktsegment").as("segment"),
            col("n_orders"), col("total_spend"))
          .orderBy(col("custkey"))
      },
      Some("""
        WITH dim AS (SELECT c_custkey, c_mktsegment FROM customer
                     WHERE c_custkey <= 400),
        act AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
                FROM orders GROUP BY o_custkey)
        SELECT COALESCE(d.c_custkey, a.o_custkey) AS custkey,
               d.c_mktsegment AS segment, a.n_orders, a.total_spend
        FROM dim d FULL OUTER JOIN act a ON d.c_custkey = a.o_custkey
        ORDER BY custkey""")),

    // ------------------------------------------------------------------
    // q73: calendar zero-fill — weekly revenue INCLUDING empty weeks.
    // The week spine is generated with sequence() + explode from the
    // single-row min/max aggregate (broadcast, ~350 rows at any scale —
    // a calendar dimension never needs a shuffle), then left-joined to
    // the weekly rollup. Gap detection over time series is a standard
    // pipeline-health query the bare groupBy cannot express (absent
    // weeks produce no group).
    GraftQuery(
      "q73_weekly_revenue_calendar",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val o = t.orders.select(
          date_trunc("week", col("o_orderdate")).cast("date").as("week"),
          dec2(col("o_totalprice")).as("price"))
        val weeks = o.agg(min(col("week")).as("wmin"), max(col("week")).as("wmax"))
          .select(explode(expr("sequence(wmin, wmax, interval 1 week)")).as("week"))
        val rev = o.groupBy(col("week"))
          .agg(count(lit(1)).as("n_orders"),
               sum(col("price")).cast("double").as("revenue"))
        weeks.join(rev, Seq("week"), "left")
          .select(date_format(col("week"), "yyyy-MM-dd").as("week"),
                  coalesce(col("n_orders"), lit(0L)).as("n_orders"),
                  coalesce(col("revenue"), lit(0.0)).as("revenue"))
          .orderBy(col("week"))
      },
      Some("""
        WITH o AS (SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
                          CAST(o_totalprice AS DECIMAL(12,2)) AS price
                   FROM orders),
        b AS (SELECT MIN(week) AS wmin, MAX(week) AS wmax FROM o),
        weeks AS (SELECT CAST(unnest(generate_series(wmin, wmax, INTERVAL 7 DAY)) AS DATE) AS week
                  FROM b),
        rev AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS n_orders,
                       CAST(SUM(price) AS DOUBLE) AS revenue
                FROM o GROUP BY week)
        SELECT STRFTIME(w.week, '%Y-%m-%d') AS week,
               COALESCE(r.n_orders, 0) AS n_orders,
               COALESCE(r.revenue, 0) AS revenue
        FROM weeks w LEFT JOIN rev r ON w.week = r.week
        ORDER BY week"""))
  )
}
