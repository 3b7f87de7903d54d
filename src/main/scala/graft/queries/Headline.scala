package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Headline analytics queries — the BASELINE.md benchmark set, oracle-matched.
  *
  * Conventions shared by every oracle-matched query in this engine:
  *  - double-typed aggregates are `round(...)`ed identically on both sides
  *    (Spark and DuckDB sum doubles in different orders; the last ulps
  *    differ, the rounded decimal does not);
  *  - every result carries a total deterministic ORDER BY (ties broken by a
  *    unique key) so LIMITed results are well-defined on both engines;
  *  - every computed column is aliased to the same name on both sides (the
  *    driver's comparator matches columns by name).
  *
  * Reference query shapes: /root/reference/extension/tpch/dbgen/queries/
  * q01.sql, q03.sql, q05.sql; window dispatch at
  * /root/reference/src/execution/operator/aggregate/physical_window.cpp:205-229.
  */
object Headline {

  private def ts(s: String) = lit(s).cast("timestamp")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> { (s, d) =>
      // 6 groups (returnflag × linestatus) — the textbook perfect-hash
      // aggregate: one parallel partial job, coordinator-merged final
      // (plans/DriverAgg.scala). The declarative shuffled plan survives as
      // the DriverAggSpec differential oracle and the >maxGroups fallback.
      graft.plans.DriverAgg.lowCard(
        Tables(s, d, "lineitem")
          .filter(col("l_shipdate") <= ts("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
            round(avg(col("l_quantity")), 6).as("avg_qty"),
            round(avg(col("l_extendedprice")), 6).as("avg_price"),
            round(avg(col("l_discount")), 6).as("avg_disc"),
            count(lit(1)).as("count_order")),
        Seq(col("l_returnflag"), col("l_linestatus")))
    },

    "q3_shipping_priority" -> { (s, d) =>
      val cust = Tables(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord  = Tables(s, d, "orders").filter(col("o_orderdate") < ts("1996-03-15"))
      val li   = Tables(s, d, "lineitem").filter(col("l_shipdate") > ts("1996-03-15"))
      // customer is the small side: broadcast it into orders, then shuffle
      // the big orders⋈lineitem equi-join on the order key.
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },

    "q5_local_supplier" -> { (s, d) =>
      // Flat join chain; sizes decide the physical strategy. The dimension
      // sides (customer/supplier/nation/region) carry broadcast hints —
      // right at any scale. orders is deliberately UNhinted: at bench SF
      // Catalyst's size estimate broadcasts it (no shuffle anywhere); at
      // warehouse scale the same plan degrades gracefully to a shuffle
      // join on the order key. All broadcast builds launch concurrently,
      // so their jobs overlap instead of serializing.
      val asia = Tables(s, d, "region").filter(col("r_name") === "ASIA")
      val ord = Tables(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
      // ≤25 groups (nations): the post-join aggregate coordinator-merges
      // in the same single job as the broadcast-join pipeline
      graft.plans.DriverAgg.lowCard(
        Tables(s, d, "lineitem")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(Tables(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue")),
        Seq(col("revenue").desc, col("n_name")))
    },

    "q6_forecast_revenue" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01")
          && col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    "distinct_exact" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status"),
          count(lit(1)).as("n_rows"))
    },

    // HLL sketches differ across engines — no oracle entry; the driver
    // records a rows-only check (Spark HLL++ vs DuckDB HLL estimates).
    "distinct_approx" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey"), 0.02).as("approx_supps"))
    },

    "window_rank_running" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("run_total",
          round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
        .filter(col("rn") <= 3) // QUALIFY rewrite (reference: bind_select_node.cpp:524-528)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("run_total"))
        .orderBy(col("o_custkey"), col("rn"))
        .limit(100)
    },

    "topk_lineitem" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
    },

    "events_tumbling_1h" -> { (s, d) =>
      // hour buckets × event types — bounded key domain; one scan job,
      // coordinator merge, driver-side sort+limit over O(groups) rows
      graft.plans.DriverAgg.lowCard(
        Tables(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value")),
        Seq(col("bucket"), col("event_type")), limit = 50)
    },

    "events_sessionize_lag" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, d, "events")
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev"))) > 1800000000L, 1).otherwise(0))
        .filter(col("new_s") === 1)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("sessions"))
        .orderBy(col("sessions").desc, col("user_id"))
        .limit(10)
    }
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),6) AS avg_qty,
        | round(avg(l_extendedprice),6) AS avg_price,
        | round(avg(l_discount),6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey=o_custkey
        |JOIN lineitem ON l_orderkey=o_orderkey
        |WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1996-03-15'
        |  AND l_shipdate > TIMESTAMP '1996-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey=o_custkey
        |JOIN lineitem ON l_orderkey=o_orderkey
        |JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
        |JOIN nation ON s_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue, count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "distinct_exact" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status,
        | count(*) AS n_rows
        |FROM lineitem""".stripMargin,

    "window_rank_running" ->
      """SELECT o_custkey, o_orderkey, rn, round(run_total,2) AS run_total FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_total
        | FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) t WHERE rn <= 3 ORDER BY o_custkey, rn LIMIT 100""".stripMargin,

    "topk_lineitem" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,

    "events_tumbling_1h" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        | count(*) AS n, round(avg(value),6) AS avg_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2 LIMIT 50""".stripMargin,

    "events_sessionize_lag" ->
      """SELECT user_id, count(*) AS sessions FROM (
        | SELECT user_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |       THEN 1 ELSE 0 END AS new_s
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |) t WHERE new_s=1 GROUP BY user_id
        |ORDER BY sessions DESC, user_id LIMIT 10""".stripMargin
  )
}
