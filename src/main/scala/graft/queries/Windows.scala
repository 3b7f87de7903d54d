package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function coverage — SURVEY.md §2.5.
  *
  * Reference: single PhysicalWindow operator
  * (/root/reference/src/execution/operator/aggregate/physical_window.cpp),
  * per-function executors under /root/reference/src/function/window/.
  * Frames: ROWS and RANGE are Spark builtins; GROUPS mode (reference:
  * src/include/duckdb/parser/expression/window_expression.hpp:16-28) is a
  * Spark gap emulated below via dense_rank + RANGE.
  */
object Windows {

  private val shared: Map[String, (Q.Fn, String)] = Map(
    "window_lead_lag" -> Q.sharedSql(Seq("orders"),
      """SELECT o_custkey, o_orderkey,
        | round(lag(o_totalprice, 1, 0.0) OVER w, 2) AS prev_price,
        | round(lead(o_totalprice, 1, -1.0) OVER w, 2) AS next_price,
        | round(o_totalprice - lag(o_totalprice, 1, 0.0) OVER w, 2) AS delta
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey LIMIT 200""".stripMargin),

    "window_rank_family" -> Q.sharedSql(Seq("orders"),
      """SELECT o_orderkey, o_orderpriority,
        | rank() OVER w AS rk, dense_rank() OVER w AS drk, ntile(4) OVER w AS nt,
        | round(percent_rank() OVER w, 6) AS pr, round(cume_dist() OVER w, 6) AS cd
        |FROM orders WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, rk LIMIT 200""".stripMargin),

    "window_range_frame" -> Q.sharedSql(Seq("orders"),
      """SELECT o_orderkey,
        | round(sum(o_totalprice) OVER (ORDER BY o_totalprice
        |   RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW), 2) AS rsum,
        | CAST(count(*) OVER (ORDER BY o_totalprice
        |   RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING) AS BIGINT) AS n_near
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin),

    "window_first_last_nth" -> Q.sharedSql(Seq("orders"),
      """SELECT o_custkey, o_orderkey,
        | round(first_value(o_totalprice) OVER w, 2) AS fv,
        | round(last_value(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS lv,
        | round(nth_value(o_totalprice, 2) OVER w, 2) AS nv2
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey LIMIT 200""".stripMargin),

    "window_moving_avg" -> Q.sharedSql(Seq("events"),
      """SELECT event_id,
        | round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING), 6) AS mavg
        |FROM events ORDER BY event_id LIMIT 300""".stripMargin),

    // grouped top-k (the h2o_g08 shape at gate scale): routed through
    // rules/WindowTopKToAgg's k-bounded hash aggregate instead of the
    // sort-everything window plan; tie-free by the (price, orderkey,
    // linenumber) tiebreak so the oracle hash compare is exact
    "window_topk_group" -> Q.sharedSql(Seq("lineitem"),
      """SELECT l_suppkey, l_orderkey, l_linenumber, rn FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin)
  )

  val queries: Map[String, Q.Fn] = shared.map { case (k, v) => k -> v._1 } ++ Map[String, Q.Fn](
    // EXCLUDE CURRENT ROW frame (Spark gap, SURVEY §2.5): frame-sum minus
    // the current row's value — validated against DuckDB's native EXCLUDE
    "window_exclude_current" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(-2, 2)
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w) - col("o_totalprice"), 2).as("sum_excl"))
        .orderBy(col("o_orderkey")).limit(200)
    },

    // EXCLUDE CURRENT ROW with NON-INVERTIBLE aggregates (reference:
    // test/sql/window/test_window_exclude.test_slow): the sum-minus
    // trick cannot express max/min, so the frame splits into its
    // preceding and following halves and recombines via greatest/least
    // (empty halves are NULL; greatest/least ignore NULLs, so an
    // all-empty frame yields NULL exactly like the native EXCLUDE)
    "window_exclude_minmax" -> { (s, d) =>
      val before = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(-3, -1)
      val after = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(1, 3)
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          round(greatest(max(col("o_totalprice")).over(before),
            max(col("o_totalprice")).over(after)), 2).as("mx_excl"),
          round(least(min(col("o_totalprice")).over(before),
            min(col("o_totalprice")).over(after)), 2).as("mn_excl"))
        .orderBy(col("o_orderkey")).limit(300)
    },

    // GROUPS frame × EXCLUDE GROUP (Spark has neither): GROUPS BETWEEN 1
    // PRECEDING AND 1 FOLLOWING EXCLUDE GROUP ≡ sum of the previous +
    // next peer groups — per-group sums once, lag/lead over the group
    // sequence, joined back to rows; both neighbors absent → NULL (the
    // native empty-frame result)
    "window_groups_exclude_group" -> { (s, d) =>
      val gs = Tables(s, d, "orders")
        .groupBy(col("o_orderpriority"), col("o_totalprice"))
        .agg(sum(col("o_totalprice")).as("gsum"))
      val wg = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
      val neigh = gs.select(col("o_orderpriority"), col("o_totalprice"),
        lag(col("gsum"), 1).over(wg).as("pg"),
        lead(col("gsum"), 1).over(wg).as("ng"))
      Tables(s, d, "orders")
        .join(neigh, Seq("o_orderpriority", "o_totalprice"))
        .select(col("o_orderkey"),
          round(when(col("pg").isNull && col("ng").isNull, lit(null))
            .otherwise(coalesce(col("pg"), lit(0.0)) + coalesce(col("ng"), lit(0.0))),
            2).as("eg"))
        .orderBy(col("o_orderkey")).limit(300)
    },

    // IGNORE NULLS lag (reference: window_value_function.cpp); the oracle
    // emulates it via max_by over the preceding frame (DuckDB 1.0 lacks
    // the IGNORE NULLS syntax)
    "window_ignore_nulls" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, d, "events")
        .withColumn("x", when(col("event_type") =!= "error", col("value")))
        .select(col("event_id"),
          round(lag(col("x"), 1, null, ignoreNulls = true).over(w), 6).as("prev_nn"))
        .orderBy(col("event_id")).limit(300)
    },

    // EXCLUDE GROUP / EXCLUDE TIES emulation: frame-sum minus peer-sum
    // (count-guarded so an all-peers frame yields NULL like the native
    // implementation), plus-current for TIES
    "window_exclude_group_ties" -> { (s, d) =>
      val base = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
      val frame = base.rangeBetween(-5000, 0)
      val peers = base.rangeBetween(0, 0)
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          when(count(lit(1)).over(frame) > count(lit(1)).over(peers),
            round(sum(col("o_totalprice")).over(frame) -
              sum(col("o_totalprice")).over(peers), 2)).as("eg"),
          round(sum(col("o_totalprice")).over(frame) -
            sum(col("o_totalprice")).over(peers) + col("o_totalprice"), 2).as("et"))
        .orderBy(col("o_orderkey")).limit(200)
    },

    // GROUPS frame emulation: dense_rank() materializes the peer-group
    // index, then a RANGE frame over that integer reproduces
    // GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW.
    "window_groups_frame" -> { (s, d) =>
      val order = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderdate"))
      Tables(s, d, "orders")
        .withColumn("dr", dense_rank().over(order))
        .withColumn("cnt_g",
          count(lit(1)).over(
            Window.partitionBy(col("o_orderpriority")).orderBy(col("dr"))
              .rangeBetween(-1, 0)))
        .select(col("o_orderkey"), col("cnt_g"))
        .orderBy(col("o_orderkey")).limit(300)
    },

    // DISTINCT aggregates over an UNBOUNDED window frame (reference:
    // src/function/window/window_distinct_aggregator.cpp — a dedicated
    // executor; Spark rejects DISTINCT in window aggregates outright).
    // Emulation: collect_set over the partition IS the distinct multiset
    // — size() gives count(DISTINCT), aggregate() folds sum(DISTINCT).
    // NULL handling matches natively: collect_set drops NULLs exactly
    // like DISTINCT aggregates ignore them.
    // SCALE VALVE (Dedup-style note): the emulation materializes the
    // per-partition distinct set as an array value — bounded by the
    // DISTINCT column's per-partition cardinality, NOT the row count
    // (unbounded frames evaluate once per partition in WindowExec). Fine
    // for low-cardinality columns like these; a high-cardinality DISTINCT
    // over a hot key would balloon — route that through a two-level
    // groupBy(part, value) + count instead.
    // DISTINCT aggregate over a BOUNDED sliding frame (reference handles
    // arbitrary frames in window_distinct_aggregator.cpp via a merge-sort
    // tree; here the frame is small and explicit, so the per-row distinct
    // set over the sliding collect_list is exact and O(frame) per row —
    // the cost is bounded by the FRAME size, not the partition).
    "window_distinct_bounded" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-4, Window.currentRow)
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          size(array_distinct(collect_list(col("o_orderpriority")).over(w)))
            .cast("long").as("w_prio"),
          aggregate(array_distinct(collect_list(month(col("o_orderdate"))).over(w)),
            lit(0L), (a, x) => a + x.cast("long")).as("w_sum_months"))
        .orderBy(col("o_orderkey")).limit(300)
    },

    "window_distinct_agg" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          size(collect_set(col("o_orderpriority")).over(w)).cast("long").as("n_prio"),
          aggregate(collect_set(month(col("o_orderdate"))).over(w),
            lit(0L), (a, x) => a + x.cast("long")).as("sum_months"))
        .orderBy(col("o_orderkey")).limit(300)
    },

    // RUNNING count(DISTINCT) — ROWS UNBOUNDED PRECEDING frame — via the
    // sum-of-first-occurrence identity: a row raises the running distinct
    // count iff it is the FIRST occurrence of its value in the partition
    // order, so row_number() = 1 per (partition, value) marks +1 and a
    // running sum of the marks reproduces the distinct count at every
    // row. Both windows share one total order (date, orderkey) so the
    // frame is engine-independent.
    "window_distinct_running" -> { (s, d) =>
      val firstSeen = Window
        .partitionBy(col("o_custkey"), col("o_orderpriority"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "orders")
        .withColumn("first_occ",
          when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
        .select(col("o_orderkey"),
          sum(col("first_occ")).over(run).cast("long").as("run_prio"))
        .orderBy(col("o_orderkey")).limit(300)
    },

    // FILTER (WHERE ...) on a WINDOWED aggregate (reference binds it for
    // window aggregates too — bind_aggregate_expression.cpp:122-125;
    // Spark rejects the clause on window functions). CASE-rewrite: sum
    // over `CASE WHEN c THEN x END` (empty filtered frame → NULL, same
    // as native FILTER) and count as a 0/1 running sum (empty → 0).
    "window_filter_clause" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // money summed as exact integer cents (Q.scala second convention):
      // a running double sum vs DuckDB's segment-tree sum need not agree
      // in the last ulp, and round(.., 2) diverges at .005 boundaries
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          sum(when(col("o_orderpriority") === "1-URGENT",
            round(col("o_totalprice") * 100).cast("long"))).over(w)
            .cast("long").as("urgent_cents"),
          sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
            .over(w).cast("long").as("urgent_n"))
        .orderBy(col("o_orderkey")).limit(300)
    }
  )

  val oracle: Map[String, String] = shared.map { case (k, v) => k -> v._2 } ++ Map(
    "window_exclude_current" ->
      """SELECT o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW), 2) AS sum_excl
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin,

    "window_exclude_minmax" ->
      """SELECT o_orderkey,
        | round(max(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW), 2) AS mx_excl,
        | round(min(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW), 2) AS mn_excl
        |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin,

    // DuckDB 1.0 lacks GROUPS mode (same pin as window_groups_frame):
    // the oracle emulates GROUPS -1..+1 EXCLUDE GROUP as the dense-rank
    // RANGE frame minus the peer-group slice, NULL when only the own
    // group is in frame
    "window_groups_exclude_group" ->
      """SELECT o_orderkey,
        | round(CASE WHEN cnt3 > cntg THEN s3 - sg ELSE NULL END, 2) AS eg
        |FROM (SELECT o_orderkey,
        |       sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY dr
        |         RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s3,
        |       count(*) OVER (PARTITION BY o_orderpriority ORDER BY dr
        |         RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS cnt3,
        |       sum(o_totalprice) OVER (PARTITION BY o_orderpriority, dr) AS sg,
        |       count(*) OVER (PARTITION BY o_orderpriority, dr) AS cntg
        |      FROM (SELECT o_orderkey, o_orderpriority, o_totalprice,
        |             dense_rank() OVER (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice) AS dr
        |            FROM orders) t) u
        |ORDER BY o_orderkey LIMIT 300""".stripMargin,

    "window_ignore_nulls" ->
      """SELECT event_id,
        | round(max_by(x, CASE WHEN x IS NOT NULL THEN ord END) OVER
        |  (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 6) AS prev_nn
        |FROM (SELECT event_id, user_id, ts,
        |       CASE WHEN event_type <> 'error' THEN value END AS x,
        |       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ord
        |      FROM events) t
        |ORDER BY event_id LIMIT 300""".stripMargin,

    "window_exclude_group_ties" ->
      """SELECT o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |   RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW EXCLUDE GROUP), 2) AS eg,
        | round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |   RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW EXCLUDE TIES), 2) AS et
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin,

    // DuckDB 1.0 (oracle version) has not implemented GROUPS frames either,
    // so the oracle uses the same dense_rank+RANGE arithmetic.
    "window_groups_frame" ->
      """SELECT o_orderkey,
        | CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY dr
        |   RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT) AS cnt_g
        |FROM (SELECT o_orderkey, o_orderpriority,
        |       dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate) AS dr
        |      FROM orders) t
        |ORDER BY o_orderkey LIMIT 300""".stripMargin,

    // oracle runs the NATIVE window DISTINCT aggregates
    "window_distinct_bounded" ->
      """SELECT o_orderkey,
        | CAST(count(DISTINCT o_orderpriority) OVER w AS BIGINT) AS w_prio,
        | CAST(sum(DISTINCT EXTRACT(MONTH FROM o_orderdate)) OVER w AS BIGINT) AS w_sum_months
        |FROM orders WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey LIMIT 300""".stripMargin,

    "window_distinct_agg" ->
      """SELECT o_orderkey,
        | CAST(count(DISTINCT o_orderpriority) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_prio,
        | CAST(sum(DISTINCT EXTRACT(MONTH FROM o_orderdate))
        |   OVER (PARTITION BY o_custkey) AS BIGINT) AS sum_months
        |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin,

    "window_distinct_running" ->
      """SELECT o_orderkey,
        | CAST(count(DISTINCT o_orderpriority) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_prio
        |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin,

    // oracle runs the NATIVE FILTER clause on the windowed aggregate
    "window_filter_clause" ->
      """SELECT o_orderkey,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |   FILTER (WHERE o_orderpriority = '1-URGENT') OVER w AS BIGINT) AS urgent_cents,
        | CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') OVER w AS BIGINT) AS urgent_n
        |FROM orders WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING)
        |ORDER BY o_orderkey LIMIT 300""".stripMargin
  )
}
