package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Aggregation coverage — SURVEY.md §2.4.
  *
  * Reference implementations: hash aggregate at
  * /root/reference/src/execution/operator/aggregate/physical_hash_aggregate.cpp,
  * function registrations at
  * /root/reference/extension/core_functions/function_list.cpp.
  * Spark plans the same two-phase partial→shuffle→final shape
  * (HashAggregateExec); everything here stays inside whole-stage codegen.
  */
object Aggregates {

  private val shared: Map[String, (Q.Fn, String)] = Map(
    // GROUPING SETS family; 'ALL' coalesce keeps the rollup rows
    // comparable without engine-specific grouping_id functions.
    "agg_rollup" -> Q.sharedSql(Seq("lineitem"),
      """SELECT coalesce(l_returnflag,'ALL') AS flag, coalesce(l_linestatus,'ALL') AS status,
        | round(sum(l_quantity),2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin),

    "agg_cube" -> Q.sharedSql(Seq("orders"),
      """SELECT coalesce(o_orderstatus,'ALL') AS status, coalesce(o_orderpriority,'ALL') AS prio,
        | round(sum(o_totalprice),2) AS total, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, prio""".stripMargin),

    "agg_grouping_sets" -> Q.sharedSql(Seq("lineitem"),
      """SELECT coalesce(l_returnflag,'ALL') AS flag, coalesce(l_linestatus,'ALL') AS status,
        | count(*) AS n, round(avg(l_discount),6) AS avg_disc
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY flag, status""".stripMargin),

    "agg_filter_clause" -> Q.sharedSql(Seq("lineitem"),
      """SELECT l_linestatus,
        | round(sum(l_quantity) FILTER (WHERE l_returnflag='R'),2) AS qty_r,
        | count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
        | round(avg(l_extendedprice) FILTER (WHERE l_tax > 0.04),6) AS avg_taxed
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),

    "agg_arg_minmax" -> Q.sharedSql(Seq("lineitem"),
      """SELECT l_returnflag,
        | max_by(l_orderkey, l_extendedprice) AS key_of_max,
        | min_by(l_orderkey, l_extendedprice) AS key_of_min,
        | round(max(l_extendedprice),2) AS max_price,
        | round(min(l_extendedprice),2) AS min_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    "agg_count_distinct_multi" -> Q.sharedSql(Seq("lineitem"),
      """SELECT l_linestatus, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),

    "agg_bool_bit" -> Q.sharedSql(Seq("lineitem"),
      """SELECT l_returnflag, bool_and(l_quantity > 0) AS all_pos,
        | bool_or(l_discount > 0.09) AS any_big_disc,
        | bit_and(l_linenumber) AS ba, bit_or(l_linenumber) AS bo, bit_xor(l_linenumber) AS bx
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    "agg_mode_median" -> Q.sharedSql(Seq("events"),
      """SELECT mode(event_type) AS mode_type, round(median(value),6) AS med_value,
        | round(avg(value),6) AS avg_value, count(*) AS n
        |FROM events""".stripMargin),

    "agg_stats" -> Q.sharedSql(Seq("lineitem"),
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity),6) AS sd_qty, round(stddev_pop(l_quantity),6) AS sdp_qty,
        | round(var_samp(l_discount),6) AS var_disc, round(var_pop(l_discount),6) AS varp_disc,
        | round(corr(l_quantity, l_extendedprice),6) AS corr_qp,
        | round(covar_pop(l_quantity, l_discount),6) AS covp_qd,
        | round(covar_samp(l_quantity, l_discount),6) AS covs_qd,
        | round(regr_slope(l_extendedprice, l_quantity),4) AS slope,
        | round(regr_intercept(l_extendedprice, l_quantity),4) AS intercept,
        | round(regr_r2(l_extendedprice, l_quantity),6) AS r2
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  )

  val queries: Map[String, Q.Fn] = shared.map { case (k, v) => k -> v._1 } ++ Map[String, Q.Fn](
    // arg_min/arg_max top-N variants (reference: arg_min(x, y, n) returns
    // the x values of the n smallest y): sorted-struct slice — exact and
    // deterministic with the (y, x, z) tie-break; arg_max negates the
    // sort key so ties still break ascending like the oracle's ORDER BY
    "agg_arg_minmax_topn" -> { (s, d) =>
      val byMin = array_sort(collect_list(struct(
        col("l_extendedprice").as("y"), col("l_orderkey").as("x"), col("l_linenumber").as("z"))))
      val byMax = array_sort(collect_list(struct(
        (-col("l_extendedprice")).as("y"), col("l_orderkey").as("x"), col("l_linenumber").as("z"))))
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          array_join(transform(slice(byMin, 1, 3), e => e.getField("x").cast("string")), ",").as("min3"),
          array_join(transform(slice(byMax, 1, 3), e => e.getField("x").cast("string")), ",").as("max3"))
        .orderBy(col("l_returnflag"))
    },
    // DuckDB string_agg(x, sep ORDER BY y) ≙ sorted collect_list + join
    // (reference: src/function/aggregate/sorted_aggregate_function.cpp)
    "agg_string_agg" -> { (s, d) =>
      Tables(s, d, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("names"),
          count(lit(1)).as("n"))
        .orderBy(col("s_nationkey"))
    },

    // exact quantiles (reference: holistic/quantile.cpp → Spark percentile)
    "agg_quantiles" -> { (s, d) =>
      Tables(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
          round(expr("percentile(o_totalprice, 0.25)"), 6).as("p25"),
          round(expr("percentile(o_totalprice, 0.75)"), 6).as("p75"),
          round(expr("percentile(o_totalprice, 0.99)"), 6).as("p99"))
        .orderBy(col("o_orderpriority"))
    },

    // population skewness/kurtosis; the oracle reconstructs Spark's
    // population formulas from central moments (DuckDB's builtins are
    // the bias-corrected sample versions — different definition).
    "agg_higher_moments" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(skewness(col("l_quantity")), 6).as("skew"),
          round(kurtosis(col("l_quantity")), 6).as("kurt"))
        .orderBy(col("l_returnflag"))
    }
  )

  val oracle: Map[String, String] = shared.map { case (k, v) => k -> v._2 } ++ Map(
    "agg_arg_minmax_topn" ->
      """SELECT l_returnflag,
        | array_to_string(list(l_orderkey
        |   ORDER BY l_extendedprice, l_orderkey, l_linenumber)[1:3], ',') AS min3,
        | array_to_string(list(l_orderkey
        |   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)[1:3], ',') AS max3
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_string_agg" ->
      """SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS names, count(*) AS n
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "agg_quantiles" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.5),6) AS p50,
        | round(quantile_cont(o_totalprice, 0.25),6) AS p25,
        | round(quantile_cont(o_totalprice, 0.75),6) AS p75,
        | round(quantile_cont(o_totalprice, 0.99),6) AS p99
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "agg_higher_moments" ->
      """SELECT l_returnflag,
        | round(m3/pow(m2,1.5),6) AS skew,
        | round(m4/(m2*m2)-3,6) AS kurt
        |FROM (
        | SELECT l_returnflag, avg(pow(l_quantity-mu,2)) AS m2,
        |  avg(pow(l_quantity-mu,3)) AS m3, avg(pow(l_quantity-mu,4)) AS m4
        | FROM (SELECT l_returnflag, l_quantity,
        |        avg(l_quantity) OVER (PARTITION BY l_returnflag) AS mu FROM lineitem) x
        | GROUP BY l_returnflag) m
        |ORDER BY l_returnflag""".stripMargin
  )
}
