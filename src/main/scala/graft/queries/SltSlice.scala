package graft.queries

/** A curated sqllogictest-style slice — the reference's primary test
  * asset is 3,327 `.test` files under /root/reference/test/sql/; this
  * family re-expresses the edge-semantics those files pin (NULL handling,
  * empty inputs, overflow, frame edges, three-valued logic) as
  * dialect-identical SQL gated against the DuckDB oracle, one query per
  * edge cluster. Inline data comes from column-aliased CTEs (supported
  * identically by Spark SQL and DuckDB), so the slice is self-contained
  * and deterministic at every SF.
  *
  * Conventions: every nullable ORDER BY key carries an explicit NULLS
  * FIRST/LAST (the engines' defaults differ); float aggregates are
  * round()ed; every computed column is aliased (the driver compares by
  * column name). Reference test files are cited per query.
  */
object SltSlice {

  /** (name, sql) — every query is sharedSql over CTE-inline data; the
    * table list is empty (nothing external is read).
    */
  private val q: Seq[(String, String)] = Seq(

    // ---------------------------------------------------- aggregates
    // test/sql/aggregate/aggregates/test_aggregate_types_scalar.test:
    // aggregates over an EMPTY input: count()=0, the rest NULL
    "slt_agg_empty_input" ->
      """WITH t(i, s) AS (SELECT 1, 'a' UNION ALL SELECT 2, 'b')
        |SELECT count(*) AS n, count(i) AS n_i,
        |       CAST(sum(i) AS BIGINT) AS s_i, min(i) AS mn, max(s) AS mx,
        |       avg(i) AS av
        |FROM t WHERE i > 100""".stripMargin,

    // test/sql/aggregate/aggregates/test_aggregate_types.test: a group
    // whose aggregated column is all NULL: sum/min/max/avg NULL, count 0
    "slt_agg_null_only_group" ->
      """WITH t(g, v) AS (
        |  SELECT 'a', 1 UNION ALL SELECT 'a', 2
        |  UNION ALL SELECT 'b', CAST(NULL AS INT) UNION ALL SELECT 'b', CAST(NULL AS INT))
        |SELECT g, count(*) AS n_rows, count(v) AS n_v,
        |       CAST(sum(v) AS BIGINT) AS s, min(v) AS mn, max(v) AS mx, avg(v) AS av
        |FROM t GROUP BY g ORDER BY g""".stripMargin,

    // NULLs are skipped, not zeroed, by sum/avg/min/max
    "slt_agg_null_mix" ->
      """WITH t(v) AS (SELECT 10 UNION ALL SELECT CAST(NULL AS INT)
        |  UNION ALL SELECT 30 UNION ALL SELECT CAST(NULL AS INT))
        |SELECT count(*) AS n_rows, count(v) AS n_v,
        |       CAST(sum(v) AS BIGINT) AS s, avg(v) AS av, min(v) AS mn, max(v) AS mx
        |FROM t""".stripMargin,

    // test/sql/aggregate/distinct/test_distinct_aggr.test: DISTINCT
    // aggregates ignore NULLs and collapse duplicates
    "slt_agg_distinct_nulls" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 1 UNION ALL SELECT 2
        |  UNION ALL SELECT CAST(NULL AS INT) UNION ALL SELECT CAST(NULL AS INT))
        |SELECT count(DISTINCT v) AS nd, CAST(sum(DISTINCT v) AS BIGINT) AS sd,
        |       count(v) AS n_v, count(*) AS n_rows
        |FROM t""".stripMargin,

    // test/sql/aggregate/aggregates/test_bool_and_or.test shape:
    // bool_and/bool_or skip NULLs; all-NULL input yields NULL
    "slt_agg_bool_nulls" ->
      """WITH t(g, b) AS (
        |  SELECT 1, true UNION ALL SELECT 1, CAST(NULL AS BOOLEAN)
        |  UNION ALL SELECT 2, false UNION ALL SELECT 2, true
        |  UNION ALL SELECT 3, CAST(NULL AS BOOLEAN))
        |SELECT g, bool_and(b) AS ba, bool_or(b) AS bo, count(b) AS n
        |FROM t GROUP BY g ORDER BY g""".stripMargin,

    // test/sql/aggregate/aggregates/test_aggr_string.test: min/max over
    // strings (lexicographic, NULLs skipped; empty string sorts lowest)
    "slt_agg_string_minmax" ->
      """WITH t(s) AS (SELECT 'banana' UNION ALL SELECT '' UNION ALL
        |  SELECT 'Apple' UNION ALL SELECT CAST(NULL AS STRING) UNION ALL SELECT 'apple')
        |SELECT min(s) AS mn, max(s) AS mx, count(s) AS n FROM t""".stripMargin,

    // test/sql/aggregate/group/test_group_by.test: NULL group keys form
    // ONE group (grouping equality, not SQL equality)
    "slt_agg_null_group_key" ->
      """WITH t(k, v) AS (
        |  SELECT CAST(NULL AS INT), 1 UNION ALL SELECT CAST(NULL AS INT), 2
        |  UNION ALL SELECT 7, 3 UNION ALL SELECT 7, 4)
        |SELECT k, count(*) AS n, CAST(sum(v) AS BIGINT) AS s
        |FROM t GROUP BY k ORDER BY k NULLS FIRST""".stripMargin,

    // test/sql/aggregate/having/test_having.test: HAVING filters on
    // aggregate results incl. NULL-producing groups (NULL -> dropped)
    "slt_agg_having_null" ->
      """WITH t(g, v) AS (
        |  SELECT 'a', 5 UNION ALL SELECT 'a', 6
        |  UNION ALL SELECT 'b', CAST(NULL AS INT)
        |  UNION ALL SELECT 'c', 1)
        |SELECT g, CAST(sum(v) AS BIGINT) AS s
        |FROM t GROUP BY g HAVING sum(v) > 3 ORDER BY g""".stripMargin,

    // test/sql/aggregate/grouping_sets/grouping.test: GROUPING()
    // distinguishes a rollup-NULL from a data-NULL key
    "slt_grouping_null_vs_data" ->
      """WITH t(k, v) AS (
        |  SELECT CAST(NULL AS STRING), 1 UNION ALL SELECT 'x', 2 UNION ALL SELECT 'x', 3)
        |SELECT k, CAST(grouping(k) AS INT) AS is_total,
        |       CAST(sum(v) AS BIGINT) AS s
        |FROM t GROUP BY ROLLUP(k)
        |ORDER BY is_total, k NULLS FIRST""".stripMargin,

    // test/sql/aggregate/aggregates/test_avg.test: avg of ints is exact
    // double; single-row variance is NULL (sample) and 0 (population)
    "slt_agg_stat_edges" ->
      """WITH t(v) AS (SELECT 2 UNION ALL SELECT 4 UNION ALL SELECT 4 UNION ALL SELECT 6)
        |SELECT avg(v) AS av,
        |       round(stddev_pop(v), 6) AS sp,
        |       round(stddev_samp(v), 6) AS ss,
        |       (SELECT stddev_samp(x) FROM (SELECT 5 AS x) one) AS ss_one,
        |       (SELECT var_pop(x) FROM (SELECT 5 AS x) one) AS vp_one
        |FROM t""".stripMargin,

    // ------------------------------------------------------ distinct
    // test/sql/aggregate/distinct/test_distinct.test: SELECT DISTINCT
    // treats NULLs as equal (one NULL row survives)
    "slt_distinct_null_rows" ->
      """WITH t(a, b) AS (
        |  SELECT 1, CAST(NULL AS INT) UNION ALL SELECT 1, CAST(NULL AS INT)
        |  UNION ALL SELECT 1, 2 UNION ALL SELECT CAST(NULL AS INT), CAST(NULL AS INT)
        |  UNION ALL SELECT CAST(NULL AS INT), CAST(NULL AS INT))
        |SELECT DISTINCT a, b FROM t
        |ORDER BY a NULLS FIRST, b NULLS FIRST""".stripMargin,

    // ------------------------------------------------------- windows
    // test/sql/window/test_empty_frames.test: a frame holding zero rows:
    // count()=0, value aggregates NULL
    "slt_win_empty_frame" ->
      """WITH t(id, ch) AS (
        |  SELECT 1, 'A' UNION ALL SELECT 2, 'B' UNION ALL SELECT CAST(NULL AS INT), 'B')
        |SELECT id, ch,
        |  count(*) OVER w2 AS cnt_star,
        |  count(id) OVER w2 AS cnt_id,
        |  CAST(sum(id) OVER w2 AS BIGINT) AS s,
        |  min(id) OVER w2 AS mn,
        |  avg(id) OVER w2 AS av
        |FROM t
        |WINDOW w2 AS (PARTITION BY ch ORDER BY id NULLS FIRST
        |              ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING)
        |ORDER BY ch, id NULLS FIRST""".stripMargin,

    // test/sql/window/test_lead_lag.test: offsets past the partition edge
    // yield NULL or the explicit default; offset 0 is the row itself
    "slt_win_lead_lag_edges" ->
      """WITH t(p, i) AS (
        |  SELECT 'a', 1 UNION ALL SELECT 'a', 2 UNION ALL SELECT 'a', 3
        |  UNION ALL SELECT 'b', 10)
        |SELECT p, i,
        |  lag(i, 1) OVER w AS lag1,
        |  lag(i, 2, -1) OVER w AS lag2_dflt,
        |  lead(i, 1) OVER w AS lead1,
        |  lead(i, 5, -99) OVER w AS lead5_dflt,
        |  lag(i, 0) OVER w AS lag0
        |FROM t WINDOW w AS (PARTITION BY p ORDER BY i)
        |ORDER BY p, i""".stripMargin,

    // test/sql/window/test_nthvalue.test: nth_value beyond the frame is
    // NULL; first/last_value over the DEFAULT frame (peers included via
    // RANGE ... CURRENT ROW) vs an explicit full frame
    "slt_win_nth_first_last" ->
      """WITH t(i, v) AS (
        |  SELECT 1, 'a' UNION ALL SELECT 2, 'b' UNION ALL SELECT 3, 'c' UNION ALL SELECT 4, 'd')
        |SELECT i,
        |  first_value(v) OVER w AS fv,
        |  last_value(v) OVER w AS lv_default,
        |  last_value(v) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND UNBOUNDED FOLLOWING) AS lv_full,
        |  nth_value(v, 2) OVER w AS nth2,
        |  nth_value(v, 9) OVER w AS nth9
        |FROM t WINDOW w AS (ORDER BY i)
        |ORDER BY i""".stripMargin,

    // test/sql/window/test_rank.test + test_rank_orderby.test: ties share
    // rank/dense_rank/percent_rank; NULL order keys are peers of each other
    "slt_win_rank_ties_nulls" ->
      """WITH t(v) AS (
        |  SELECT 10 UNION ALL SELECT 10 UNION ALL SELECT 20
        |  UNION ALL SELECT CAST(NULL AS INT) UNION ALL SELECT CAST(NULL AS INT))
        |SELECT v,
        |  rank() OVER w AS rk,
        |  dense_rank() OVER w AS drk,
        |  round(percent_rank() OVER w, 6) AS prk,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM t WINDOW w AS (ORDER BY v NULLS FIRST)
        |ORDER BY v NULLS FIRST, rk""".stripMargin,

    // test/sql/window/test_ntile.test: uneven buckets front-load the
    // remainder; more buckets than rows degenerate to row_number
    "slt_win_ntile" ->
      """WITH t(i) AS (
        |  SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3 UNION ALL SELECT 4 UNION ALL SELECT 5)
        |SELECT i, CAST(ntile(2) OVER w AS INT) AS nt2,
        |       CAST(ntile(3) OVER w AS INT) AS nt3,
        |       CAST(ntile(9) OVER w AS INT) AS nt9
        |FROM t WINDOW w AS (ORDER BY i)
        |ORDER BY i""".stripMargin,

    // test/sql/window/test_basic_window.test: RANGE frames include ALL
    // peers of the boundary rows; ROWS frames do not
    "slt_win_range_vs_rows_peers" ->
      """WITH t(k, v) AS (
        |  SELECT 1, 100 UNION ALL SELECT 1, 200 UNION ALL SELECT 2, 300 UNION ALL SELECT 3, 400)
        |SELECT k, v,
        |  CAST(sum(v) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING
        |       AND CURRENT ROW) AS BIGINT) AS s_range,
        |  CAST(sum(v) OVER (ORDER BY k, v ROWS BETWEEN UNBOUNDED PRECEDING
        |       AND CURRENT ROW) AS BIGINT) AS s_rows
        |FROM t ORDER BY k, v""".stripMargin,

    // test/sql/window/test_boundary_expr.test: numeric RANGE offsets on
    // the order key (value-based, not row-based)
    "slt_win_range_numeric_bounds" ->
      """WITH t(v) AS (
        |  SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 4 UNION ALL SELECT 7 UNION ALL SELECT 8)
        |SELECT v,
        |  CAST(sum(v) OVER (ORDER BY v RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)
        |    AS s_near,
        |  count(*) OVER (ORDER BY v RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_back2
        |FROM t ORDER BY v""".stripMargin,

    // descending order with explicit NULL placement: frames follow the
    // sort direction (test/sql/window/test_constant_orderby.test family)
    "slt_win_desc_running" ->
      """WITH t(v) AS (
        |  SELECT 5 UNION ALL SELECT 3 UNION ALL SELECT CAST(NULL AS INT) UNION ALL SELECT 1)
        |SELECT v,
        |  count(*) OVER (ORDER BY v DESC NULLS LAST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rn_like,
        |  CAST(sum(v) OVER (ORDER BY v DESC NULLS LAST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_s
        |FROM t ORDER BY v DESC NULLS LAST""".stripMargin,

    // --------------------------------------------------------- joins
    // test/sql/join/inner/test_join.test: NULL keys never equal — inner
    // join drops them, even NULL = NULL
    "slt_join_null_keys_inner" ->
      """WITH l(k, lv) AS (
        |  SELECT 1, 'l1' UNION ALL SELECT CAST(NULL AS INT), 'ln' UNION ALL SELECT 2, 'l2'),
        |r(k, rv) AS (
        |  SELECT 1, 'r1' UNION ALL SELECT CAST(NULL AS INT), 'rn' UNION ALL SELECT 3, 'r3')
        |SELECT l.k AS k, l.lv AS lv, r.rv AS rv
        |FROM l JOIN r ON l.k = r.k
        |ORDER BY k""".stripMargin,

    // test/sql/join/left_outer/test_left_outer.test: unmatched left rows
    // (incl. NULL keys) survive null-padded
    "slt_join_null_keys_left" ->
      """WITH l(k, lv) AS (
        |  SELECT 1, 'l1' UNION ALL SELECT CAST(NULL AS INT), 'ln' UNION ALL SELECT 2, 'l2'),
        |r(k, rv) AS (SELECT 1, 'r1')
        |SELECT l.k AS k, l.lv AS lv, r.rv AS rv
        |FROM l LEFT JOIN r ON l.k = r.k
        |ORDER BY k NULLS FIRST, lv""".stripMargin,

    // test/sql/join/full_outer/full_outer_join_cache.test: duplicate keys
    // multiply (2x2=4 matched rows) and both dangling sides survive
    "slt_join_full_dup_keys" ->
      """WITH l(k, lv) AS (
        |  SELECT 1, 'a' UNION ALL SELECT 1, 'b' UNION ALL SELECT 2, 'c'),
        |r(k, rv) AS (
        |  SELECT 1, 'x' UNION ALL SELECT 1, 'y' UNION ALL SELECT 3, 'z')
        |SELECT l.k AS lk, l.lv AS lv, r.k AS rk, r.rv AS rv
        |FROM l FULL JOIN r ON l.k = r.k
        |ORDER BY lk NULLS FIRST, lv NULLS FIRST, rk NULLS FIRST, rv NULLS FIRST""".stripMargin,

    // joins against an EMPTY side: inner/semi empty, left null-padded,
    // anti passes everything (test/sql/join/test_empty_joins.test shape)
    "slt_join_empty_side" ->
      """WITH l(k) AS (SELECT 1 UNION ALL SELECT 2),
        |e(k) AS (SELECT CAST(NULL AS INT) WHERE 1 = 0)
        |SELECT
        |  (SELECT count(*) FROM l JOIN e ON l.k = e.k) AS n_inner,
        |  (SELECT count(*) FROM l LEFT JOIN e ON l.k = e.k) AS n_left,
        |  (SELECT count(*) FROM l WHERE EXISTS (SELECT 1 FROM e WHERE e.k = l.k)) AS n_semi,
        |  (SELECT count(*) FROM l WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.k = l.k)) AS n_anti,
        |  (SELECT count(*) FROM l CROSS JOIN e) AS n_cross""".stripMargin,

    // test/sql/subquery/any_all/test_correlated_any_all.test (NOT IN
    // face): a NULL in the NOT IN list voids every row
    "slt_join_not_in_null" ->
      """WITH l(k) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
        |r(k) AS (SELECT 1 UNION ALL SELECT CAST(NULL AS INT))
        |SELECT
        |  (SELECT count(*) FROM l WHERE l.k NOT IN (SELECT k FROM r)) AS n_not_in_with_null,
        |  (SELECT count(*) FROM l WHERE l.k NOT IN (SELECT k FROM r WHERE k IS NOT NULL))
        |    AS n_not_in_clean,
        |  (SELECT count(*) FROM l WHERE l.k IN (SELECT k FROM r)) AS n_in""".stripMargin,

    // non-equi join: NULL comparisons are UNKNOWN -> no match
    // (test/sql/join/iejoin/test_iejoin.test family)
    "slt_join_nonequi_null" ->
      """WITH l(a) AS (SELECT 1 UNION ALL SELECT 5 UNION ALL SELECT CAST(NULL AS INT)),
        |r(b) AS (SELECT 3 UNION ALL SELECT CAST(NULL AS INT))
        |SELECT l.a AS a, r.b AS b
        |FROM l JOIN r ON l.a < r.b
        |ORDER BY a, b""".stripMargin,

    // ----------------------------------------------------- subqueries
    // test/sql/subquery/scalar/test_scalar_subquery.test: a scalar
    // subquery over zero rows is NULL (not an error, not zero)
    "slt_sub_scalar_empty" ->
      """WITH t(i) AS (SELECT 1 UNION ALL SELECT 2)
        |SELECT
        |  (SELECT i FROM t WHERE i > 100) AS empty_scalar,
        |  (SELECT max(i) FROM t WHERE i > 100) AS empty_max,
        |  (SELECT count(*) FROM t WHERE i > 100) AS empty_count""".stripMargin,

    // test/sql/subquery/exists/test_correlated_exists.test: correlated
    // existence per row (count-based form — dialect-identical; EXISTS in
    // a projection is not portable Spark SQL)
    "slt_sub_correlated_exists" ->
      """WITH t1(i) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
        |t2(j) AS (SELECT 2 UNION ALL SELECT 3 UNION ALL SELECT 3)
        |SELECT i,
        |  (SELECT count(*) FROM t2 WHERE t2.j = t1.i) > 0 AS has_match,
        |  (SELECT count(*) FROM t2 WHERE t2.j = t1.i) = 0 AS no_match
        |FROM t1 ORDER BY i""".stripMargin,

    // test/sql/subquery/test_neumann.test: correlated scalar aggregate —
    // count over an empty correlation is 0, sum is NULL
    "slt_sub_correlated_agg" ->
      """WITH t1(i) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
        |t2(j) AS (SELECT 1 UNION ALL SELECT 1 UNION ALL SELECT 2)
        |SELECT i,
        |  (SELECT count(*) FROM t2 WHERE t2.j < t1.i) AS n_less,
        |  (SELECT CAST(sum(j) AS BIGINT) FROM t2 WHERE t2.j < t1.i) AS s_less
        |FROM t1 ORDER BY i""".stripMargin,

    // IN over a literal list with NULLs: x IN (a, NULL) is NULL unless
    // matched; NOT IN (a, NULL) passes nothing
    // (test/sql/subquery/any_all/test_any_all.test NULL-semantics face)
    "slt_sub_in_null_probe" ->
      """WITH t(i) AS (SELECT 1 UNION ALL SELECT CAST(NULL AS INT) UNION ALL SELECT 3)
        |SELECT
        |  (SELECT count(*) FROM t WHERE t.i IN (1, 2)) AS n_in_list,
        |  (SELECT count(*) FROM t WHERE t.i IN (1, NULL)) AS n_in_null_list,
        |  (SELECT count(*) FROM t WHERE t.i NOT IN (1, NULL)) AS n_not_in_null_list,
        |  (SELECT count(*) FROM t WHERE t.i NOT IN (5, 6)) AS n_not_in_clean""".stripMargin,

    // ------------------------------------------------------- set ops
    // test/sql/setops/test_union.test: UNION dedups across NULLs; UNION
    // ALL keeps multiplicity
    "slt_setop_union_nulls" ->
      """WITH a(v) AS (SELECT 1 UNION ALL SELECT CAST(NULL AS INT) UNION ALL SELECT 1),
        |b(v) AS (SELECT CAST(NULL AS INT) UNION ALL SELECT 2)
        |SELECT
        |  (SELECT count(*) FROM (SELECT v FROM a UNION SELECT v FROM b) u) AS n_union,
        |  (SELECT count(*) FROM (SELECT v FROM a UNION ALL SELECT v FROM b) ua) AS n_union_all""".stripMargin,

    // test/sql/setops/test_intersect.test + test_except.test: bag
    // semantics of INTERSECT ALL / EXCEPT ALL, NULLs compare equal
    "slt_setop_bag_semantics" ->
      """WITH a(v) AS (SELECT 1 UNION ALL SELECT 1 UNION ALL SELECT 1
        |  UNION ALL SELECT 2 UNION ALL SELECT CAST(NULL AS INT) UNION ALL SELECT CAST(NULL AS INT)),
        |b(v) AS (SELECT 1 UNION ALL SELECT 1 UNION ALL SELECT 3 UNION ALL SELECT CAST(NULL AS INT))
        |SELECT
        |  (SELECT count(*) FROM (SELECT v FROM a INTERSECT ALL SELECT v FROM b) i) AS n_int_all,
        |  (SELECT count(*) FROM (SELECT v FROM a EXCEPT ALL SELECT v FROM b) e) AS n_exc_all,
        |  (SELECT count(*) FROM (SELECT v FROM a INTERSECT SELECT v FROM b) i2) AS n_int,
        |  (SELECT count(*) FROM (SELECT v FROM a EXCEPT SELECT v FROM b) e2) AS n_exc""".stripMargin,

    // ---------------------------------------------------- types/casts
    // test/sql/cast/test_try_cast.test: TRY_CAST turns malformed and
    // out-of-range inputs into NULL instead of raising
    "slt_cast_try_edges" ->
      """WITH t(s) AS (SELECT '123' UNION ALL SELECT 'abc' UNION ALL
        |  SELECT '99999999999999999999' UNION ALL SELECT CAST(NULL AS STRING))
        |SELECT s,
        |  TRY_CAST(s AS INT) AS as_int,
        |  TRY_CAST(s AS BIGINT) AS as_big,
        |  TRY_CAST(s AS DOUBLE) AS as_dbl
        |FROM t ORDER BY s NULLS FIRST""".stripMargin,

    // smallint/int overflow boundaries through TRY_CAST
    "slt_cast_overflow_bounds" ->
      """WITH t(v) AS (SELECT 32767 UNION ALL SELECT 32768
        |  UNION ALL SELECT -32768 UNION ALL SELECT -32769)
        |SELECT v,
        |  CAST(TRY_CAST(v AS SMALLINT) AS INT) AS as_small,
        |  TRY_CAST(v AS INT) AS as_int
        |FROM t ORDER BY v""".stripMargin,

    // NaN casts and equality: NaN = NaN is true in both engines' total
    // order for grouping/distinct (test/sql/types/float/nan_cast.test)
    "slt_float_nan" ->
      """WITH t(s) AS (SELECT 'NaN' UNION ALL SELECT '1.5' UNION ALL SELECT 'junk')
        |SELECT s, TRY_CAST(s AS DOUBLE) AS d,
        |  isnan(coalesce(TRY_CAST(s AS DOUBLE), 0.0)) AS is_nan
        |FROM t ORDER BY s""".stripMargin,

    // test/sql/function/generic/test_least_greatest.test: NULLs are
    // skipped; all-NULL yields NULL
    "slt_least_greatest_nulls" ->
      """WITH t(a, b) AS (
        |  SELECT 1, 9 UNION ALL SELECT CAST(NULL AS INT), 5
        |  UNION ALL SELECT CAST(NULL AS INT), CAST(NULL AS INT))
        |SELECT a, b,
        |  least(a, b) AS lo, greatest(a, b) AS hi
        |FROM t ORDER BY a NULLS FIRST, b NULLS FIRST""".stripMargin,

    // NULLIF / COALESCE / two-arg fallbacks (test/sql/function/generic)
    "slt_nullif_coalesce" ->
      """WITH t(v) AS (SELECT 0 UNION ALL SELECT 5 UNION ALL SELECT CAST(NULL AS INT))
        |SELECT v,
        |  nullif(v, 0) AS nz,
        |  coalesce(v, -1) AS co,
        |  coalesce(nullif(v, 0), -1) AS co_nz,
        |  round(CAST(10 AS DOUBLE) / nullif(v, 0), 6) AS safe_div
        |FROM t ORDER BY v NULLS FIRST""".stripMargin,

    // searched CASE: NULL conditions fall through; no ELSE -> NULL
    // (test/sql/function/generic/test_case.test)
    "slt_case_null_fallthrough" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT CAST(NULL AS INT) UNION ALL SELECT 10)
        |SELECT v,
        |  CASE WHEN v > 5 THEN 'big' WHEN v <= 5 THEN 'small' END AS c_no_else,
        |  CASE WHEN v > 5 THEN 'big' ELSE 'other' END AS c_else,
        |  CASE WHEN v IS NULL THEN 'null' WHEN v > 5 THEN 'big' ELSE 'small' END AS c_guard
        |FROM t ORDER BY v NULLS FIRST""".stripMargin,

    // string || NULL is NULL in both dialects
    "slt_string_concat_null" ->
      """WITH t(s) AS (SELECT 'a' UNION ALL SELECT CAST(NULL AS STRING))
        |SELECT s, s || '_x' AS with_suffix, 'pre_' || s || '_post' AS wrapped
        |FROM t ORDER BY s NULLS FIRST""".stripMargin,

    // -------------------------------------------- three-valued logic
    // test/sql/conjunction/test_conjunction.test: UNKNOWN short-circuit:
    // (true OR NULL) is true, (false AND NULL) is false, NOT NULL is NULL
    "slt_threevalued_logic" ->
      """WITH t(a, b) AS (
        |  SELECT true, CAST(NULL AS BOOLEAN) UNION ALL
        |  SELECT false, CAST(NULL AS BOOLEAN) UNION ALL
        |  SELECT CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN))
        |SELECT a, b,
        |  (a OR b) AS a_or_b,
        |  (a AND b) AS a_and_b,
        |  (NOT a) AS not_a
        |FROM t ORDER BY a NULLS FIRST""".stripMargin,

    // WHERE drops UNKNOWN rows: x > NULL never passes; IS DISTINCT FROM
    // is the null-safe comparison (test/sql/filter/test_nulls.test)
    "slt_where_unknown_drops" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT CAST(NULL AS INT) UNION ALL SELECT 3)
        |SELECT
        |  (SELECT count(*) FROM t WHERE v > 0) AS n_gt,
        |  (SELECT count(*) FROM t WHERE NOT (v > 0)) AS n_not_gt,
        |  (SELECT count(*) FROM t WHERE v IS DISTINCT FROM 1) AS n_distinct_from,
        |  (SELECT count(*) FROM t WHERE v IS NOT DISTINCT FROM NULL) AS n_is_null_safe""".stripMargin,

    // ---------------------------------------------------- order/limit
    // test/sql/order/test_order_by.test: explicit NULLS FIRST/LAST in
    // both directions (defaults differ between the engines — pin them)
    "slt_order_nulls_explicit" ->
      """WITH t(v) AS (SELECT 2 UNION ALL SELECT CAST(NULL AS INT) UNION ALL SELECT 1)
        |SELECT
        |  (SELECT coalesce(v, -1) FROM t ORDER BY v ASC NULLS FIRST LIMIT 1) AS h_asc_nf,
        |  (SELECT coalesce(v, -1) FROM t ORDER BY v ASC NULLS LAST LIMIT 1) AS h_asc_nl,
        |  (SELECT coalesce(v, -1) FROM t ORDER BY v DESC NULLS FIRST LIMIT 1) AS h_desc_nf,
        |  (SELECT coalesce(v, -1) FROM t ORDER BY v DESC NULLS LAST LIMIT 1) AS h_desc_nl""".stripMargin,

    // test/sql/limit/test_limit.test: LIMIT 0, OFFSET past the end, and
    // LIMIT larger than the input
    "slt_limit_offset_edges" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT
        |  (SELECT count(*) FROM (SELECT v FROM t ORDER BY v LIMIT 0) a) AS n_limit0,
        |  (SELECT count(*) FROM (SELECT v FROM t ORDER BY v LIMIT 10) b) AS n_limit_big,
        |  (SELECT count(*) FROM (SELECT v FROM t ORDER BY v LIMIT 2 OFFSET 5) c) AS n_off_past,
        |  (SELECT CAST(sum(v) AS BIGINT) FROM (SELECT v FROM t ORDER BY v LIMIT 2 OFFSET 1) d)
        |    AS s_off1""".stripMargin,

    // ---------------------------------------------------- dates/times
    // test/sql/types/date/date_arithmetic shape: adding months CLAMPS to
    // the last day of the target month (leap years included)
    "slt_date_month_clamp" ->
      """WITH t(d) AS (SELECT DATE '2024-01-31' UNION ALL SELECT DATE '2024-01-29'
        |  UNION ALL SELECT DATE '2023-01-31' UNION ALL SELECT DATE '2024-02-29')
        |SELECT d, CAST(d + INTERVAL 1 MONTH AS DATE) AS plus_1m,
        |       CAST(d + INTERVAL 12 MONTH AS DATE) AS plus_12m
        |FROM t ORDER BY d""".stripMargin,

    // test/sql/function/timestamp/date_part: field extraction agrees on
    // the standard fields, leap day and end-of-year included
    "slt_date_part_fields" ->
      """WITH t(ts) AS (SELECT TIMESTAMP '2024-02-29 13:45:59'
        |  UNION ALL SELECT TIMESTAMP '1999-12-31 00:00:01')
        |SELECT CAST(date_part('year', ts) AS BIGINT) AS y,
        |       CAST(date_part('quarter', ts) AS BIGINT) AS q,
        |       CAST(date_part('month', ts) AS BIGINT) AS mo,
        |       CAST(date_part('day', ts) AS BIGINT) AS d,
        |       CAST(date_part('hour', ts) AS BIGINT) AS h,
        |       CAST(date_part('minute', ts) AS BIGINT) AS mi,
        |       CAST(date_part('second', ts) AS BIGINT) AS s
        |FROM t ORDER BY ts""".stripMargin,

    // ---------------------------------------------------- strings
    // test/sql/function/string/test_pad.test: pad TRUNCATES when the
    // target is shorter, multi-char pads repeat; repeat(s, 0) is empty
    "slt_string_pad_repeat" ->
      """SELECT lpad('abc', 2, 'x') AS lp_trunc, lpad('abc', 7, 'xy') AS lp_fill,
        |       rpad('abc', 6, 'z') AS rp_fill, lpad('abc', 0, 'x') AS lp_zero,
        |       repeat('ab', 0) AS rep0, repeat('ab', 3) AS rep3""".stripMargin,

    // test/sql/function/string/test_like.test: '_'/'%' wildcards, a
    // custom ESCAPE character, the empty pattern, case sensitivity
    "slt_like_escape" ->
      """WITH t(s) AS (SELECT 'a_c' UNION ALL SELECT 'abc' UNION ALL SELECT 'a%c'
        |  UNION ALL SELECT 'ABC' UNION ALL SELECT '')
        |SELECT s, s LIKE 'a_c' AS like_us, s LIKE 'a!_c' ESCAPE '!' AS like_esc_us,
        |       s LIKE '%' AS like_any, s LIKE '' AS like_empty,
        |       s LIKE 'A%' AS like_case
        |FROM t ORDER BY s""".stripMargin,

    // test/sql/function/string/test_substring.test: length past the end
    // clips, zero length is empty, start past the end is empty
    "slt_substring_bounds" ->
      """SELECT substring('hello', 2, 3) AS mid, substring('hello', 2, 100) AS over,
        |       substring('hello', 2, 0) AS zero_len, substring('hello', 6, 2) AS past,
        |       substring('', 1, 3) AS empty_src,
        |       CAST(length(substring('hello', 3)) AS BIGINT) AS tail_len""".stripMargin,

    // default collation is binary codepoint order: digits < uppercase
    // < lowercase (test/sql/order/test_order_by.test)
    "slt_order_binary_case" ->
      """WITH t(s) AS (SELECT 'a' UNION ALL SELECT 'B' UNION ALL SELECT 'Z'
        |  UNION ALL SELECT 'b' UNION ALL SELECT '0')
        |SELECT s FROM t ORDER BY s""".stripMargin,

    // ---------------------------------------------------- predicates
    // test/sql/subquery/test_in.test: an in-list containing NULL — IN
    // stays true on a hit, NOT IN collapses to UNKNOWN on a miss
    "slt_in_list_null" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT CAST(NULL AS INT))
        |SELECT
        |  (SELECT count(*) FROM t WHERE v IN (1, NULL)) AS n_in_with_null,
        |  (SELECT count(*) FROM t WHERE v NOT IN (1, NULL)) AS n_not_in_with_null,
        |  (SELECT count(*) FROM t WHERE v IN (1, 2)) AS n_in_plain,
        |  (SELECT count(*) FROM t WHERE v NOT IN (3)) AS n_not_in_miss""".stripMargin,

    // ---------------------------------------------------- aggregation
    // GROUPING SETS (()) is the explicit global group: one row even
    // though no grouping column exists (Spark's parser rejects the bare
    // `GROUP BY ()` spelling; the grouping-sets form is common ground —
    // test/sql/aggregate/group/test_group_by.test)
    "slt_groupby_unit" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS s
        |FROM t GROUP BY GROUPING SETS (())""".stripMargin,

    // min/max are defined on booleans (false < true) and dates; NULLs skip
    "slt_minmax_bool_date" ->
      """WITH t(b, d) AS (SELECT true, DATE '2001-09-09'
        |  UNION ALL SELECT false, DATE '1999-01-01'
        |  UNION ALL SELECT CAST(NULL AS BOOLEAN), CAST(NULL AS DATE))
        |SELECT min(b) AS mn_b, max(b) AS mx_b, min(d) AS mn_d, max(d) AS mx_d,
        |       count(b) AS n_b
        |FROM t""".stripMargin,

    // ---------------------------------------------------- arithmetic
    // decimal .5 boundaries round HALF AWAY FROM ZERO in both engines,
    // negatives included (test/sql/function/numeric/test_round.test)
    "slt_round_half" ->
      """SELECT CAST(round(2.5) AS DOUBLE) AS r_25, CAST(round(3.5) AS DOUBLE) AS r_35,
        |       CAST(round(-2.5) AS DOUBLE) AS r_m25,
        |       CAST(round(2.45, 1) AS DOUBLE) AS r_245,
        |       CAST(round(-1.005, 2) AS DOUBLE) AS r_m1005""".stripMargin,

    // exact decimal arithmetic: scale grows per the operation, values
    // exact to the last digit (test/sql/types/decimal/decimal_arithmetic.test).
    // The arithmetic stays DECIMAL; the projection goes through DOUBLE because
    // the two harness paths render DECIMAL scales differently (r5 red row) —
    // every value here is exactly representable in a double.
    "slt_decimal_arith" ->
      """WITH t(a, b) AS (
        |  SELECT CAST('123456.789' AS DECIMAL(18,3)), CAST('0.001' AS DECIMAL(18,3))
        |  UNION ALL
        |  SELECT CAST('-0.005' AS DECIMAL(18,3)), CAST('2.500' AS DECIMAL(18,3)))
        |SELECT CAST(CAST(a + b AS DECIMAL(20,3)) AS DOUBLE) AS s,
        |       CAST(CAST(a - b AS DECIMAL(20,3)) AS DOUBLE) AS d,
        |       CAST(CAST(a * b AS DECIMAL(25,6)) AS DOUBLE) AS p
        |FROM t ORDER BY a""".stripMargin,

    // int UNION decimal promotes — the fractional part must survive
    "slt_union_type_promote" ->
      """WITH a(x) AS (SELECT 1 UNION ALL SELECT 2), b(x) AS (SELECT 2.5)
        |SELECT CAST(sum(x) AS DOUBLE) AS s, count(*) AS n
        |FROM (SELECT x FROM a UNION ALL SELECT x FROM b) u""".stripMargin,

    // ---------------------------------------------------- joins/setops
    // cross-join cardinality is m·n; an empty side annihilates
    "slt_cross_join_card" ->
      """WITH a(x) AS (SELECT 1 UNION ALL SELECT 2),
        |     b(y) AS (SELECT 10 UNION ALL SELECT 20 UNION ALL SELECT 30),
        |     e(z) AS (SELECT 1 WHERE 1 = 0)
        |SELECT
        |  (SELECT count(*) FROM a CROSS JOIN b) AS n_ab,
        |  (SELECT count(*) FROM a CROSS JOIN e) AS n_ae,
        |  (SELECT CAST(sum(x * y) AS BIGINT) FROM a CROSS JOIN b) AS s_xy""".stripMargin,

    // set ops treat NULLs as EQUAL (unlike = comparison): NULL intersects
    // with NULL, EXCEPT removes it (test/sql/setops/test_setops_nulls)
    "slt_setop_null_rows" ->
      """WITH a(v) AS (SELECT 1 UNION ALL SELECT CAST(NULL AS INT)
        |  UNION ALL SELECT CAST(NULL AS INT)),
        |     b(v) AS (SELECT CAST(NULL AS INT) UNION ALL SELECT 2)
        |SELECT 'exc' AS tag, coalesce(v, -99) AS v
        |FROM (SELECT v FROM a EXCEPT SELECT v FROM b) e
        |UNION ALL
        |SELECT 'int' AS tag, coalesce(v, -99) AS v
        |FROM (SELECT v FROM a INTERSECT SELECT v FROM b) i
        |ORDER BY tag, v""".stripMargin,

    // the DEFAULT window frame is RANGE UNBOUNDED..CURRENT: ORDER BY
    // ties (peers) aggregate TOGETHER, unlike the explicit ROWS frame —
    // whose ORDER BY here is totalized (k, v): a ROWS frame over a
    // tie-bearing sort is UNDERDETERMINED and both engines answer
    // arbitrarily (test/sql/window/test_window_range.test)
    "slt_win_running_dups" ->
      """WITH t(g, k, v) AS (SELECT 1, 1, 10 UNION ALL SELECT 1, 1, 20
        |  UNION ALL SELECT 1, 2, 30 UNION ALL SELECT 1, 3, 40)
        |SELECT g, k, v,
        |  CAST(sum(v) OVER (PARTITION BY g ORDER BY k) AS BIGINT) AS run_default,
        |  CAST(sum(v) OVER (PARTITION BY g ORDER BY k, v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_rows
        |FROM t ORDER BY g, k, v""".stripMargin,

    // a NULL partition key forms its own (single) partition
    "slt_win_partition_null" ->
      """WITH t(p, v) AS (SELECT 'a', 1 UNION ALL SELECT CAST(NULL AS STRING), 2
        |  UNION ALL SELECT CAST(NULL AS STRING), 3)
        |SELECT coalesce(p, '<null>') AS pk,
        |       CAST(count(*) OVER (PARTITION BY p) AS BIGINT) AS n, v
        |FROM t ORDER BY pk, v""".stripMargin,

    // HAVING without GROUP BY makes the query a one-group global
    // aggregate (test/sql/aggregate/having/test_having.test)
    "slt_having_no_groupby" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT CAST(sum(v) AS BIGINT) AS s, count(*) AS n
        |FROM t HAVING sum(v) > 0""".stripMargin,

    // ANSI trim forms: BOTH/LEADING/TRAILING with a custom trim char
    "slt_trim_variants" ->
      """SELECT trim('  pad  ') AS t_space,
        |       trim(BOTH 'x' FROM 'xxaxbxx') AS t_both,
        |       trim(LEADING 'x' FROM 'xxaxx') AS t_lead,
        |       trim(TRAILING 'x' FROM 'xxaxx') AS t_trail,
        |       trim(BOTH 'x' FROM 'xxxx') AS t_all""".stripMargin,

    // BETWEEN with a NULL bound is UNKNOWN, never true
    "slt_between_nulls" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 5 UNION ALL SELECT CAST(NULL AS INT))
        |SELECT
        |  (SELECT count(*) FROM t WHERE v BETWEEN 1 AND 5) AS n_in,
        |  (SELECT count(*) FROM t WHERE v NOT BETWEEN 2 AND 3) AS n_out,
        |  (SELECT count(*) FROM t WHERE v BETWEEN NULL AND 5) AS n_null_lo""".stripMargin,

    // EXISTS is about ROW existence: a subquery yielding one all-NULL
    // row is still TRUE (test/sql/subquery/exists)
    "slt_exists_null_rows" ->
      """WITH t(v) AS (SELECT CAST(NULL AS INT))
        |SELECT
        |  (SELECT count(*) FROM (SELECT 1 AS one) x
        |     WHERE EXISTS (SELECT v FROM t)) AS ex_null_row,
        |  (SELECT count(*) FROM (SELECT 1 AS one) x
        |     WHERE EXISTS (SELECT v FROM t WHERE v IS NOT NULL)) AS ex_empty""".stripMargin,

    // modulo sign follows the DIVIDEND in both engines
    // (test/sql/function/numeric/test_mod.test)
    "slt_mod_negative" ->
      """SELECT -7 % 3 AS a, 7 % -3 AS b, -7 % -3 AS c,
        |       CAST(mod(-7, -3) AS INT) AS d, 7 % 3 AS e""".stripMargin,

    // floor/ceil of negatives round toward/away from zero correctly
    // (DuckDB returns DECIMAL, Spark BIGINT — cast pins the values)
    "slt_floor_ceil_neg" ->
      """SELECT CAST(floor(-1.5) AS BIGINT) AS f_neg,
        |       CAST(ceil(-1.5) AS BIGINT) AS c_neg,
        |       CAST(floor(2.5) AS BIGINT) AS f_pos,
        |       CAST(ceil(2.5) AS BIGINT) AS c_pos,
        |       CAST(floor(-3.0) AS BIGINT) AS f_exact""".stripMargin,

    // round to NEGATIVE digits rounds whole-number positions
    "slt_round_negative_digits" ->
      """SELECT CAST(round(1234.567, -2) AS DOUBLE) AS r_hund,
        |       CAST(round(1234.567, -1) AS DOUBLE) AS r_tens,
        |       CAST(round(1234.567, 0) AS DOUBLE) AS r_unit,
        |       CAST(round(-1250.0, -2) AS DOUBLE) AS r_neg""".stripMargin,

    // bitwise AND/OR/NOT on ints (shift operators differ in dialect:
    // Spark spells them shiftleft(), DuckDB <<, so they are not shared)
    "slt_bit_and_or_not" ->
      """SELECT 5 & 3 AS b_and, 5 | 3 AS b_or, ~5 AS b_not,
        |       12 & 10 AS b_and2, (1 | 2 | 4) & 6 AS b_mix""".stripMargin,

    // split_part: 1-based, out-of-range yields EMPTY STRING (not NULL)
    "slt_split_part_edges" ->
      """SELECT split_part('a,b,c', ',', 2) AS mid,
        |       split_part('a,b', ',', 5) AS past_end,
        |       split_part('', ',', 1) AS empty_src,
        |       split_part('x', ',', 1) AS no_delim""".stripMargin,

    // instr / position: 1-based, 0 when absent
    "slt_instr_position" ->
      """SELECT instr('hello', 'l') AS first_l,
        |       instr('hello', 'z') AS absent,
        |       position('l' IN 'hello') AS pos_l,
        |       instr('', 'x') AS empty_src""".stripMargin,

    // left/right clamp to the string length; lpad/rpad TRUNCATE when the
    // target is shorter, and a multi-char pad cycles
    "slt_left_right_pad" ->
      """SELECT left('hello', 2) AS l2, right('hello', 2) AS r2,
        |       left('ab', 10) AS l_clamp, right('ab', 10) AS r_clamp,
        |       lpad('abcdef', 3, 'x') AS lpad_trunc,
        |       lpad('a', 4, 'xy') AS lpad_cycle,
        |       rpad('a', 4, 'xy') AS rpad_cycle""".stripMargin,

    // percent_rank is (rank-1)/(n-1) with a 0 for the single-row
    // partition; cume_dist counts peers inclusively
    // (test/sql/window/test_percent_rank.test, test_cume_dist.test)
    "slt_win_percent_cume" ->
      """WITH t(g, v) AS (
        |  SELECT 'a', 10 UNION ALL SELECT 'a', 20 UNION ALL SELECT 'a', 20
        |  UNION ALL SELECT 'a', 40 UNION ALL SELECT 'b', 7)
        |SELECT g, v,
        |       CAST(round(percent_rank() OVER (PARTITION BY g ORDER BY v), 4)
        |         AS DOUBLE) AS pr,
        |       CAST(round(cume_dist() OVER (PARTITION BY g ORDER BY v), 4)
        |         AS DOUBLE) AS cd
        |FROM t ORDER BY g, v, pr""".stripMargin,

    // aggregate OF an aggregate via a derived table (the only legal way)
    "slt_nested_agg_subquery" ->
      """WITH t(g, v) AS (
        |  SELECT 'a', 1 UNION ALL SELECT 'a', 2 UNION ALL SELECT 'b', 10
        |  UNION ALL SELECT 'c', CAST(NULL AS INT))
        |SELECT CAST(max(s) AS BIGINT) AS max_group_sum,
        |       CAST(min(s) AS BIGINT) AS min_group_sum,
        |       count(s) AS n_groups_with_sum
        |FROM (SELECT g, sum(v) AS s FROM t GROUP BY g) x""".stripMargin,

    // correlated scalar subquery in the SELECT list; empty match -> NULL
    "slt_scalar_subquery_select" ->
      """WITH t(g) AS (SELECT 'a' UNION ALL SELECT 'b' UNION ALL SELECT 'c'),
        |     u(g, v) AS (SELECT 'a', 1 UNION ALL SELECT 'a', 2 UNION ALL SELECT 'b', 5)
        |SELECT t.g,
        |       (SELECT CAST(sum(u.v) AS BIGINT) FROM u WHERE u.g = t.g) AS s,
        |       (SELECT count(*) FROM u WHERE u.g = t.g) AS n
        |FROM t ORDER BY t.g""".stripMargin,

    // VALUES as an inline FROM relation with column aliases
    "slt_values_from_clause" ->
      """SELECT i, s FROM (VALUES (2, 'b'), (1, 'a'), (3, NULL)) AS t(i, s)
        |ORDER BY i""".stripMargin,

    // HAVING may reference an aggregate that is NOT in the SELECT list
    "slt_having_hidden_agg" ->
      """WITH t(g, v) AS (
        |  SELECT 'a', 1 UNION ALL SELECT 'a', 5 UNION ALL SELECT 'b', 2)
        |SELECT g FROM t GROUP BY g HAVING sum(v) > 3 ORDER BY g""".stripMargin,

    // GROUP BY an expression, selecting that same expression
    "slt_group_by_expr" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3
        |  UNION ALL SELECT 4 UNION ALL SELECT 5)
        |SELECT v % 2 AS parity, count(*) AS n, CAST(sum(v) AS BIGINT) AS s
        |FROM t GROUP BY v % 2 ORDER BY parity""".stripMargin,

    // string -> boolean casts both engines accept: 'true'/'false'/'1'/'0'
    "slt_cast_string_bool" ->
      """SELECT CAST('true' AS BOOLEAN) AS b_true,
        |       CAST('false' AS BOOLEAN) AS b_false,
        |       CAST('1' AS BOOLEAN) AS b_one,
        |       CAST('0' AS BOOLEAN) AS b_zero""".stripMargin,

    // concat_ws SKIPS NULL arguments (unlike ||, which nulls out)
    "slt_concat_ws_null" ->
      """SELECT concat_ws(',', 'a', NULL, 'b') AS skip_mid,
        |       concat_ws('-', NULL, NULL) AS all_null,
        |       concat_ws('', 'x', 'y') AS empty_sep""".stripMargin,

    // int sums promote past 32-bit without overflow (Spark -> BIGINT,
    // DuckDB -> HUGEINT; the cast meets in the middle)
    "slt_sum_int_promotion" ->
      """WITH t(v) AS (SELECT 2147483647 UNION ALL SELECT 2147483647
        |  UNION ALL SELECT 2)
        |SELECT CAST(sum(v) AS BIGINT) AS s, count(*) AS n FROM t""".stripMargin,

    // date + INTERVAL day arithmetic across a leap day (DuckDB yields
    // TIMESTAMP, Spark DATE — cast pins both)
    "slt_date_interval_day" ->
      """SELECT CAST(DATE '2000-02-28' + INTERVAL 1 DAY AS DATE) AS leap_next,
        |       CAST(DATE '2000-03-01' - INTERVAL 1 DAY AS DATE) AS leap_back,
        |       CAST(DATE '2001-02-28' + INTERVAL 1 DAY AS DATE) AS noleap_next,
        |       last_day(DATE '2000-02-15') AS leap_last""".stripMargin,

    // GROUP BY ALL / ORDER BY ALL (both dialects grow the shorthand)
    "slt_group_order_all" ->
      """WITH t(g, h, v) AS (
        |  SELECT 'a', 1, 10 UNION ALL SELECT 'a', 1, 20
        |  UNION ALL SELECT 'b', 2, 5)
        |SELECT g, h, CAST(sum(v) AS BIGINT) AS s, count(*) AS n
        |FROM t GROUP BY ALL ORDER BY ALL""".stripMargin,

    // lateral column alias: a SELECT item referencing an earlier alias
    "slt_lateral_alias" ->
      """WITH t(v) AS (SELECT 3 UNION ALL SELECT 7)
        |SELECT v, v * 2 AS dbl, dbl + 1 AS dbl_plus
        |FROM t ORDER BY v""".stripMargin,

    // regexp_extract: explicit group index; no-match yields EMPTY string
    "slt_regexp_extract_group" ->
      """SELECT regexp_extract('abc123def', '([a-z]+)([0-9]+)', 2) AS grp2,
        |       regexp_extract('abc123def', '([a-z]+)([0-9]+)', 1) AS grp1,
        |       regexp_extract('abcdef', '[0-9]+', 0) AS no_match""".stripMargin,

    // md5 hex digests (empty + known vector) — deterministic everywhere
    "slt_hash_md5" ->
      """SELECT md5('') AS h_empty, md5('abc') AS h_abc,
        |       length(md5('x')) AS h_len""".stripMargin,

    // chr/ascii round trip; ascii of a multi-char string reads char 1
    "slt_chr_ascii" ->
      """SELECT chr(65) AS a_chr, ascii('A') AS a_code,
        |       ascii('abc') AS first_code, chr(122) AS z_chr""".stripMargin,

    // translate: map chars pairwise, DELETE from-chars with no to-char
    "slt_translate" ->
      """SELECT translate('hello', 'el', 'ip') AS mapped,
        |       translate('abc', 'abc', 'x') AS deleted,
        |       translate('abc', 'z', 'y') AS untouched""".stripMargin,

    // ln/log10/log2 spelled explicitly (bare log() DIVERGES: ln in
    // Spark, log10 in DuckDB — the trap this query documents around)
    "slt_log_family" ->
      """SELECT CAST(round(ln(exp(2.0)), 6) AS DOUBLE) AS ln_e2,
        |       CAST(round(log10(1000.0), 6) AS DOUBLE) AS l10,
        |       CAST(round(log2(8.0), 6) AS DOUBLE) AS l2,
        |       CAST(round(pi(), 6) AS DOUBLE) AS pi_val""".stripMargin,

    // factorial: exact integer results, 0! = 1
    "slt_factorial" ->
      """SELECT CAST(factorial(5) AS BIGINT) AS f5,
        |       CAST(factorial(0) AS BIGINT) AS f0,
        |       CAST(factorial(1) AS BIGINT) AS f1""".stripMargin,

    // CTE referencing an earlier CTE (chained, not recursive)
    "slt_cte_chain" ->
      """WITH a(x) AS (SELECT 1 UNION ALL SELECT 2),
        |     b(y) AS (SELECT x * 10 FROM a),
        |     c(z) AS (SELECT y + 5 FROM b)
        |SELECT z FROM c ORDER BY z""".stripMargin,

    // INTERSECT ALL keeps the MINIMUM duplicate count per value
    "slt_intersect_all_bag" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 1 UNION ALL SELECT 2),
        |     u(v) AS (SELECT 1 UNION ALL SELECT 1 UNION ALL SELECT 1)
        |SELECT v, count(*) AS n FROM (
        |  SELECT v FROM t INTERSECT ALL SELECT v FROM u) x
        |GROUP BY v ORDER BY v""".stripMargin,

    // binary string ordering in comparisons (not just ORDER BY)
    "slt_string_compare" ->
      """SELECT 'a' < 'ab' AS prefix_lt, '' < 'a' AS empty_lt,
        |       'Z' < 'a' AS upper_lt, 'abc' = 'abc' AS eq,
        |       NULL = '' AS null_eq_empty""".stripMargin,

    // x / NULLIF(y, 0): the portable zero-division guard (divisor NULL
    // -> NULL in both engines, sidestepping Spark's ANSI throw)
    "slt_div_by_nullif" ->
      """SELECT 10 / nullif(0, 0) AS d_zero, 10 % nullif(0, 0) AS m_zero,
        |       CAST(10 / nullif(4, 0) AS DOUBLE) AS d_ok""".stripMargin,

    // character (not byte) length and case mapping over accented text
    // (ß is deliberately absent: DuckDB uppercases it to U+1E9E, the JVM
    // expands to SS — a real dialect divergence)
    "slt_unicode_length_case" ->
      """SELECT length('héllo') AS n_chars, upper('café') AS up,
        |       lower('ÀÉÎ') AS low, length('') AS n_empty""".stripMargin,

    // EXISTS as a CASE condition
    "slt_exists_in_case" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2)
        |SELECT CASE WHEN EXISTS (SELECT 1 FROM t WHERE v > 1)
        |            THEN 'y' ELSE 'n' END AS has_big,
        |       CASE WHEN EXISTS (SELECT 1 FROM t WHERE v > 99)
        |            THEN 'y' ELSE 'n' END AS has_none""".stripMargin,

    // ORDER BY an aggregate that is not in the SELECT list
    "slt_order_by_agg" ->
      """WITH t(g, v) AS (
        |  SELECT 'a', 1 UNION ALL SELECT 'b', 9 UNION ALL SELECT 'c', 5)
        |SELECT g FROM t GROUP BY g ORDER BY sum(v) DESC, g""".stripMargin,

    // CASE branches of mixed numeric types promote (pinned as DOUBLE)
    "slt_case_type_promote" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2)
        |SELECT v, CAST(CASE WHEN v = 1 THEN 1 ELSE 2.5 END AS DOUBLE) AS mixed
        |FROM t ORDER BY v""".stripMargin,

    // COALESCE as the GROUP BY key folds NULLs into the default bucket
    "slt_coalesce_group_key" ->
      """WITH t(v) AS (SELECT 'a' UNION ALL SELECT NULL
        |  UNION ALL SELECT NULL)
        |SELECT coalesce(v, 'z') AS k, count(*) AS n
        |FROM t GROUP BY coalesce(v, 'z') ORDER BY k""".stripMargin,

    // HAVING compared against a scalar subquery over grouped sums
    "slt_having_scalar_subquery" ->
      """WITH t(g, v) AS (
        |  SELECT 'a', 1 UNION ALL SELECT 'a', 2 UNION ALL SELECT 'b', 9)
        |SELECT g, CAST(sum(v) AS BIGINT) AS s FROM t GROUP BY g
        |HAVING sum(v) > (SELECT avg(s2) FROM (
        |  SELECT sum(v) AS s2 FROM t GROUP BY g) x)
        |ORDER BY g""".stripMargin,

    // substring with a negative start counts from the string's end
    "slt_substring_negative" ->
      """SELECT substring('hello', 2) AS from2,
        |       substring('hello', -3, 2) AS neg_start,
        |       substring('hello', 2, 100) AS clamp_len""".stripMargin,

    // ------------------------------------------- LATERAL subqueries
    // test/sql/subquery/lateral/test_lateral_join.test: a lateral
    // computing scalar expressions over the outer row
    "slt_lateral_scalar" ->
      """WITH t(i) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT i, j, k FROM t,
        |  LATERAL (SELECT i + 1 AS j, i * 10 AS k) l
        |ORDER BY i""".stripMargin,

    // test/sql/subquery/lateral/lateral_join_aggregate.test: aggregate
    // over the inner relation correlated through the lateral's WHERE (the
    // one placement BOTH engines accept — Spark rejects outer refs inside
    // or beside aggregates in the lateral's SELECT): per-row running sum
    "slt_lateral_agg_correlated" ->
      """WITH t(i) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT t1.i AS i, s FROM t t1,
        |  LATERAL (SELECT CAST(sum(i) AS BIGINT) AS s FROM t WHERE t.i <= t1.i) l
        |ORDER BY i""".stripMargin,

    // LEFT JOIN LATERAL with an empty inner result keeps the outer row
    // (NULL-extended), INNER drops it
    "slt_lateral_left_empty" ->
      """WITH t(i) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
        |u(k, v) AS (SELECT 1, 'a' UNION ALL SELECT 1, 'b' UNION ALL SELECT 3, 'c')
        |SELECT i, v FROM t
        |LEFT JOIN LATERAL (SELECT v FROM u WHERE u.k = t.i) l ON true
        |ORDER BY i, v NULLS FIRST""".stripMargin,

    // test/sql/subquery/lateral/lateral_join_chain.test: laterals chained
    // left-to-right, each referencing the previous lateral's columns
    "slt_lateral_chain" ->
      """WITH t(i) AS (SELECT 1 UNION ALL SELECT 2)
        |SELECT i, a, b FROM t,
        |  LATERAL (SELECT i * 2 AS a) l1,
        |  LATERAL (SELECT a + i AS b) l2
        |ORDER BY i""".stripMargin,

    // lateral output consumed by the outer WHERE and GROUP BY
    // (test/sql/subquery/lateral/lateral_grouping_sets.test shape)
    "slt_lateral_group_agg" ->
      """WITH t(g, v) AS (
        |  SELECT 'a', 1 UNION ALL SELECT 'a', 2 UNION ALL SELECT 'b', 9
        |  UNION ALL SELECT 'b', 4)
        |SELECT g, CAST(sum(dbl) AS BIGINT) AS s
        |FROM t, LATERAL (SELECT v * 2 AS dbl) l
        |WHERE dbl > 2
        |GROUP BY g ORDER BY g""".stripMargin,

    // correlated lateral TOP-1-per-row: max over the inner filtered by the
    // outer key (the decorrelated groupwise-max shape). Every outer key
    // matches: on an EMPTY inner group Spark keeps the ungrouped
    // aggregate's NULL row while DuckDB's decorrelation drops it — a
    // dialect divergence deliberately outside this pin.
    "slt_lateral_groupwise_max" ->
      """WITH t(k) AS (SELECT 1 UNION ALL SELECT 2),
        |u(k, v) AS (SELECT 1, 10 UNION ALL SELECT 1, 20 UNION ALL SELECT 2, 5)
        |SELECT t.k AS k, mx FROM t,
        |  LATERAL (SELECT max(v) AS mx FROM u WHERE u.k = t.k) l
        |ORDER BY k""".stripMargin,

    // lateral referencing BOTH of two preceding FROM relations
    "slt_lateral_two_outer" ->
      """WITH a(x) AS (SELECT 1 UNION ALL SELECT 2),
        |b(y) AS (SELECT 10 UNION ALL SELECT 20)
        |SELECT x, y, s FROM a, b,
        |  LATERAL (SELECT x + y AS s) l
        |ORDER BY x, y""".stripMargin,

    // lateral under a set operation: each branch carries its own lateral
    "slt_lateral_in_union" ->
      """WITH t(i) AS (SELECT 1 UNION ALL SELECT 2)
        |SELECT i, v FROM t, LATERAL (SELECT i + 100 AS v) l
        |UNION ALL
        |SELECT i, v FROM t, LATERAL (SELECT i + 200 AS v) l
        |ORDER BY i, v""".stripMargin,

    // ---------------------------------------------------- r6 widening
    // test/sql/order/test_order_by.test: ordinal ORDER BY positions
    // resolve against the projection, mixed with DESC
    "slt_order_by_ordinal" ->
      """WITH t(a, b) AS (SELECT 1, 'x' UNION ALL SELECT 3, 'x'
        |  UNION ALL SELECT 2, 'y')
        |SELECT b AS grp, a AS v FROM t ORDER BY 1, 2 DESC""".stripMargin,

    // test/sql/function/numeric/test_abs.test: abs/sign over negatives,
    // zero, and NULL
    "slt_abs_sign" ->
      """WITH t(v) AS (SELECT -7 UNION ALL SELECT 0 UNION ALL SELECT 5
        |  UNION ALL SELECT CAST(NULL AS INT))
        |SELECT v, abs(v) AS a, CAST(sign(v) AS INT) AS s
        |FROM t ORDER BY v NULLS FIRST""".stripMargin,

    // power/sqrt/cbrt identities; power(0,0) is 1 in both engines
    "slt_power_sqrt" ->
      """SELECT CAST(power(2, 10) AS DOUBLE) AS p10,
        |       CAST(power(2, -2) AS DOUBLE) AS pneg,
        |       CAST(power(0, 0) AS DOUBLE) AS p00,
        |       CAST(sqrt(4) AS DOUBLE) AS sq,
        |       round(cbrt(27), 6) AS cb""".stripMargin,

    // exp/ln round-trip and fixed points
    "slt_exp_ln" ->
      """SELECT round(exp(0), 6) AS e0, round(ln(exp(2)), 6) AS two,
        |       round(exp(1), 6) AS e1""".stripMargin,

    // trig family at exact arguments; atan2 quadrant sign
    "slt_trig_family" ->
      """SELECT round(sin(0), 6) AS s0, round(cos(0), 6) AS c0,
        |       round(atan2(1, 1), 6) AS a45,
        |       round(atan2(-1, -1), 6) AS a225,
        |       round(degrees(pi()), 6) AS deg,
        |       round(radians(180), 6) AS rad""".stripMargin,

    // test/sql/aggregate/group/test_grouping_function.test: grouping()
    // distinguishes a ROLLUP total row from a real NULL key
    "slt_grouping_fn" ->
      """WITH t(g, v) AS (
        |  SELECT 'a', 1 UNION ALL SELECT 'a', 2
        |  UNION ALL SELECT CAST(NULL AS STRING), 4)
        |SELECT g, CAST(grouping(g) AS INT) AS is_total,
        |       CAST(sum(v) AS BIGINT) AS s
        |FROM t GROUP BY ROLLUP(g)
        |ORDER BY is_total, g NULLS FIRST""".stripMargin,

    // conditional aggregation (the deep-CASE-pivot kernel): sums split
    // by predicate inside one aggregate pass
    "slt_case_in_agg" ->
      """WITH t(g, v) AS (SELECT 1, 10 UNION ALL SELECT 1, 20
        |  UNION ALL SELECT 2, 30 UNION ALL SELECT 2, 40)
        |SELECT CAST(sum(CASE WHEN g = 1 THEN v ELSE 0 END) AS BIGINT) AS s1,
        |       CAST(sum(CASE WHEN g = 2 THEN v END) AS BIGINT) AS s2,
        |       count(CASE WHEN v > 25 THEN 1 END) AS n_hi
        |FROM t""".stripMargin,

    // COUNT(DISTINCT expr) over a computed expression
    "slt_distinct_count_expr" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 4 UNION ALL SELECT 7
        |  UNION ALL SELECT 2 UNION ALL SELECT 5)
        |SELECT count(DISTINCT v % 3) AS nd,
        |       CAST(sum(DISTINCT v % 3) AS BIGINT) AS sd
        |FROM t""".stripMargin,

    // EXISTS over uncorrelated subqueries: empty vs non-empty drive the
    // outer filter entirely
    "slt_exists_uncorrelated" ->
      """WITH t(i) AS (SELECT 1 UNION ALL SELECT 2)
        |SELECT count(*) AS n_kept,
        | (SELECT count(*) FROM t WHERE EXISTS (SELECT 1 WHERE 1 = 0)) AS n_empty
        |FROM t WHERE EXISTS (SELECT 1)""".stripMargin,

    // three-table USING chain: the join column appears once, unqualified
    "slt_join_using_chain" ->
      """WITH a(k, x) AS (SELECT 1, 'a1' UNION ALL SELECT 2, 'a2'),
        |     b(k, y) AS (SELECT 1, 'b1' UNION ALL SELECT 3, 'b3'),
        |     c(k, z) AS (SELECT 1, 'c1' UNION ALL SELECT 2, 'c2')
        |SELECT k, x, y, z
        |FROM a JOIN b USING (k) JOIN c USING (k)
        |ORDER BY k""".stripMargin,

    // tuple IN: row-constructor membership over pairs
    "slt_row_in_tuples" ->
      """WITH t(a, b) AS (SELECT 1, 10 UNION ALL SELECT 2, 20
        |  UNION ALL SELECT 3, 30)
        |SELECT a, b FROM t WHERE (a, b) IN ((1, 10), (3, 30), (4, 40))
        |ORDER BY a""".stripMargin,

    // test/sql/window/test_window_reverse.test shape: suffix-running
    // frame (CURRENT ROW .. UNBOUNDED FOLLOWING)
    "slt_win_suffix_frame" ->
      """WITH t(g, v) AS (SELECT 'a', 1 UNION ALL SELECT 'a', 2
        |  UNION ALL SELECT 'a', 3 UNION ALL SELECT 'b', 10)
        |SELECT g, v,
        | CAST(sum(v) OVER (PARTITION BY g ORDER BY v
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |   AS tail_sum
        |FROM t ORDER BY g, v""".stripMargin,

    // two DIFFERENT window specs in one projection (the TPC-DS q47
    // multi-window kernel): partition-relative rank + global running sum
    "slt_win_two_specs" ->
      """WITH t(g, v) AS (SELECT 'a', 1 UNION ALL SELECT 'a', 3
        |  UNION ALL SELECT 'b', 2 UNION ALL SELECT 'b', 4)
        |SELECT g, v,
        | rank() OVER (PARTITION BY g ORDER BY v DESC) AS r,
        | CAST(sum(v) OVER (ORDER BY v, g
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS running
        |FROM t ORDER BY g, v""".stripMargin,

    // negative lead/lag offsets mirror each other
    "slt_win_lead_negative" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT v, lead(v, -1) OVER (ORDER BY v) AS ld_m1,
        |       lag(v, -1) OVER (ORDER BY v) AS lg_m1
        |FROM t ORDER BY v""".stripMargin,

    // NULLS ordering inside the OVER clause is independent of the outer
    // ORDER BY's
    "slt_win_nulls_order" ->
      """WITH t(v) AS (SELECT 2 UNION ALL SELECT CAST(NULL AS INT)
        |  UNION ALL SELECT 1)
        |SELECT v, row_number() OVER (ORDER BY v ASC NULLS LAST) AS rn
        |FROM t ORDER BY rn""".stripMargin,

    // date_trunc('week') snaps to Monday in both engines
    "slt_date_trunc_week" ->
      """SELECT CAST(date_trunc('week', DATE '2024-03-14') AS DATE) AS mon,
        |       CAST(date_trunc('week', DATE '2024-03-11') AS DATE) AS same,
        |       CAST(date_trunc('month', DATE '2024-03-14') AS DATE) AS m1""".stripMargin,

    // ------------------------------------------- intervals & timestamps
    // test/sql/types/interval/interval_arithmetic.test: month addition
    // clamps to the target month's last day (leap-aware), day/minute
    // intervals carry exact time
    "slt_interval_month_clamp" ->
      """SELECT CAST(DATE '2000-01-31' + INTERVAL '1' MONTH AS DATE) AS leap_feb,
        |       CAST(DATE '2001-01-31' + INTERVAL '1' MONTH AS DATE) AS plain_feb,
        |       CAST(DATE '2000-03-31' - INTERVAL '1' MONTH AS DATE) AS back_feb,
        |       CAST(DATE '1999-12-15' + INTERVAL '13' MONTH AS DATE) AS cross_year""".stripMargin,

    // test/sql/types/interval/interval_arithmetic.test: minute/hour
    // intervals over a timestamp cross midnight exactly
    "slt_interval_time_add" ->
      """SELECT TIMESTAMP '2024-03-10 23:30:00' + INTERVAL '90' MINUTE AS past_midnight,
        |       TIMESTAMP '2024-03-11 01:00:00' - INTERVAL '2' HOUR AS back_over,
        |       TIMESTAMP '2024-12-31 23:59:59' + INTERVAL '1' SECOND AS new_year""".stripMargin,

    // test/sql/function/timestamp/date_part.test: extract() field parity
    // (second kept integral to dodge the fractional-type divergence)
    "slt_timestamp_extract" ->
      """SELECT CAST(extract(YEAR FROM TIMESTAMP '2024-02-29 13:45:30') AS BIGINT) AS y,
        |       CAST(extract(MONTH FROM TIMESTAMP '2024-02-29 13:45:30') AS BIGINT) AS mo,
        |       CAST(extract(DAY FROM TIMESTAMP '2024-02-29 13:45:30') AS BIGINT) AS d,
        |       CAST(extract(HOUR FROM TIMESTAMP '2024-02-29 13:45:30') AS BIGINT) AS h,
        |       CAST(extract(MINUTE FROM TIMESTAMP '2024-02-29 13:45:30') AS BIGINT) AS mi""".stripMargin,

    // ---------------------------------------------------- string edges
    // test/sql/function/string/test_concat_ws.test: concat_ws skips NULL
    // members (plain concat would nullify); empty separator; all-NULL
    "slt_concat_ws_nulls" ->
      """SELECT concat_ws('-', 'a', CAST(NULL AS STRING), 'b') AS skip_mid,
        |       concat_ws('-', CAST(NULL AS STRING), CAST(NULL AS STRING)) AS all_null,
        |       concat_ws('', 'x', 'y') AS empty_sep,
        |       concat_ws('-', 'only') AS single""".stripMargin,

    // test/sql/function/string/test_repeat.test + test_reverse.test:
    // repeat clamps non-positive counts to ''; reverse of empty is empty
    "slt_repeat_reverse" ->
      """SELECT repeat('ab', 3) AS r3, repeat('ab', 0) AS r0,
        |       reverse('abc') AS rev, reverse('') AS rev_empty,
        |       repeat('', 5) AS empty_rep""".stripMargin,

    // test/sql/function/string/test_translate.test + test_replace.test:
    // translate maps per-char (shrinking when `to` is short); replace is
    // leftmost non-overlapping
    "slt_translate_replace" ->
      """SELECT translate('abcba', 'bc', 'xy') AS tr,
        |       translate('abc', 'abc', 'ab') AS shrink,
        |       replace('aaa', 'aa', 'b') AS no_overlap,
        |       replace('abc', '', 'x') AS empty_needle""".stripMargin,

    // --------------------------------------------------- query shapes
    // test/sql/cte/test_cte.test: a CTE tower where each level rebinds
    // the same column name over the previous level
    "slt_cte_tower_rebind" ->
      """WITH a(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
        |     b(v) AS (SELECT v * 10 FROM a WHERE v > 1),
        |     c(v) AS (SELECT v + 5 FROM b)
        |SELECT CAST(sum(v) AS BIGINT) AS s, count(*) AS n FROM c""".stripMargin,

    // test/sql/aggregate/having/test_having.test: HAVING over a global
    // (ungrouped) aggregate both filters and passes
    "slt_having_global" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT CAST(sum(v) AS BIGINT) AS s FROM t HAVING count(*) > 2""".stripMargin,

    // test/sql/limit/test_limit.test: LIMIT inside a subquery bounds the
    // outer aggregate's input; ORDER BY inside makes it deterministic
    "slt_limit_subquery_agg" ->
      """WITH t(v) AS (SELECT 5 UNION ALL SELECT 1 UNION ALL SELECT 4
        |  UNION ALL SELECT 2)
        |SELECT CAST(sum(v) AS BIGINT) AS s, count(*) AS n
        |FROM (SELECT v FROM t ORDER BY v LIMIT 2) u""".stripMargin,

    // test/sql/order/test_order_by.test: DISTINCT over a computed
    // expression, ordered by its alias
    "slt_distinct_expr_order" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3
        |  UNION ALL SELECT 4 UNION ALL SELECT 5)
        |SELECT DISTINCT v % 2 AS parity FROM t ORDER BY parity""".stripMargin,

    // test/sql/types/float/nan_cast.test: 'Infinity'/'NaN' string casts
    // round-trip; inf arithmetic: inf+1=inf, inf-inf=NaN; isnan parity
    "slt_float_special_values" ->
      """SELECT CAST('Infinity' AS DOUBLE) > 1e308 AS inf_big,
        |       isnan(CAST('NaN' AS DOUBLE)) AS nan_is,
        |       CAST('Infinity' AS DOUBLE) + 1 = CAST('Infinity' AS DOUBLE) AS inf_abs,
        |       isnan(CAST('Infinity' AS DOUBLE) - CAST('Infinity' AS DOUBLE)) AS inf_minus,
        |       CAST('-Infinity' AS DOUBLE) < 0 AS neg_inf""".stripMargin,

    // test/sql/order/order_by_all.test: ORDER BY ALL sorts by every
    // select-list column left to right
    "slt_order_by_all" ->
      """WITH t(a, b) AS (SELECT 2, 'x' UNION ALL SELECT 1, 'z'
        |  UNION ALL SELECT 2, 'a' UNION ALL SELECT 1, 'b')
        |SELECT a, b FROM t ORDER BY ALL""".stripMargin,

    // test/sql/aggregate/group/group_by_all.test: GROUP BY ALL groups by
    // every non-aggregate select column
    "slt_group_by_all" ->
      """WITH t(g, h, v) AS (SELECT 'a', 1, 10 UNION ALL SELECT 'a', 1, 20
        |  UNION ALL SELECT 'b', 2, 30 UNION ALL SELECT 'b', 3, 40)
        |SELECT g, h, CAST(sum(v) AS BIGINT) AS s, count(*) AS n
        |FROM t GROUP BY ALL ORDER BY g, h""".stripMargin,

    // test/sql/subquery/any_all/test_in_null.test: three-valued IN — a
    // NULL in the list makes a miss NULL (filtered), a hit stays TRUE;
    // NOT IN against a list with NULL filters everything
    "slt_in_list_null_3vl" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 4)
        |SELECT
        |  (SELECT count(*) FROM t WHERE v IN (1, 2)) AS plain_hits,
        |  (SELECT count(*) FROM t WHERE v IN (1, NULL)) AS null_list_hits,
        |  (SELECT count(*) FROM t WHERE v NOT IN (1, NULL)) AS not_in_null,
        |  (SELECT count(*) FROM t WHERE (v IN (9, NULL)) IS NULL) AS unknown_rows""".stripMargin,

    // test/sql/subquery/scalar/test_subquery_null.test: IN over a
    // subquery whose result carries NULL — same 3VL through the MARK join
    "slt_in_subquery_null" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
        |     s(x) AS (SELECT 1 UNION ALL SELECT CAST(NULL AS INT))
        |SELECT
        |  (SELECT count(*) FROM t WHERE v IN (SELECT x FROM s)) AS in_hits,
        |  (SELECT count(*) FROM t WHERE v NOT IN (SELECT x FROM s)) AS not_in_hits""".stripMargin,

    // test/sql/expression/case/test_case.test: CASE without ELSE yields
    // NULL; searched CASE stops at the first true arm
    "slt_case_no_else" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT v,
        |  CASE WHEN v = 1 THEN 'one' END AS no_else,
        |  CASE WHEN v > 0 THEN 'pos' WHEN v > 1 THEN 'unreached' END AS first_arm
        |FROM t ORDER BY v""".stripMargin,

    // test/sql/function/numeric/test_mod.test: % takes the DIVIDEND's
    // sign in both dialects
    "slt_mod_sign" ->
      """SELECT 7 % 3 AS pp, (-7) % 3 AS np, 7 % (-3) AS pn,
        |       (-7) % (-3) AS nn""".stripMargin,

    // test/sql/expression/test_between.test: BETWEEN with a NULL bound
    // is NULL (row filtered), not an error
    "slt_between_null_bound" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 5 UNION ALL SELECT 9)
        |SELECT
        |  (SELECT count(*) FROM t WHERE v BETWEEN 2 AND 8) AS plain,
        |  (SELECT count(*) FROM t WHERE v BETWEEN CAST(NULL AS INT) AND 8) AS null_lo,
        |  (SELECT count(*) FROM t
        |   WHERE (v BETWEEN CAST(NULL AS INT) AND 8) IS NULL) AS unknown_lo""".stripMargin,

    // test/sql/types/interval/interval_addition.test: month arithmetic
    // clamps to the target month's last day (leap-aware)
    // (DATE + INTERVAL is a TIMESTAMP in DuckDB, a DATE in Spark — the
    // CAST pins the common type)
    "slt_month_add_clamp" ->
      """SELECT CAST(DATE '2024-01-31' + INTERVAL '1' MONTH AS DATE) AS leap_clamp,
        |       CAST(DATE '2023-01-31' + INTERVAL '1' MONTH AS DATE) AS plain_clamp,
        |       CAST(DATE '2024-02-29' + INTERVAL '12' MONTH AS DATE) AS year_hop""".stripMargin,

    // test/sql/aggregate/group/test_grouping_sets.test: duplicate
    // grouping sets produce duplicate result rows (bag semantics)
    "slt_grouping_sets_dup" ->
      """WITH t(g, v) AS (SELECT 'a', 1 UNION ALL SELECT 'b', 2)
        |SELECT g, CAST(sum(v) AS BIGINT) AS s, count(*) AS n
        |FROM t GROUP BY GROUPING SETS ((g), (g))
        |ORDER BY g, s""".stripMargin,

    // test/sql/limit/test_offset.test: OFFSET without LIMIT skips and
    // streams the rest
    "slt_offset_no_limit" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3
        |  UNION ALL SELECT 4 UNION ALL SELECT 5)
        |SELECT v FROM t ORDER BY v OFFSET 3""".stripMargin,

    // test/sql/setops/test_except.test: set ops treat NULLs as EQUAL
    // (unlike =), so EXCEPT removes NULL rows present on both sides
    "slt_setop_null_equal" ->
      """WITH a(v) AS (SELECT 1 UNION ALL SELECT CAST(NULL AS INT)
        |  UNION ALL SELECT 2),
        |     b(v) AS (SELECT CAST(NULL AS INT) UNION ALL SELECT 2)
        |SELECT v FROM a EXCEPT SELECT v FROM b""".stripMargin,

    // test/sql/window/test_window_frame.test: a frame that ends before
    // it starts is EMPTY — aggregates yield NULL/0, not the current row
    // (zero-row FOLLOWING frame arm is slt_win_empty_frame)
    "slt_win_frame_before_start" ->
      """WITH t(id, v) AS (SELECT 1, 10 UNION ALL SELECT 2, 20
        |  UNION ALL SELECT 3, 30)
        |SELECT id,
        |  CAST(sum(v) OVER (ORDER BY id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS run_prev,
        |  count(*) OVER (ORDER BY id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_prev
        |FROM t ORDER BY id""".stripMargin,

    // ------------------------------------------- round-7 widening
    // test/sql/window/test_percent_rank.test + cume_dist: tie groups
    // share cume_dist (fraction ≤ peers) and percent_rank ((rank-1)/(n-1))
    "slt_win_cume_dist_ties" ->
      """WITH t(v) AS (SELECT 10 UNION ALL SELECT 20 UNION ALL SELECT 20
        |  UNION ALL SELECT 30 UNION ALL SELECT 30 UNION ALL SELECT 40)
        |SELECT v, round(cume_dist() OVER (ORDER BY v), 4) AS cd,
        |       round(percent_rank() OVER (ORDER BY v), 4) AS pr,
        |       rank() OVER (ORDER BY v) AS r, dense_rank() OVER (ORDER BY v) AS dr
        |FROM t ORDER BY v, cd""".stripMargin,

    // test/sql/window/test_ntile.test: uneven buckets — earlier buckets
    // take the extra rows (7 rows / 3 buckets → 3,2,2)
    "slt_win_ntile_uneven" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3
        |  UNION ALL SELECT 4 UNION ALL SELECT 5 UNION ALL SELECT 6 UNION ALL SELECT 7)
        |SELECT v, ntile(3) OVER (ORDER BY v) AS bucket FROM t ORDER BY v""".stripMargin,

    // test/sql/window/test_range_frame.test: RANGE frame bounded by a
    // calendar interval over a timestamp ordering
    "slt_win_range_interval" ->
      """WITH t(ts, v) AS (
        |  SELECT TIMESTAMP '2024-01-01 00:00:00', 1
        |  UNION ALL SELECT TIMESTAMP '2024-01-01 12:00:00', 2
        |  UNION ALL SELECT TIMESTAMP '2024-01-02 06:00:00', 4
        |  UNION ALL SELECT TIMESTAMP '2024-01-05 00:00:00', 8)
        |SELECT ts, CAST(sum(v) OVER (ORDER BY ts
        |  RANGE BETWEEN INTERVAL '1' DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS s
        |FROM t ORDER BY ts""".stripMargin,

    // test/sql/window/test_lead_lag.test: offset-2 with a non-NULL default
    "slt_win_lag_default_expr" ->
      """WITH t(id, v) AS (SELECT 1, 10 UNION ALL SELECT 2, 20 UNION ALL SELECT 3, 30)
        |SELECT id, lag(v, 2, -1) OVER (ORDER BY id) AS l2,
        |       lead(v, 2, -1) OVER (ORDER BY id) AS f2
        |FROM t ORDER BY id""".stripMargin,

    // RANGE UNBOUNDED..CURRENT ROW includes ALL peers of the current row
    // (ROWS would not) — the peer-inclusive running sum
    "slt_win_range_current_peers" ->
      """WITH t(g, v) AS (SELECT 1, 10 UNION ALL SELECT 1, 20 UNION ALL SELECT 2, 30
        |  UNION ALL SELECT 2, 40 UNION ALL SELECT 3, 50)
        |SELECT g, v, CAST(sum(v) OVER (ORDER BY g
        |  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
        |FROM t ORDER BY g, v""".stripMargin,

    // DESC NULLS LAST ordering inside a window ranks NULLs after all values
    "slt_win_rank_desc_nulls_last" ->
      """WITH t(v) AS (SELECT 10 UNION ALL SELECT CAST(NULL AS INT) UNION ALL SELECT 30
        |  UNION ALL SELECT 20 UNION ALL SELECT CAST(NULL AS INT))
        |SELECT v, rank() OVER (ORDER BY v DESC NULLS LAST) AS r
        |FROM t ORDER BY r, v NULLS FIRST""".stripMargin,

    // a NULL partition key forms its OWN partition (grouping equality,
    // not = semantics)
    "slt_win_partition_null_key" ->
      """WITH t(g, v) AS (SELECT CAST(NULL AS INT), 10 UNION ALL SELECT CAST(NULL AS INT), 20
        |  UNION ALL SELECT 1, 30 UNION ALL SELECT 1, 40)
        |SELECT g, v, CAST(sum(v) OVER (PARTITION BY g) AS BIGINT) AS s,
        |       count(*) OVER (PARTITION BY g) AS n
        |FROM t ORDER BY g NULLS FIRST, v""".stripMargin,

    // test/sql/window/test_nth_value.test: nth_value is frame-relative —
    // NULL until the frame holds n rows
    "slt_win_nth_value_frame" ->
      """WITH t(id, v) AS (SELECT 1, 10 UNION ALL SELECT 2, 20 UNION ALL SELECT 3, 30
        |  UNION ALL SELECT 4, 40)
        |SELECT id, nth_value(v, 2) OVER (ORDER BY id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv
        |FROM t ORDER BY id""".stripMargin,

    // a frame strictly AFTER the current row; empty at the partition tail
    "slt_win_rows_following_only" ->
      """WITH t(id, v) AS (SELECT 1, 10 UNION ALL SELECT 2, 20 UNION ALL SELECT 3, 30
        |  UNION ALL SELECT 4, 40)
        |SELECT id, CAST(sum(v) OVER (ORDER BY id
        |  ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS BIGINT) AS s
        |FROM t ORDER BY id""".stripMargin,

    // test/sql/aggregate/group/test_grouping_function.test: grouping()
    // distinguishes a rollup-produced NULL from a data NULL (cast to INT
    // — the dialects' native grouping() widths differ)
    "slt_agg_grouping_func" ->
      """WITH t(a, b, v) AS (SELECT 'x', CAST(NULL AS VARCHAR(8)), 1
        |  UNION ALL SELECT 'x', 'p', 2 UNION ALL SELECT 'y', 'p', 4)
        |SELECT a, b, CAST(grouping(a) AS INT) AS ga, CAST(grouping(b) AS INT) AS gb,
        |       CAST(sum(v) AS BIGINT) AS s
        |FROM t GROUP BY GROUPING SETS ((a, b), (a), ())
        |ORDER BY ga, gb, a NULLS FIRST, b NULLS FIRST""".stripMargin,

    // FILTER composes with DISTINCT aggregation
    "slt_agg_filter_distinct" ->
      """WITH t(g, v) AS (SELECT 1, 10 UNION ALL SELECT 1, 10 UNION ALL SELECT 1, 20
        |  UNION ALL SELECT 2, 30 UNION ALL SELECT 2, CAST(NULL AS INT))
        |SELECT g, count(DISTINCT v) FILTER (WHERE v > 10) AS ndf,
        |       count(*) FILTER (WHERE v IS NULL) AS nnull
        |FROM t GROUP BY g ORDER BY g""".stripMargin,

    // distinct aggregates over DIFFERENT columns in one SELECT (the
    // multi-distinct Expand / specialized-plan shape)
    "slt_agg_multi_distinct_cols" ->
      """WITH t(a, b, c) AS (SELECT 1, 'x', 10 UNION ALL SELECT 1, 'y', 20
        |  UNION ALL SELECT 2, 'x', 30 UNION ALL SELECT 2, 'x', 40)
        |SELECT count(DISTINCT a) AS nda, count(DISTINCT b) AS ndb,
        |       CAST(sum(c) AS BIGINT) AS sc, count(*) AS n
        |FROM t""".stripMargin,

    // min/max over strings use binary (codepoint) order — uppercase
    // sorts before lowercase
    "slt_agg_minmax_case_string" ->
      """WITH t(s) AS (SELECT 'apple' UNION ALL SELECT 'Banana' UNION ALL SELECT 'cherry'
        |  UNION ALL SELECT 'APPLE')
        |SELECT min(s) AS mn, max(s) AS mx, count(DISTINCT s) AS nd FROM t""".stripMargin,

    // bool_and/bool_or skip NULLs; all-NULL group yields NULL
    "slt_agg_bool_and_or" ->
      """WITH t(g, b) AS (SELECT 1, true UNION ALL SELECT 1, false UNION ALL SELECT 2, true
        |  UNION ALL SELECT 2, CAST(NULL AS BOOLEAN) UNION ALL SELECT 3, CAST(NULL AS BOOLEAN))
        |SELECT g, bool_and(b) AS ba, bool_or(b) AS bo FROM t GROUP BY g ORDER BY g""".stripMargin,

    // test/sql/cast/string_to_integer_cast.test: numeric casts trim
    // whitespace; TRY_CAST yields NULL on malformed/empty
    "slt_cast_string_spaces" ->
      """SELECT CAST(' 42 ' AS INT) AS a, CAST('42' AS INT) AS b,
        | TRY_CAST('4x2' AS INT) AS c, TRY_CAST('' AS INT) AS d""".stripMargin,

    // month/year arithmetic clamps to month end (Jan 31 + 1 month =
    // Feb 29 in a leap year, Feb 28 otherwise); cast — the dialects'
    // date+interval result types differ (DATE vs TIMESTAMP)
    "slt_date_month_end_clamp" ->
      """SELECT CAST(DATE '2024-01-31' + INTERVAL '1' MONTH AS DATE) AS feb,
        | CAST(DATE '2024-02-29' + INTERVAL '1' YEAR AS DATE) AS nextyr,
        | CAST(DATE '2023-01-31' + INTERVAL '1' MONTH AS DATE) AS feb23""".stripMargin,

    // one CTE consumed twice (scan + aggregate) in the same query
    "slt_cte_referenced_twice" ->
      """WITH base(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
        |agg AS (SELECT CAST(sum(v) AS BIGINT) AS s FROM base)
        |SELECT b.v, a.s FROM base b CROSS JOIN agg a ORDER BY b.v""".stripMargin,

    // test/sql/setops/test_union_types.test: INT branches coerce to the
    // decimal branch's type across UNION ALL
    // the INT∪DECIMAL coercion under test happens inside the subquery;
    // cells rendered as DOUBLE per the third Q.scala convention
    "slt_union_numeric_coercion" ->
      """SELECT CAST(v AS DOUBLE) AS v, CAST(round(v * 2, 1) AS DOUBLE) AS d FROM (
        | SELECT 1 AS v UNION ALL SELECT 2.5 UNION ALL SELECT 3) u ORDER BY v""".stripMargin,

    // INTERSECT treats NULLs as equal (set-op grouping equality)
    "slt_intersect_null_equal" ->
      """WITH a(v) AS (SELECT 1 UNION ALL SELECT CAST(NULL AS INT) UNION ALL SELECT 2),
        | b(v) AS (SELECT CAST(NULL AS INT) UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT v FROM a INTERSECT SELECT v FROM b ORDER BY v NULLS FIRST""".stripMargin,

    // test/sql/join/inner/test_using_join.test: USING merges the key into
    // one unqualified output column
    "slt_join_using_clause" ->
      """WITH a(k, x) AS (SELECT 1, 'a1' UNION ALL SELECT 2, 'a2'),
        | b(k, y) AS (SELECT 2, 'b2' UNION ALL SELECT 3, 'b3')
        |SELECT k, x, y FROM a JOIN b USING (k) ORDER BY k""".stripMargin,

    // NATURAL LEFT JOIN joins on the shared column names, padding misses
    "slt_join_natural" ->
      """WITH a(k, x) AS (SELECT 1, 'a1' UNION ALL SELECT 2, 'a2'),
        | b(k, y) AS (SELECT 2, 'b2' UNION ALL SELECT 3, 'b3')
        |SELECT k, x, y FROM a NATURAL LEFT JOIN b ORDER BY k""".stripMargin,

    // IS NOT DISTINCT FROM as a join predicate matches NULL keys to each
    // other (the NULL-safe equi-join)
    "slt_join_not_distinct" ->
      """WITH a(k, x) AS (SELECT 1, 'a1' UNION ALL SELECT CAST(NULL AS INT), 'an'),
        | b(k, y) AS (SELECT 1, 'b1' UNION ALL SELECT CAST(NULL AS INT), 'bn')
        |SELECT a.x, b.y FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k ORDER BY a.x""".stripMargin,

    // three-valued IN: a NULL element makes non-matches NULL (not false),
    // and NOT IN with a NULL element never returns true
    "slt_in_list_null_semantics" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT CAST(NULL AS INT))
        |SELECT v, (v IN (1, 3)) AS in13, (v IN (1, NULL)) AS in1n,
        |       (v NOT IN (1, NULL)) AS notin1n
        |FROM t ORDER BY v NULLS FIRST""".stripMargin,

    // a correlated scalar subquery over an empty set yields NULL
    "slt_scalar_subquery_empty" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2)
        |SELECT v, (SELECT max(v) FROM t t2 WHERE t2.v > t.v) AS nxt FROM t ORDER BY v""".stripMargin,

    // ORDER BY ordinal positions, DESC leading (asc-leading arm is
    // slt_order_by_ordinal)
    "slt_order_by_ordinal_rev" ->
      """WITH t(a, b) AS (SELECT 'x', 3 UNION ALL SELECT 'y', 1 UNION ALL SELECT 'z', 2)
        |SELECT a, b FROM t ORDER BY 2 DESC, 1""".stripMargin,

    // ORDER BY an expression over columns NOT in the select list
    "slt_order_by_unselected_expr" ->
      """WITH t(a, b) AS (SELECT 1, 30 UNION ALL SELECT 2, 10 UNION ALL SELECT 3, 20)
        |SELECT a FROM t ORDER BY a + b""".stripMargin,

    // DISTINCT composes with ORDER BY + LIMIT (dedup before the top-N)
    "slt_distinct_order_limit" ->
      """WITH t(v) AS (SELECT 3 UNION ALL SELECT 1 UNION ALL SELECT 3 UNION ALL SELECT 2
        |  UNION ALL SELECT 1)
        |SELECT DISTINCT v FROM t ORDER BY v DESC LIMIT 2""".stripMargin,

    // lpad/rpad TRUNCATE when the target length is shorter; length 0 → ''
    "slt_string_pad_truncate" ->
      """SELECT lpad('abc', 6, '*') AS lp, rpad('abc', 6, '*') AS rp,
        | lpad('abcdef', 3, '*') AS lt, rpad('abcdef', 3, '*') AS rt,
        | lpad('abc', 0, '*') AS lz""".stripMargin,

    // LIKE with an explicit ESCAPE character makes _ and % literal
    "slt_like_escape_clause" ->
      """WITH t(s) AS (SELECT 'a_b' UNION ALL SELECT 'axb' UNION ALL SELECT 'a%b')
        |SELECT s, (s LIKE 'a!_b' ESCAPE '!') AS underscore_lit,
        |       (s LIKE 'a!%b' ESCAPE '!') AS pct_lit
        |FROM t ORDER BY s""".stripMargin,

    // greatest/least SKIP NULLs (return the extreme non-NULL; all-NULL → NULL)
    "slt_greatest_least_nulls" ->
      """SELECT greatest(1, 5, 3) AS g, least(1, 5, 3) AS l,
        | greatest(1, NULL, 3) AS gn, least(NULL, CAST(NULL AS INT)) AS ln""".stripMargin,

    // HAVING without GROUP BY aggregates the whole input as one group —
    // predicate on a DIFFERENT aggregate than the output (companion of
    // slt_having_no_groupby)
    "slt_having_global_count" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT CAST(sum(v) AS BIGINT) AS s FROM t HAVING count(*) > 2""".stripMargin,

    // LIMIT 0 is a valid empty result (schema preserved)
    "slt_limit_zero" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2)
        |SELECT v FROM t ORDER BY v LIMIT 0""".stripMargin,

    // split_part: absent delimiter → whole string (empty-source and
    // past-end arms are slt_split_part_edges)
    "slt_split_part_whole" ->
      """SELECT split_part('a,b,c', ',', 2) AS p2, split_part('a,b,c', ',', 5) AS p5,
        | split_part('abc', ',', 1) AS whole""".stripMargin,

    // position(): empty needle → 1, missing needle → 0, empty haystack → 0
    "slt_position_empty" ->
      """SELECT position('' IN 'abc') AS pe, position('b' IN 'abc') AS pb,
        | position('z' IN 'abc') AS pz, position('a' IN '') AS pa""".stripMargin,

    // test/sql/aggregate/group/grouping_sets.test: grouping_id() bit
    // vector disambiguates which columns a grouping-sets row aggregated
    // away (bit order: first arg = most significant in BOTH dialects)
    "slt_grouping_id_bits" ->
      """WITH t(a, b, v) AS (
        |  SELECT 'x', 1, 10 UNION ALL SELECT 'x', 2, 20
        |  UNION ALL SELECT 'y', 1, 30)
        |SELECT a, b, CAST(grouping_id(a, b) AS INT) AS gid,
        |       CAST(sum(v) AS BIGINT) AS s
        |FROM t GROUP BY GROUPING SETS ((a, b), (a), (b), ())
        |ORDER BY gid, a NULLS FIRST, b NULLS FIRST""".stripMargin,


    // bool_and / bool_or with FILTER clauses; empty filtered input → NULL
    "slt_bool_agg_filter" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT bool_and(v > 0) AS all_pos,
        |       bool_or(v > 2) AS any_big,
        |       bool_and(v > 0) FILTER (WHERE v > 10) AS empty_and
        |FROM t""".stripMargin,

    // ------------------------------------------------- round-8 widening
    // test/sql/function/string/test_left_right.test: zero length is
    // empty, over-length clamps to the whole string
    "slt_left_right_bounds" ->
      """SELECT left('abcde', 2) AS l2, left('abcde', 0) AS l0,
        | left('abcde', 99) AS lbig, right('abcde', 2) AS r2,
        | right('abcde', 0) AS r0, right('abcde', 99) AS rbig,
        | left('', 3) AS lempty""".stripMargin,

    // test/sql/function/string/test_ascii.test + chr: code-point
    // roundtrip, multi-byte first char
    "slt_ascii_chr" ->
      """SELECT ascii('A') AS a, ascii('abc') AS ab, chr(66) AS b,
        | chr(233) AS eacute, ascii('é') AS ae""".stripMargin,

    // contains() with empty needle (always true) and needle == haystack
    "slt_contains_fn" ->
      """SELECT contains('hello', 'ell') AS c1, contains('hello', '') AS c2,
        | contains('', 'x') AS c3, contains('abc', 'abc') AS c4,
        | contains('abc', 'abcd') AS c5""".stripMargin,

    // test/sql/function/date/test_make_date.test: constructor functions,
    // leap day, fractional seconds (compared via date/part extraction —
    // timestamp rendering is engine-specific)
    "slt_make_date_ts" ->
      """SELECT make_date(2024, 2, 29) AS leap,
        | make_date(1999, 12, 31) AS ymd,
        | CAST(make_timestamp(2024, 2, 29, 23, 59, 59.5) AS DATE) AS ts_d,
        | CAST(EXTRACT(HOUR FROM make_timestamp(2024, 2, 29, 23, 59, 59.5)) AS INT) AS ts_h""".stripMargin,

    // cross-type DATE vs TIMESTAMP comparison promotes the date to
    // midnight in both engines
    "slt_date_ts_compare" ->
      """SELECT DATE '2024-01-02' = TIMESTAMP '2024-01-02 00:00:00' AS eq,
        | DATE '2024-01-02' < TIMESTAMP '2024-01-02 00:00:01' AS lt,
        | DATE '2024-01-03' > TIMESTAMP '2024-01-02 23:59:59' AS gt""".stripMargin,

    // upper/lower across ASCII and accented code points (ß excluded —
    // the engines disagree on the capital-sharp-s mapping)
    "slt_upper_lower_unicode" ->
      """SELECT upper('héllo wörld') AS u, lower('HÉLLO WÖRLD') AS l,
        | upper('') AS ue, length(upper('héllo')) AS ul""".stripMargin,

    // test/sql/aggregate/aggregates/test_stddev.test: one row → sample
    // stddev/var NULL, population forms 0
    "slt_stddev_single_row" ->
      """WITH t(x) AS (SELECT 5.0)
        |SELECT stddev(x) AS sd, var_samp(x) AS vs,
        | round(stddev_pop(x), 6) AS sp, round(var_pop(x), 6) AS vp,
        | count(x) AS n
        |FROM t""".stripMargin,

    // boolean ↔ integer casts
    "slt_bool_int_cast" ->
      """SELECT CAST(true AS INT) AS t_i, CAST(false AS INT) AS f_i,
        | CAST(1 AS BOOLEAN) AS i1_b, CAST(0 AS BOOLEAN) AS i0_b""".stripMargin,

    // power() edges: 0^0 = 1, negative bases, fractional results
    "slt_power_edges" ->
      """SELECT round(power(0, 0), 6) AS p00, round(power(-2, 2), 6) AS pn2,
        | round(power(2, -1), 6) AS pneg, round(power(9, 0.5), 6) AS phalf""".stripMargin,

    // repeat with zero/negative counts is empty in both engines
    "slt_repeat_edges" ->
      """SELECT repeat('ab', 0) AS r0, repeat('ab', 3) AS r3,
        | repeat('', 5) AS rempty, length(repeat('xy', 4)) AS rlen""".stripMargin,

    // -------------------------------------- round-8b join/cte widening
    // test/sql/join/inner/test_join_is_distinct.test: IS DISTINCT FROM as
    // a secondary join predicate — unlike '!=', a (NULL, 1) pair MATCHES
    "slt_join_is_distinct_pred" ->
      """WITH t(k, v) AS (
        |  SELECT 1, 0 UNION ALL SELECT 1, 1 UNION ALL SELECT 1, CAST(NULL AS INT))
        |SELECT x.v AS xv, y.v AS yv, 'd' AS op
        |FROM t x JOIN t y ON x.k = y.k AND x.v IS DISTINCT FROM y.v
        |UNION ALL
        |SELECT x.v AS xv, y.v AS yv, 'n' AS op
        |FROM t x JOIN t y ON x.k = y.k AND x.v <> y.v
        |ORDER BY op, xv NULLS FIRST, yv NULLS FIRST""".stripMargin,

    // test/sql/join/test_join_on_aggregates.test: joining two grouped
    // aggregate subqueries on an aggregate output; the NULL-holding group
    // still joins (sum skips NULLs, the key itself is non-NULL)
    "slt_join_on_aggregates" ->
      """WITH g(i, j) AS (
        |  SELECT 1, 1 UNION ALL SELECT 2, 1 UNION ALL SELECT 3, 2
        |  UNION ALL SELECT CAST(NULL AS INT), 2)
        |SELECT a.j AS j, CAST(a.x AS BIGINT) AS x, a.y AS ay, b.y AS yb
        |FROM (SELECT j, min(i) AS y, sum(i) AS x FROM g GROUP BY j) a
        |JOIN (SELECT j, min(i) AS y, sum(i) AS x FROM g GROUP BY j) b
        |  ON a.j = b.j AND a.x = b.x
        |ORDER BY j""".stripMargin,

    // test/sql/join/full_outer/test_full_outer_join_inequality.test:
    // FULL OUTER on '<>' — a self-equal pair danglings BOTH sides; an
    // empty right side still emits every left row null-padded
    "slt_join_full_inequality" ->
      """WITH l(i, j) AS (SELECT 1, 1 UNION ALL SELECT 2, 2),
        |r(k, m) AS (SELECT 1, 10)
        |SELECT i, j, k, m FROM l FULL OUTER JOIN r ON l.i <> r.k
        |UNION ALL
        |SELECT i, j, k, m
        |FROM l FULL OUTER JOIN (SELECT * FROM r WHERE 1 = 0) r2(k, m)
        |  ON l.i <> r2.k
        |ORDER BY i NULLS FIRST, j NULLS FIRST, k NULLS FIRST, m NULLS FIRST""".stripMargin,

    // test/sql/join/inner/test_unequal_join_duplicates.test: duplicate
    // values on both sides of a '<' join multiply pairwise
    "slt_join_lt_duplicates" ->
      """WITH l(a) AS (SELECT 1 UNION ALL SELECT 1 UNION ALL SELECT 2),
        |r(b) AS (SELECT 2 UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT a, b, count(*) AS n
        |FROM l JOIN r ON l.a < r.b
        |GROUP BY a, b ORDER BY a, b""".stripMargin,

    // test/sql/join/test_complex_join_expr.test: join keys that are
    // expressions over each side (arithmetic + abs), not bare columns
    "slt_join_expr_keys" ->
      """WITH l(a) AS (SELECT 1 UNION ALL SELECT -2 UNION ALL SELECT 3),
        |r(b) AS (SELECT 4 UNION ALL SELECT 2 UNION ALL SELECT 8)
        |SELECT a, b FROM l JOIN r ON abs(l.a) * 2 = r.b
        |ORDER BY a, b""".stripMargin,

    // test/sql/join/inner/test_eq_ineq_join.test: one equality plus one
    // inequality predicate — the hash join keeps the equality, the
    // residual filters; NULLs in the inequality column never match
    "slt_join_eq_ineq" ->
      """WITH l(k, v) AS (
        |  SELECT 1, 10 UNION ALL SELECT 1, 20 UNION ALL SELECT 2, CAST(NULL AS INT)),
        |r(k, w) AS (
        |  SELECT 1, 15 UNION ALL SELECT 1, 5 UNION ALL SELECT 2, 100)
        |SELECT l.k AS k, l.v AS v, r.w AS w
        |FROM l JOIN r ON l.k = r.k AND l.v > r.w
        |ORDER BY k, v, w""".stripMargin,

    // test/sql/join/inner/test_varchar_join.test: string keys are
    // case-sensitive and the empty string is a real key distinct from NULL
    "slt_join_varchar_keys" ->
      """WITH l(k, lv) AS (
        |  SELECT 'a', 1 UNION ALL SELECT 'A', 2 UNION ALL SELECT '', 3
        |  UNION ALL SELECT CAST(NULL AS STRING), 4),
        |r(k, rv) AS (
        |  SELECT 'a', 10 UNION ALL SELECT '', 30 UNION ALL SELECT CAST(NULL AS STRING), 40)
        |SELECT l.lv AS lv, r.rv AS rv
        |FROM l JOIN r ON l.k = r.k
        |ORDER BY lv""".stripMargin,

    // test/sql/join/left_outer/test_left_join_on_true.test: LEFT JOIN ON
    // TRUE multiplies by every right row; an empty right side null-pads
    "slt_join_left_on_true" ->
      """WITH l(a) AS (SELECT 1 UNION ALL SELECT 2),
        |r(b) AS (SELECT 10 UNION ALL SELECT 20),
        |e(b) AS (SELECT CAST(NULL AS INT) WHERE 1 = 0)
        |SELECT a, b, 'full' AS src FROM l LEFT JOIN r ON true
        |UNION ALL
        |SELECT a, b, 'empty' AS src FROM l LEFT JOIN e ON true
        |ORDER BY src, a, b NULLS FIRST""".stripMargin,

    // test/sql/join/right_outer/right_join_complex_null.test: RIGHT JOIN
    // preserves unmatched right rows incl. a NULL-keyed one
    "slt_join_null_keys_right" ->
      """WITH l(k, lv) AS (SELECT 1, 'l1'),
        |r(k, rv) AS (
        |  SELECT 1, 'r1' UNION ALL SELECT CAST(NULL AS INT), 'rn'
        |  UNION ALL SELECT 2, 'r2')
        |SELECT l.lv AS lv, r.k AS rk, r.rv AS rv
        |FROM l RIGHT JOIN r ON l.k = r.k
        |ORDER BY rk NULLS FIRST, rv""".stripMargin,

    // test/sql/cte/test_cte_in_cte.test: a WITH nested inside a CTE
    // definition, plus a CTE consumed by a later CTE and by the outer query
    "slt_cte_in_cte" ->
      """WITH cte1 AS (WITH b AS (SELECT 42 AS j) SELECT j FROM b),
        |cte2 AS (WITH c AS (SELECT ref.j + 1 AS k FROM cte1 AS ref) SELECT k FROM c)
        |SELECT cte1.j AS j, cte2.k AS k FROM cte1, cte2""".stripMargin,

    // test/sql/cte/test_cte_in_cte.test: the same CTE referenced from a
    // derived table AND from a scalar-subquery expression in one query
    "slt_cte_subquery_refs" ->
      """WITH cte1 AS (SELECT 40 AS j UNION ALL SELECT 42)
        |SELECT f.j AS j
        |FROM (SELECT max(j) AS j FROM cte1) f
        |WHERE f.j = (SELECT max(j) FROM cte1)""".stripMargin,

    // test/sql/cte/test_cte.test: one CTE feeding both branches of a
    // UNION ALL and both sides of a self-join
    "slt_cte_multi_consumer" ->
      """WITH t(v) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT CAST(sum(v) AS BIGINT) AS s, count(*) AS n FROM (
        |  SELECT a.v AS v FROM t a JOIN t b ON a.v = b.v
        |  UNION ALL
        |  SELECT v FROM t WHERE v > 1) u""".stripMargin,

    // ------------------------------------------ round-8c decimal slice
    // (test/sql/types/decimal/, 22 files, previously one pin). Result
    // types are always forced with CAST — the engines' arithmetic
    // result-scale rules differ even where values agree. Known
    // UNPINNABLE divergences (deliberately absent): decimal→int casts
    // round in DuckDB but truncate in Spark; DuckDB renders 0<x<1
    // decimals without the leading zero ('.5').
    // test_decimal_from_string.test: exact string parse + half-up at the
    // target scale (no double in the path). Result cells rendered as
    // DOUBLE per the third Q.scala convention (DECIMAL cells are
    // driver-hash-unstable); the parse+round under test stays decimal.
    "slt_dec_cast_string" ->
      """SELECT CAST(CAST('1.005' AS DECIMAL(10,2)) AS DOUBLE) AS up,
        | CAST(CAST('-1.005' AS DECIMAL(10,2)) AS DOUBLE) AS dn,
        | CAST(CAST('  42.42  ' AS DECIMAL(10,2)) AS DOUBLE) AS sp,
        | CAST(CAST('0.00' AS DECIMAL(4,2)) AS DOUBLE) AS z""".stripMargin,

    // decimal_arithmetic.test: addition across scales and with integers
    "slt_dec_add_scales" ->
      """SELECT CAST(CAST(CAST('0.5' AS DECIMAL(1,1)) + CAST('100.0' AS DECIMAL(4,1))
        |   AS DECIMAL(10,1)) AS DOUBLE) AS s,
        | CAST(CAST(CAST('0.54321' AS DECIMAL(6,5)) + 10000 AS DECIMAL(12,5)) AS DOUBLE) AS t,
        | CAST(CAST(CAST('0.5' AS DECIMAL(1,1)) + (-1) AS DECIMAL(10,1)) AS DOUBLE) AS neg""".stripMargin,

    // decimal multiplication: scale accumulates, sign carries
    "slt_dec_mul_scales" ->
      """SELECT CAST(CAST(CAST('1.25' AS DECIMAL(5,2)) * CAST('0.40' AS DECIMAL(5,2))
        |   AS DECIMAL(10,4)) AS DOUBLE) AS m,
        | CAST(CAST(CAST('-1.5' AS DECIMAL(5,1)) * 3 AS DECIMAL(10,1)) AS DOUBLE) AS n,
        | CAST(CAST(CAST('0.1' AS DECIMAL(2,1)) * CAST('0.1' AS DECIMAL(2,1))
        |   AS DECIMAL(6,2)) AS DOUBLE) AS tiny""".stripMargin,

    // decimal_try_cast.test: overflow → NULL under TRY_CAST, value fits →
    // rounds to target scale
    "slt_dec_try_overflow" ->
      """SELECT CAST(TRY_CAST(1000 AS DECIMAL(3,0)) AS DOUBLE) AS of1,
        | CAST(TRY_CAST(100 AS DECIMAL(3,0)) AS DOUBLE) AS ok1,
        | CAST(TRY_CAST('12.345' AS DECIMAL(4,2)) AS DOUBLE) AS rnd,
        | CAST(TRY_CAST(CAST('99.99' AS DECIMAL(4,2)) AS DECIMAL(3,2)) AS DOUBLE) AS of2""".stripMargin,

    // decimal_aggregates.test: sum/avg/min/max over decimals, types forced
    "slt_dec_agg_forced" ->
      """WITH t(v) AS (
        |  SELECT CAST('1.10' AS DECIMAL(6,2)) UNION ALL
        |  SELECT CAST('2.05' AS DECIMAL(6,2)) UNION ALL
        |  SELECT CAST('-0.15' AS DECIMAL(6,2)))
        |SELECT CAST(CAST(sum(v) AS DECIMAL(12,2)) AS DOUBLE) AS s,
        | CAST(CAST(avg(v) AS DECIMAL(12,4)) AS DOUBLE) AS a,
        | CAST(CAST(min(v) AS DECIMAL(6,2)) AS DOUBLE) AS mn,
        | CAST(CAST(max(v) AS DECIMAL(6,2)) AS DOUBLE) AS mx,
        | count(v) AS n
        |FROM t""".stripMargin,

    // test_decimal_ops.test: comparisons across scales compare VALUES
    // (1.10 = 1.1), mixed with integer literals
    "slt_dec_compare_mixed" ->
      """SELECT CAST('1.10' AS DECIMAL(5,2)) = CAST('1.1' AS DECIMAL(3,1)) AS eq,
        | CAST('0.5' AS DECIMAL(1,1)) < 1 AS lt,
        | CAST('2.50' AS DECIMAL(5,2))
        |   BETWEEN CAST('2.5' AS DECIMAL(2,1)) AND 3 AS bt,
        | CAST('-0.5' AS DECIMAL(2,1)) > CAST('-1.5' AS DECIMAL(2,1)) AS gt""".stripMargin,

    // floor/ceil toward ±infinity, abs, unary minus on decimals
    "slt_dec_floor_ceil_abs" ->
      """SELECT CAST(CAST(floor(CAST('-1.5' AS DECIMAL(4,1))) AS DECIMAL(6,1)) AS DOUBLE) AS f,
        | CAST(CAST(ceil(CAST('-1.5' AS DECIMAL(4,1))) AS DECIMAL(6,1)) AS DOUBLE) AS c,
        | CAST(CAST(abs(CAST('-1.5' AS DECIMAL(4,1))) AS DECIMAL(6,1)) AS DOUBLE) AS ab,
        | CAST(CAST(-(CAST('1.5' AS DECIMAL(4,1))) AS DECIMAL(6,1)) AS DOUBLE) AS neg""".stripMargin,

    // round() on decimals: half away from zero at positive digits,
    // negative digits round whole places
    "slt_dec_round_scales" ->
      """SELECT CAST(CAST(round(CAST('2.345' AS DECIMAL(6,3)), 2) AS DECIMAL(6,2)) AS DOUBLE) AS r1,
        | CAST(CAST(round(CAST('-2.345' AS DECIMAL(6,3)), 2) AS DECIMAL(6,2)) AS DOUBLE) AS r2,
        | CAST(CAST(round(CAST('125' AS DECIMAL(4,0)), -1) AS DECIMAL(6,0)) AS DOUBLE) AS r3""".stripMargin,

    // mod over decimals keeps the dividend's sign
    "slt_dec_mod_sign" ->
      """SELECT CAST(CAST(mod(CAST('7.5' AS DECIMAL(4,1)), CAST('2.0' AS DECIMAL(4,1)))
        |   AS DECIMAL(6,1)) AS DOUBLE) AS m1,
        | CAST(CAST(mod(CAST('-7.5' AS DECIMAL(4,1)), CAST('2.0' AS DECIMAL(4,1)))
        |   AS DECIMAL(6,1)) AS DOUBLE) AS m2""".stripMargin,

    // -------------------------------------- round-8c timestamp edges
    // (test/sql/types/timestamp/). Dialect notes: EXTRACT(SECOND) is an
    // integer in DuckDB but DECIMAL(8,6) in Spark (CAST-forced below);
    // epoch()/TIME arithmetic/interval rendering stay out (no shared
    // spelling).
    // test_incorrect_timestamp.test: invalid month/day and the non-leap
    // Feb 29 → NULL under TRY_CAST; real leap day parses
    "slt_ts_try_invalid" ->
      """SELECT TRY_CAST('2026-13-40 00:00:00' AS TIMESTAMP) AS bad_month,
        | TRY_CAST('not a timestamp' AS TIMESTAMP) AS garbage,
        | TRY_CAST('2026-02-29 00:00:00' AS TIMESTAMP) AS nonleap,
        | TRY_CAST('2024-02-29 12:00:00' AS TIMESTAMP) AS leap""".stripMargin,

    // test_timestamp_auto_casting.test / alternative_timestamp_casts:
    // date-only → midnight, ISO 'T' separator, fractional micros survive
    "slt_ts_parse_forms" ->
      """SELECT CAST('2026-08-14' AS TIMESTAMP) AS dateonly,
        | CAST('2026-08-14T05:06:07' AS TIMESTAMP) AS tform,
        | CAST('2026-08-14 05:06:07.123456' AS TIMESTAMP) AS micros""".stripMargin,

    // test_timestamp.test: part extraction; SECOND truncated to INT on
    // both sides (Spark's EXTRACT(SECOND) is DECIMAL(8,6))
    "slt_ts_extract_int" ->
      """SELECT CAST(EXTRACT(YEAR FROM TIMESTAMP '2026-08-14 05:06:07.123456') AS INT) AS y,
        | CAST(EXTRACT(MONTH FROM TIMESTAMP '2026-08-14 05:06:07') AS INT) AS mo,
        | CAST(EXTRACT(DAY FROM TIMESTAMP '2026-08-14 05:06:07') AS INT) AS d,
        | CAST(EXTRACT(HOUR FROM TIMESTAMP '2026-08-14 05:06:07') AS INT) AS h,
        | CAST(EXTRACT(MINUTE FROM TIMESTAMP '2026-08-14 05:06:07') AS INT) AS mi,
        | CAST(EXTRACT(SECOND FROM TIMESTAMP '2026-08-14 05:06:07.999999') AS INT) AS s""".stripMargin,

    // timestamp ↔ date comparison coerces the date to midnight
    "slt_ts_date_compare" ->
      """SELECT TIMESTAMP '2026-08-14 00:00:00' = CAST(DATE '2026-08-14' AS TIMESTAMP) AS eq,
        | TIMESTAMP '2026-08-14 00:00:01' > DATE '2026-08-14' AS gt,
        | TIMESTAMP '2026-08-13 23:59:59' < DATE '2026-08-14' AS lt""".stripMargin,

    // sub-day date_trunc floors (minute/second/hour) — pins the micros
    // arithmetic fast path against the oracle, fractional seconds dropped
    "slt_ts_trunc_subday" ->
      """SELECT date_trunc('minute', TIMESTAMP '2026-08-14 05:06:37.9') AS tmin,
        | date_trunc('second', TIMESTAMP '2026-08-14 05:06:37.9') AS tsec,
        | date_trunc('hour', TIMESTAMP '2026-08-14 05:36:37') AS thr""".stripMargin,

    // test/sql/function/string/test_trim.test: character-set trim in the
    // BOTH/LEADING/TRAILING FROM form (every char in the set strips).
    // (overlay()/initcap() are absent from the oracle engine; concat()'s
    // NULL handling and empty-pad lpad() diverge — none pinnable.)
    "slt_trim_charset" ->
      """SELECT trim(BOTH 'xy' FROM 'xyhixyx') AS b,
        | trim(LEADING 'x' FROM 'xxhix') AS l,
        | trim(TRAILING 'x' FROM 'xxhix') AS t,
        | trim(BOTH 'x' FROM 'xxx') AS empty_all""".stripMargin,

    // timestamp_limits.test shape: extreme pre-1970 and far-future
    // instants cast to DATE (negative-micros floor division). Cells
    // rendered as ISO strings per the third Q.scala convention —
    // extreme/pre-Gregorian DATE cells hit the driver hash's parquet
    // date-rebase divergence; the ts→DATE floor under test is unchanged.
    "slt_ts_extreme_range" ->
      """SELECT CAST(CAST(TIMESTAMP '0001-01-01 00:00:00' AS DATE) AS STRING) AS lo,
        | CAST(CAST(TIMESTAMP '1754-08-30 22:43:41' AS DATE) AS STRING) AS pre_epoch,
        | CAST(CAST(TIMESTAMP '9999-12-31 23:59:59' AS DATE) AS STRING) AS hi,
        | CAST(CAST(TIMESTAMP '1969-12-31 23:59:59' AS DATE) AS STRING) AS eve""".stripMargin,

    // ------------------------------------------ r10 widening: interval
    // & date edges (test/sql/types/interval/, test/sql/types/date/).
    // DATE + INTERVAL returns TIMESTAMP in the oracle engine but DATE in
    // Spark, so date-valued results are CAST AS DATE on the shared text.
    // test/sql/types/interval/test_interval_addition.test: month-end
    // clamping, leap-year anniversaries, sub-day rollover across
    // midnight / year boundaries
    "slt_interval_add_clamp" ->
      """SELECT CAST(DATE '2000-01-31' + INTERVAL '1' MONTH AS DATE) AS month_clamp,
        | CAST(DATE '2000-02-29' + INTERVAL '1' YEAR AS DATE) AS leap_anniv,
        | CAST(DATE '1999-12-31' + INTERVAL '2' MONTH AS DATE) AS year_cross,
        | TIMESTAMP '2000-01-01 23:30:00' + INTERVAL '45' MINUTE AS minute_roll,
        | TIMESTAMP '2000-12-31 23:59:30' + INTERVAL '31' SECOND AS year_tick""".stripMargin,

    // test/sql/types/date/date_parts.test: ISO WEEK spans year
    // boundaries (2000-01-01 is week 52 of 1999, 1999-01-01 week 53 of
    // 1998); DOY, QUARTER. (DOW is NOT pinnable: the oracle counts
    // Sunday=0, Spark Sunday=1.)
    "slt_date_iso_week_edges" ->
      """SELECT EXTRACT(WEEK FROM DATE '2001-01-01') AS w_jan1,
        | EXTRACT(WEEK FROM DATE '2000-01-01') AS w_prev52,
        | EXTRACT(WEEK FROM DATE '1999-01-01') AS w_prev53,
        | EXTRACT(WEEK FROM DATE '1998-12-31') AS w_dec31,
        | EXTRACT(DOY FROM DATE '2001-02-01') AS doy,
        | EXTRACT(QUARTER FROM DATE '2001-05-01') AS qtr""".stripMargin,

    // test/sql/types/test_date_cast.test: lenient string→DATE casts
    // (single-digit fields, surrounding whitespace) and DATE→STRING ISO
    "slt_date_lenient_cast" ->
      """SELECT CAST('2001-2-3' AS DATE) AS single_digit,
        | CAST('  2001-02-03  ' AS DATE) AS padded,
        | CAST(DATE '2001-02-03' AS STRING) AS iso_render,
        | make_date(2001, 2, 3) AS made""".stripMargin,

    // test/sql/functions/date/test_date_trunc.test + last_day leap edges
    "slt_date_trunc_lastday" ->
      """SELECT CAST(date_trunc('quarter', DATE '2001-05-15') AS DATE) AS q2,
        | CAST(date_trunc('year', DATE '2001-05-15') AS DATE) AS y,
        | CAST(date_trunc('week', DATE '2001-05-17') AS DATE) AS wk_monday,
        | last_day(DATE '2000-02-01') AS leap_feb,
        | last_day(DATE '1900-02-01') AS century_feb""".stripMargin,

    // date_add over int days, negative into a leap day
    "slt_date_add_days" ->
      """SELECT date_add(DATE '2000-01-01', 90) AS fwd,
        | date_add(DATE '2000-03-01', -1) AS leap_back,
        | date_add(DATE '1999-12-31', 1) AS y2k""".stripMargin,

    // --------------------------------------------- r10: string edges
    // (test/sql/function/string/). Negative-start substring counts from
    // the end in BOTH dialects; start 0 is NOT pinnable (the oracle
    // consumes length from position 0, Spark treats 0 as 1).
    "slt_str_substring_neg" ->
      """SELECT substring('abcdef', -2) AS last2,
        | substring('abcdef', -3, 2) AS mid_from_end,
        | substring('abcdef', 2) AS from2,
        | substring('abcdef', 3, 200) AS overrun""".stripMargin,

    // test/sql/function/string/test_split_part: 1-based, out-of-range
    // yields empty string, negative counts from the end
    "slt_str_split_part" ->
      """SELECT split_part('a,b,c', ',', 2) AS mid,
        | split_part('a,b,c', ',', 9) AS past_end,
        | split_part('a,b,c', ',', -1) AS from_end,
        | split_part('abc', ',', 1) AS no_delim""".stripMargin,

    // test/sql/function/string/test_pad.test: lpad truncates when the
    // target is SHORTER, repeats the pad string, empties on negative
    "slt_str_pad_edges" ->
      """SELECT lpad('abc', 2, 'x') AS truncated,
        | lpad('abc', 6, 'xy') AS repeated,
        | lpad('abc', -1, 'x') AS negative,
        | rpad('abc', 5, 'z') AS right_pad,
        | rpad('', 3, 'ab') AS from_empty""".stripMargin,

    // test/sql/function/string/test_repeat.test + reverse composition
    "slt_str_repeat_reverse" ->
      """SELECT repeat('ab', 0) AS zero,
        | repeat('ab', -1) AS negative,
        | repeat('xy', 3) AS thrice,
        | reverse(repeat('ab', 2)) AS rev_comp,
        | reverse('') AS rev_empty""".stripMargin,

    // test/sql/function/string/test_translate.test: shrinking map drops
    // unmatched source chars
    "slt_str_translate" ->
      """SELECT translate('abcba', 'ab', 'xy') AS swap,
        | translate('abc', 'abc', 'x') AS shrink,
        | translate('abc', '', '') AS identity""".stripMargin,

    // test/sql/function/string/test_position.test: 1-based instr, empty
    // needle matches at 1, miss yields 0 — both spellings
    "slt_str_position_instr" ->
      """SELECT instr('abcb', 'b') AS first_hit,
        | instr('abc', 'z') AS miss,
        | position('b' IN 'abcb') AS pos_syntax,
        | position('' IN 'abc') AS empty_needle""".stripMargin,

    // trailing-space comparisons are SIGNIFICANT (no CHAR padding)
    "slt_str_space_semantics" ->
      """SELECT 'ab' < 'ab ' AS shorter_lt,
        | 'ab' = 'ab ' AS not_eq,
        | length('  a  ') AS len_spaced,
        | length(trim('  a  ')) AS len_trimmed,
        | length('') AS len_empty""".stripMargin,

    // test/sql/function/string/test_levenshtein.test
    "slt_str_levenshtein" ->
      """SELECT levenshtein('kitten', 'sitting') AS classic,
        | levenshtein('abc', 'abc') AS same,
        | levenshtein('', 'abc') AS from_empty,
        | levenshtein('Case', 'case') AS case_sensitive""".stripMargin,

    // || NULL-propagates in BOTH dialects (unlike concat(), whose NULL
    // skipping diverges and is not pinnable)
    "slt_str_pipe_concat" ->
      """SELECT 'a' || NULL AS null_prop,
        | 'a' || 'b' || 'c' AS chain,
        | '' || 'x' AS empty_lead,
        | CAST(42 AS STRING) || '!' AS from_int""".stripMargin,

    // test/sql/function/string/test_ascii.test: ascii('') is 0; chr
    // round-trips
    "slt_str_ascii_chr" ->
      """SELECT ascii('') AS empty_zero,
        | ascii('A') AS upper_a,
        | chr(66) AS b_char,
        | chr(ascii('z')) AS round_trip""".stripMargin,

    // LIKE with an explicit ESCAPE character (test/sql/function/string/
    // test_like.test): escaped % and _ match literally
    "slt_str_like_escape" ->
      """SELECT '50%' LIKE '50!%' ESCAPE '!' AS pct_literal,
        | 'a_b' LIKE 'a!_b' ESCAPE '!' AS underscore_literal,
        | 'axb' LIKE 'a!_b' ESCAPE '!' AS no_wildcard,
        | 'axb' LIKE 'a_b' AS wildcard_works""".stripMargin,

    // positive left/right incl. oversize take (negative counts DIVERGE:
    // the oracle drops |n| from the opposite end, Spark yields empty)
    "slt_str_left_right" ->
      """SELECT left('abcdef', 2) AS l2,
        | right('abcdef', 2) AS r2,
        | left('ab', 10) AS l_oversize,
        | right('', 3) AS r_empty""".stripMargin,

    // ------------------------------------------------ r10: blob edges
    // (test/sql/types/blob/). BLOB literals aren't shared syntax, but
    // unhex/hex are identical bridges; blob comparison is bytewise
    "slt_blob_hex_roundtrip" ->
      """SELECT hex(unhex('aabb')) AS upper_render,
        | hex(unhex('AABB')) AS case_insensitive_in,
        | octet_length(unhex('aabbcc')) AS three_bytes,
        | octet_length(unhex('')) AS empty""".stripMargin,

    "slt_blob_compare" ->
      """SELECT unhex('00') < unhex('01') AS bytewise_lt,
        | unhex('0a') = unhex('0A') AS eq_same_bytes,
        | unhex('ff') > unhex('00ff') AS length_after_prefix""".stripMargin,

    // ------------------------------------------------ r10: math edges
    // (test/sql/function/numeric/). round() is HALF AWAY FROM ZERO in
    // both dialects for decimal AND double at representable halves
    "slt_math_round_half" ->
      """SELECT CAST(round(2.5) AS BIGINT) AS dec_up,
        | CAST(round(3.5) AS BIGINT) AS dec_up2,
        | CAST(round(-2.5) AS BIGINT) AS dec_away,
        | round(CAST(2.5 AS DOUBLE)) AS dbl_up,
        | round(CAST(3.5 AS DOUBLE)) AS dbl_up2""".stripMargin,

    // floor/ceiling on negatives, decimal and double forms
    "slt_math_floor_ceiling" ->
      """SELECT CAST(floor(-1.5) AS BIGINT) AS flr_neg,
        | CAST(ceiling(-1.5) AS BIGINT) AS ceil_neg,
        | CAST(ceil(1.5) AS BIGINT) AS ceil_pos,
        | CAST(floor(CAST(-1.5 AS DOUBLE)) AS BIGINT) AS flr_dbl""".stripMargin,

    // bitwise AND/OR and % sign (follows the dividend in both)
    "slt_math_bit_mod" ->
      """SELECT 5 & 3 AS b_and,
        | 5 | 3 AS b_or,
        | 12 % 5 AS pos_mod,
        | -12 % 5 AS neg_mod,
        | mod(-7, 3) AS mod_fn,
        | mod(7, -3) AS mod_fn2""".stripMargin,

    // log family identities (exact at these points in ieee754)
    "slt_math_log_family" ->
      """SELECT log(2, 8) AS log2_8,
        | log10(1000) AS log10_1k,
        | ln(1) AS ln_1,
        | exp(0) AS exp_0,
        | exp(1) BETWEEN 2.718 AND 2.719 AS e_band""".stripMargin,

    // power/sqrt exact points + rounded trig (bit-identical libm results
    // are NOT assumed — 10-digit round is)
    "slt_math_power_trig" ->
      """SELECT power(2, 10) AS p1024,
        | sqrt(16) AS four,
        | round(pi(), 8) AS pi8,
        | round(sin(1), 10) AS sin1,
        | round(cos(1), 10) AS cos1,
        | round(atan2(1, 2), 10) AS at2""".stripMargin,

    // greatest/least type promotion and non-numeric orderings
    "slt_math_greatest_promote" ->
      """SELECT CAST(greatest(1, 2.5) AS DOUBLE) AS int_vs_dec,
        | greatest(DATE '2001-01-01', DATE '2002-01-01') AS later_date,
        | least('b', 'a', 'c') AS min_string,
        | least(3, NULL, 1) AS null_skipped""".stripMargin,

    // ------------------------------------------- r10: misc semantics
    // IN with a NULL member, scalar context: hit → true, miss → NULL
    // (not false); table-filter counterpart is slt_in_list_null
    "slt_in_scalar_null" ->
      """SELECT 1 IN (1, NULL) AS hit_true,
        | 1 IN (2, NULL) AS miss_null,
        | NULL IN (1, 2) AS null_lhs,
        | 1 NOT IN (2, NULL) AS not_in_null""".stripMargin,

    // if()/ifnull()/nullif() shared conditional spellings
    "slt_cond_if_ifnull" ->
      """SELECT if(1 < 2, 'y', 'n') AS if_true,
        | ifnull(NULL, 7) AS from_null,
        | ifnull(3, 7) AS not_null,
        | nullif(3, 3) AS to_null,
        | coalesce(NULL, nullif(1, 1), 9) AS chained""".stripMargin,

    // ------------------------------------------- r10 batch 2 widening
    // test/sql/types/timestamp/: string→TIMESTAMP casts with fractional
    // seconds; TIMESTAMP vs DATE comparisons coerce
    "slt_ts_cast_compare" ->
      """SELECT CAST('2001-02-03 04:05:06' AS TIMESTAMP) AS plain,
        | CAST('2001-02-03 04:05:06.789' AS TIMESTAMP) AS fractional,
        | TIMESTAMP '2001-02-03 00:00:00' = DATE '2001-02-03' AS midnight_eq,
        | TIMESTAMP '2001-02-03 01:00:00' > DATE '2001-02-03' AS later_gt""".stripMargin,

    // EXTRACT over time fields; SECOND is cast (the oracle yields int,
    // Spark DECIMAL(8,6) — the known type-sensitive cell)
    "slt_ts_extract_time" ->
      """SELECT EXTRACT(HOUR FROM TIMESTAMP '2001-02-03 04:05:06') AS hr,
        | EXTRACT(MINUTE FROM TIMESTAMP '2001-02-03 04:05:06') AS mi,
        | CAST(EXTRACT(SECOND FROM TIMESTAMP '2001-02-03 04:05:06') AS BIGINT) AS sec,
        | quarter(DATE '2001-05-06') AS qtr,
        | weekofyear(DATE '2001-01-01') AS woy""".stripMargin,

    // sub-day date_trunc; 'day' returns DATE in the oracle engine and
    // TIMESTAMP in Spark → CAST on the shared text (fractional-second
    // variant lives in slt_ts_trunc_subday)
    "slt_ts_trunc_day_cast" ->
      """SELECT CAST(date_trunc('day', TIMESTAMP '2001-02-03 04:05:06') AS TIMESTAMP) AS d,
        | date_trunc('hour', TIMESTAMP '2001-02-03 04:35:06') AS h,
        | date_trunc('minute', TIMESTAMP '2001-02-03 04:05:36') AS m""".stripMargin,

    // test/sql/function/string/regex: same regexp_extract(str, re, grp)
    // signature — group 0 is the whole match, no-match yields ''
    "slt_regexp_extract_groups" ->
      """SELECT regexp_extract('a123b', '([0-9]+)', 1) AS grp1,
        | regexp_extract('abc', '([0-9]+)', 1) AS no_match,
        | regexp_extract('a123b', '[0-9]+', 0) AS whole""".stripMargin,

    // three-valued logic short circuits: NULL AND false IS false,
    // NULL OR true IS true
    "slt_bool_three_valued" ->
      """SELECT (NULL AND false) AS and_false,
        | (NULL AND true) AS and_true,
        | (NULL OR true) AS or_true,
        | (NULL OR false) AS or_false,
        | (NOT CAST(NULL AS BOOLEAN)) AS not_null""".stripMargin,

    // test/sql/types/float/: Infinity/NaN casts; NaN compares EQUAL to
    // itself and largest in both engines
    "slt_float_inf_nan_cast" ->
      """SELECT CAST('Infinity' AS DOUBLE) > 1e308 AS inf_big,
        | CAST('-Infinity' AS DOUBLE) < -1e308 AS ninf_small,
        | CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE) AS nan_self_eq,
        | isnan(CAST('NaN' AS DOUBLE)) AS is_nan""".stripMargin,

    // round to NEGATIVE digits (tens/hundreds), decimal + double
    "slt_math_round_negative_digits" ->
      """SELECT CAST(round(1234.5, -2) AS BIGINT) AS dec_hundreds,
        | round(CAST(1234.5 AS DOUBLE), -2) AS dbl_hundreds,
        | CAST(round(1555.0, -1) AS BIGINT) AS dec_tens""".stripMargin,

    // power edges: 0^0 is 1, negative bases, negative exponents
    "slt_math_power_edges" ->
      """SELECT power(0, 0) AS zero_zero,
        | power(-2, 3) AS neg_base,
        | power(2, -1) AS neg_exp""".stripMargin,

    // bitwise NOT and shifts share operator spellings
    "slt_math_bitnot_shift" ->
      """SELECT ~5 AS not5, ~0 AS not0,
        | 1 << 4 AS shl, 256 >> 3 AS shr""".stripMargin,

    // ILIKE (case-insensitive) vs LIKE; NULL pattern/input propagate
    "slt_str_ilike" ->
      """SELECT 'AbC' ILIKE 'abc' AS ci_eq,
        | 'AbC' ILIKE 'a%' AS ci_prefix,
        | 'AbC' LIKE 'abc' AS cs_ne,
        | ('a' LIKE NULL) AS null_pattern,
        | (NULL LIKE 'a') AS null_input""".stripMargin,

    // VARCHAR ordering is lexicographic, not numeric
    "slt_str_lexicographic_max" ->
      """WITH t(x) AS (SELECT '10' UNION ALL SELECT '9' UNION ALL SELECT '100')
        |SELECT max(x) AS mx, min(x) AS mn FROM t""".stripMargin,

    // --------------------------------------------- round-10b widening
    // test/sql/function/string/test_levenshtein.test: edit distance,
    // empty operand = other's length both directions, identity = 0
    // (case-sensitivity arm is in slt_str_levenshtein)
    "slt_str_levenshtein_empty" ->
      """SELECT levenshtein('kitten', 'sitting') AS ks,
        | levenshtein('', 'abc') AS from_empty,
        | levenshtein('abc', '') AS to_empty,
        | levenshtein('abc', 'abc') AS same""".stripMargin,

    // test/sql/function/string/md5.test: md5 hex digest, empty-string
    // digest, NULL propagation
    "slt_str_md5" ->
      """SELECT md5('abc') AS h_abc, md5('') AS h_empty,
        | md5(CAST(NULL AS STRING)) AS h_null""".stripMargin,

    // test/sql/function/string/hex.test + test_ascii.test: hex of an
    // integer has no leading zeros, hex of a string is its utf8 bytes;
    // ascii/chr are codepoint converses
    "slt_str_hex_ascii_chr" ->
      """SELECT hex(255) AS hex_int, hex('abc') AS hex_str,
        | ascii('A') AS ascii_a, chr(66) AS chr_66,
        | ascii('') AS ascii_empty""".stripMargin,

    // test/sql/function/string/test_contains.test + test_instr.test:
    // contains/instr/position agree on 1-based first match, 0 = no match
    "slt_str_contains_position" ->
      """SELECT contains('abcabc', 'bc') AS has_bc,
        | contains('abcabc', 'xy') AS has_xy,
        | instr('abcabc', 'b') AS first_b,
        | instr('abcabc', 'zz') AS no_match,
        | (position('b' IN 'abc')) AS pos_b""".stripMargin,

    // test/sql/function/generic/least_greatest_types.test: NULL operands
    // are SKIPPED (not propagated); all-NULL yields NULL; works on
    // strings and dates
    "slt_generic_least_greatest" ->
      """SELECT greatest(1, CAST(NULL AS INT), 3) AS g_skip_null,
        | least('b', CAST(NULL AS STRING), 'a') AS l_str,
        | greatest(CAST(NULL AS INT), CAST(NULL AS INT)) AS g_all_null,
        | least(DATE '2020-01-01', DATE '2019-06-01', CAST(NULL AS DATE)) AS l_date""".stripMargin,

    // test/sql/function/date/test_date_part.test (last_day rows):
    // month-end incl. leap February and year-end
    "slt_date_last_day" ->
      """SELECT last_day(DATE '2000-02-01') AS leap_feb,
        | last_day(DATE '1999-02-03') AS nonleap_feb,
        | last_day(DATE '2000-12-31') AS already_end""".stripMargin,

    // test/sql/function/numeric/test_bit_count.test: popcount over
    // BIGINT — the operand is cast explicitly because the engines'
    // default integer widths differ (bit_count(-1) is 32 on a DuckDB
    // INTEGER but 64 on a BIGINT; Spark's literal is already wide)
    "slt_math_bit_count" ->
      """SELECT bit_count(CAST(255 AS BIGINT)) AS c255,
        | bit_count(CAST(0 AS BIGINT)) AS c0,
        | bit_count(CAST(-1 AS BIGINT)) AS cneg1,
        | bit_count(CAST(1024 AS BIGINT)) AS c1024""".stripMargin,

    // test/sql/function/string/test_concat_ws.test: NULL arguments are
    // skipped (no doubled separator), all-NULL gives '', empty separator
    "slt_str_concat_ws" ->
      """SELECT concat_ws('-', 'a', CAST(NULL AS STRING), 'b') AS skip_null,
        | concat_ws('-', CAST(NULL AS STRING), CAST(NULL AS STRING)) AS all_null,
        | concat_ws('', 'x', 'y') AS empty_sep""".stripMargin,

    // test/sql/aggregate/aggregates/test_bool.test: bool_and/bool_or
    // skip NULLs; all-NULL input yields NULL — with count(v) alongside
    // (plain grouped arm is slt_agg_bool_and_or)
    "slt_agg_bool_count" ->
      """WITH t(g, v) AS (
        |  SELECT 1, true UNION ALL SELECT 1, false UNION ALL SELECT 1, CAST(NULL AS BOOLEAN)
        |  UNION ALL SELECT 2, true UNION ALL SELECT 2, true
        |  UNION ALL SELECT 3, CAST(NULL AS BOOLEAN))
        |SELECT g, bool_and(v) AS ba, bool_or(v) AS bo, count(v) AS n_v
        |FROM t GROUP BY g ORDER BY g""".stripMargin,

    // test/sql/window/test_ntile.test: remainder buckets lead (7 rows
    // over 3 tiles -> 3/2/2), deterministic on a unique ORDER BY
    // (multi-width arm over 5 rows is slt_win_ntile)
    "slt_win_ntile_remainder" ->
      """WITH t(x) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3
        |  UNION ALL SELECT 4 UNION ALL SELECT 5 UNION ALL SELECT 6 UNION ALL SELECT 7)
        |SELECT x, ntile(3) OVER (ORDER BY x) AS tile
        |FROM t ORDER BY x""".stripMargin,

    // types/*/..._try_cast.test family: whitespace-trimmed integers,
    // sign prefixes, bare-dot doubles, overflow-to-Infinity, and garbage
    // -> NULL. (try_cast('4.5' AS INT) is NOT pinned: DuckDB rounds to 5,
    // Spark returns NULL — a documented dialect divergence.)
    "slt_try_cast_edges" ->
      """SELECT try_cast('  42 ' AS INT) AS ws_trim,
        | try_cast('0042' AS INT) AS leading_zeros,
        | try_cast('+7' AS INT) AS plus_sign,
        | try_cast('.5' AS DOUBLE) AS bare_dot,
        | try_cast('1e999' AS DOUBLE) AS overflow_inf,
        | try_cast('abc' AS INT) AS garbage""".stripMargin,

    // test/sql/function/string/test_printf.test: %d/%s/%% formatting.
    // (A NULL argument is NOT pinned: Spark's Java Formatter renders it
    // as the string 'null', DuckDB propagates SQL NULL.)
    "slt_str_printf" ->
      """SELECT printf('%d-%s', 7, 'x') AS basic,
        | printf('%d%%', 50) AS pct_escape""".stripMargin,

    // test/sql/cast/boolean_autocast.test: string<->boolean<->int casts.
    // Pinned surface: 't'/'f'/'true'/'FALSE'/'1'/'0' strings, int 0 =
    // false / nonzero = true, boolean -> 0/1. NOT pinned (probed
    // divergent): Spark's try_cast also accepts 'yes'/'no' and trims
    // whitespace (' true '), DuckDB returns NULL for all three.
    "slt_bool_cast" ->
      """SELECT CAST('t' AS BOOLEAN) AS s_t, CAST('f' AS BOOLEAN) AS s_f,
        | CAST('true' AS BOOLEAN) AS s_true, CAST('FALSE' AS BOOLEAN) AS s_false,
        | CAST('1' AS BOOLEAN) AS s_one, CAST('0' AS BOOLEAN) AS s_zero,
        | try_cast('T' AS BOOLEAN) AS s_big_t, try_cast('2' AS BOOLEAN) AS s_two,
        | CAST(true AS INT) AS b_to_1, CAST(false AS INT) AS b_to_0,
        | CAST(1 AS BOOLEAN) AS i_one, CAST(0 AS BOOLEAN) AS i_zero,
        | CAST(-3 AS BOOLEAN) AS i_neg""".stripMargin,

    // scalar IS [NOT] DISTINCT FROM is NULL-safe two-valued logic
    "slt_is_distinct_scalar" ->
      """SELECT 1 IS DISTINCT FROM 2 AS d12,
        | 1 IS DISTINCT FROM CAST(NULL AS INT) AS d1n,
        | CAST(NULL AS INT) IS NOT DISTINCT FROM CAST(NULL AS INT) AS ndnn,
        | 'a' IS NOT DISTINCT FROM 'a' AS ndaa""".stripMargin,

    // test/sql/subquery/any_all/test_simple_not_in.test: NOT IN over a
    // subquery CONTAINING a NULL is three-valued — no row can prove
    // non-membership, so the result is EMPTY (the literal-list analog is
    // slt_in_list_null); without the NULL the anti-join semantics return
    // the non-members, and a NULL probe row never qualifies
    "slt_not_in_null_subquery" ->
      """WITH t(g) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT CAST(NULL AS INT)),
        |     u(g) AS (SELECT 2 UNION ALL SELECT CAST(NULL AS INT)),
        |     w(g) AS (SELECT 2 UNION ALL SELECT 3)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM t
        |   WHERE t.g NOT IN (SELECT g FROM u)) AS n_with_null,
        |  (SELECT CAST(count(*) AS BIGINT) FROM t
        |   WHERE t.g NOT IN (SELECT g FROM w)) AS n_without_null,
        |  (SELECT min(t.g) FROM t
        |   WHERE t.g IN (SELECT g FROM u)) AS in_member""".stripMargin,

    // ------------------------------------- r12b: packed-grouping edges
    // (the multi-key packed aggregate routes these shapes at the gate
    // fixture — no stats metadata — so each pin exercises its key
    // widening/hash/intern surface end-to-end vs the oracle)

    // test/sql/aggregate/group/group_by_limits.test: grouping on the
    // extreme values of every integer width (sign-extension through the
    // long-widened key must be lossless; BIGINT limits hash/compare raw)
    "slt_group_numeric_limits" ->
      """WITH t(t8, t16, t32, t64) AS (
        |  SELECT CAST(-128 AS TINYINT), CAST(-32768 AS SMALLINT),
        |         CAST(-2147483648 AS INT), CAST(-9223372036854775808 AS BIGINT)
        |  UNION ALL
        |  SELECT CAST(127 AS TINYINT), CAST(32767 AS SMALLINT),
        |         CAST(2147483647 AS INT), CAST(9223372036854775807 AS BIGINT)
        |  UNION ALL
        |  SELECT CAST(127 AS TINYINT), CAST(32767 AS SMALLINT),
        |         CAST(2147483647 AS INT), CAST(9223372036854775807 AS BIGINT))
        |SELECT t8, t16, t32, t64, count(*) AS n
        |FROM t GROUP BY t8, t16, t32, t64 ORDER BY t8, t16, t32, t64""".stripMargin,

    // test/sql/aggregate/group/test_group_by_large_string.test: large
    // (multi-KB) string keys group correctly — the interned-pool growth
    // path; two long keys sharing a 4000-char prefix must stay distinct
    "slt_group_large_strings" ->
      """WITH t(a, b) AS (
        |  SELECT repeat('x', 4000) || 'tailA', 22
        |  UNION ALL SELECT repeat('x', 4000) || 'tailB', 5
        |  UNION ALL SELECT repeat('x', 4000) || 'tailA', 21
        |  UNION ALL SELECT 'short', 1)
        |SELECT length(a) AS key_len, substr(a, 4001, 5) AS tail,
        |       CAST(sum(b) AS BIGINT) AS s, count(*) AS n
        |FROM t GROUP BY a ORDER BY key_len, tail""".stripMargin,

    // test/sql/aggregate/group/test_group_null.test +
    // test_group_by_multi_column.test: NULL, 0, and '' are THREE distinct
    // composite keys; NULL groups aggregate normally
    "slt_group_null_vs_empty_key" ->
      """WITH t(k, s, v) AS (
        |  SELECT CAST(NULL AS INT), '', 1 UNION ALL SELECT 0, '', 2
        |  UNION ALL SELECT CAST(NULL AS INT), CAST(NULL AS STRING), 4
        |  UNION ALL SELECT 0, CAST(NULL AS STRING), 8
        |  UNION ALL SELECT CAST(NULL AS INT), '', 16 UNION ALL SELECT 0, 'x', 32)
        |SELECT k, s, CAST(sum(v) AS BIGINT) AS s_v, count(*) AS n
        |FROM t GROUP BY k, s
        |ORDER BY k NULLS FIRST, s NULLS FIRST""".stripMargin,

    // test/sql/types/date + group: composite DATE/TIMESTAMP keys widen
    // to long and convert back exactly (epoch edges both sides of 1970)
    "slt_group_temporal_keys" ->
      """WITH t(d, ts, v) AS (
        |  SELECT DATE '1969-12-31', TIMESTAMP '1969-12-31 23:59:59.999999', 1
        |  UNION ALL SELECT DATE '1970-01-01', TIMESTAMP '1970-01-01 00:00:00', 2
        |  UNION ALL SELECT DATE '1969-12-31', TIMESTAMP '1969-12-31 23:59:59.999999', 4
        |  UNION ALL SELECT DATE '2262-04-11', TIMESTAMP '2262-04-11 23:47:16.854775', 8)
        |SELECT d, ts, CAST(sum(v) AS BIGINT) AS s, count(*) AS n
        |FROM t GROUP BY d, ts ORDER BY d, ts""".stripMargin,

    // test/sql/aggregate/distinct/test_distinct_aggr.test over composite
    // string keys: the distinct rewrite's inner dedup level (buffer-mode
    // packed) must keep NULL-skipping count semantics per group
    "slt_group_distinct_composite" ->
      """WITH t(g, h, v) AS (
        |  SELECT 'a', 'x', 1 UNION ALL SELECT 'a', 'x', 1
        |  UNION ALL SELECT 'a', 'x', 2 UNION ALL SELECT 'a', 'y', CAST(NULL AS INT)
        |  UNION ALL SELECT 'b', 'x', 3 UNION ALL SELECT 'b', 'x', CAST(NULL AS INT))
        |SELECT g, h, count(DISTINCT v) AS nd, count(*) AS n,
        |       CAST(sum(v) AS BIGINT) AS s
        |FROM t GROUP BY g, h ORDER BY g, h""".stripMargin,

    // test/sql/aggregate/group/test_group_by_nested.test shape: grouping
    // by a computed expression key alongside plain keys (the partial
    // evaluates the expression; alignment with the final's attribute)
    "slt_group_computed_key" ->
      """WITH t(s, v) AS (
        |  SELECT 'apple', 1 UNION ALL SELECT 'avocado', 2
        |  UNION ALL SELECT 'banana', 4 UNION ALL SELECT 'apricot', 8
        |  UNION ALL SELECT 'blueberry', 16)
        |SELECT substr(s, 1, 1) AS initial, length(s) % 2 AS parity,
        |       CAST(sum(v) AS BIGINT) AS s_v, count(*) AS n
        |FROM t GROUP BY substr(s, 1, 1), length(s) % 2
        |ORDER BY initial, parity""".stripMargin,

    // test/sql/types/interval/test_interval_comparison.test (day-time
    // slice — Spark's year-month and day-time interval families do not
    // compare with each other, so the shared text stays within one):
    // unit normalization, addition closure, timestamp displacement
    "slt_interval_compare" ->
      """SELECT (INTERVAL 1 DAY > INTERVAL 23 HOUR) AS d_gt_h,
        | (INTERVAL 1 DAY < INTERVAL 25 HOUR) AS d_lt_h25,
        | (INTERVAL 2 HOUR + INTERVAL 30 MINUTE = INTERVAL 150 MINUTE) AS add_eq,
        | (INTERVAL 90 SECOND = INTERVAL 1 MINUTE + INTERVAL 30 SECOND) AS s_eq,
        | CAST(TIMESTAMP '2000-06-15 22:30:00' + INTERVAL 90 MINUTE AS DATE) AS rolled""".stripMargin,

    // test/sql/types/decimal/ edges: TRY_CAST overflow → NULL, rounding
    // on scale narrowing both signs, and the DECIMAL(38) precision
    // ceiling through text. The narrowing casts go through STRINGS:
    // DuckDB 1.0's decimal→decimal rescale TRUNCATES toward zero
    // (1.009::DECIMAL(3,2) = 1.00) where Spark rounds HALF_UP — a real
    // cross-engine divergence probed while authoring this pin; its
    // string→decimal and double→decimal casts round like Spark's.
    "slt_decimal_edges" ->
      """SELECT TRY_CAST('123.45' AS DECIMAL(4,2)) IS NULL AS overflow_null,
        | CAST(CAST('1.006' AS DECIMAL(3,2)) AS DOUBLE) AS round_up,
        | CAST(CAST('-2.676' AS DECIMAL(3,2)) AS DOUBLE) AS round_neg,
        | CAST(CAST('99999999999999999999999999999999999999' AS DECIMAL(38,0)) AS STRING) AS p38,
        | TRY_CAST('abc' AS DECIMAL(10,2)) IS NULL AS junk_null""".stripMargin
  )

  // q is a Seq so toMap silently last-wins on a duplicated key — a
  // duplicate here DROPS an existing green pin without any failure
  // (round 10 shipped five that way). Fail loudly at object init.
  require(q.map(_._1).distinct.size == q.size, {
    val d = q.map(_._1).groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    s"duplicate slt pin keys: ${d.toSeq.sorted.mkString(", ")}"
  })

  val queries: Map[String, Q.Fn] =
    q.map { case (name, sql) => name -> Q.sharedSql(Nil, sql)._1 }.toMap

  val oracle: Map[String, String] = q.toMap
}
