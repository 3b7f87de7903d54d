package graft.queries

/** ClickBench / h2oai db-benchmark query shapes — the aggregation stress
  * the TPC-H-ish headline set lacks (VERDICT r5 #7).
  *
  * Shapes from /root/reference/benchmark/clickbench/queries/ (top-N
  * over a high-cardinality group, filtered multi-aggregate, regex-derived
  * key + HAVING) and /root/reference/benchmark/h2oai/group/queries/
  * (sum by id, wide near-unique key grouping q10, max-min range q07,
  * count-distinct summary), re-expressed over the repo's fixtures:
  * lineitem's l_orderkey/l_partkey are the high-cardinality ids, events
  * .props the string column. All are dialect-shared SQL, so the DuckDB
  * oracle runs the identical text.
  *
  * Scale notes: every query is a single hash-aggregate over a keyed
  * shuffle (partial→final, map-side combine); the top-N orderings ride
  * TakeOrderedAndProject, not a global sort. The wide-key q10 shape is
  * the canonical "groups ≈ rows" stress — at 100 TB it shuffles once on
  * the composite key and each reducer streams its groups; nothing here
  * materializes an unbounded driver-side state.
  */
object OlapShapes {

  private val shared: Map[String, (Q.Fn, String)] = Map(
    // ClickBench q13 shape: COUNT per high-cardinality key, top-10 by
    // count (deterministic tie-break on the key)
    "cb_top_groups" -> Q.sharedSql(Seq("lineitem"),
      """SELECT l_orderkey, count(*) AS c, round(sum(l_extendedprice), 2) AS s
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY c DESC, l_orderkey LIMIT 10""".stripMargin),

    // ClickBench q32 shape: filter + two-key high-cardinality group +
    // mixed count/sum aggregates, top-10. The avg is reported as
    // (sum, count) rather than round(avg(..), 2): the fixture's DOUBLE
    // prices put avg on an exact .xx5 decimal tie in every count-2 group,
    // and Spark (shortest-string BigDecimal then HALF_UP) vs DuckDB
    // (exact-binary rounding) legitimately disagree on ties — sum's two
    // decimal digits are exact in the fixture, so this form is tie-free.
    "cb_filter_multi_agg" -> Q.sharedSql(Seq("lineitem"),
      """SELECT l_orderkey, l_suppkey, count(*) AS c,
        | round(sum(l_quantity), 2) AS sq,
        | round(sum(l_extendedprice), 2) AS sp
        |FROM lineitem WHERE l_returnflag <> 'R'
        |GROUP BY l_orderkey, l_suppkey
        |ORDER BY c DESC, l_orderkey, l_suppkey LIMIT 10""".stripMargin),

    // ClickBench q29 shape: group key DERIVED by regex from a string
    // column, HAVING threshold, ordered report (regexp_extract has the
    // same (str, pattern, group) signature in both dialects; the char
    // class avoids backslash escapes, which Spark SQL string literals
    // consume and DuckDB's keep)
    "cb_regex_key" -> Q.sharedSql(Seq("events"),
      """SELECT regexp_extract(props, '"k": ([0-9]+)', 1) AS k,
        | count(*) AS c, round(avg(length(props)), 2) AS l
        |FROM events WHERE props <> ''
        |GROUP BY k HAVING count(*) > 50
        |ORDER BY c DESC, k LIMIT 25""".stripMargin),

    // h2oai groupby q10 shape: near-unique composite key (groups ≈ rows)
    // — the cardinality regime where partial aggregation stops helping
    // and the shuffle carries one row per group
    "h2o_groupby_wide" -> Q.sharedSql(Seq("lineitem"),
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        | l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS v, count(*) AS n
        |FROM lineitem
        |GROUP BY l_orderkey, l_partkey, l_suppkey, l_linenumber,
        | l_returnflag, l_linestatus
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber
        |LIMIT 200""".stripMargin),

    // h2oai groupby q07 shape: range aggregate (max - min) per id
    "h2o_range_agg" -> Q.sharedSql(Seq("lineitem"),
      """SELECT l_partkey,
        | round(max(l_extendedprice) - min(l_extendedprice), 2) AS range_price
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY l_partkey LIMIT 200""".stripMargin),

    // h2oai answer-summary shape: ungrouped COUNT(DISTINCT) + SUM + COUNT
    // in one pass (the benchmark's own RESULT_QUERY form)
    "h2o_count_distinct" -> Q.sharedSql(Seq("lineitem"),
      """SELECT count(DISTINCT l_partkey) AS nd,
        | round(sum(l_quantity), 2) AS sv, count(*) AS n
        |FROM lineitem""".stripMargin),

    // ClickBench q21 shape: full-scan substring predicate + count — the
    // string-matching stress (LIKE runs in codegen over the whole text
    // column; the scan prunes to one column via ReadSchema)
    "cb_like_count" -> Q.sharedSql(Seq("documents"),
      "SELECT count(*) AS c FROM documents WHERE text LIKE '%the%'"),

    // ClickBench q22 shape: LIKE filter + group + MIN(string) aggregate,
    // top-N by count with deterministic tie-break
    "cb_like_group_min" -> Q.sharedSql(Seq("documents"),
      """SELECT lang, min(source) AS msrc, count(*) AS c
        |FROM documents WHERE text LIKE '%the%' AND source <> ''
        |GROUP BY lang ORDER BY c DESC, lang LIMIT 10""".stripMargin),

    // ClickBench q23 shape: positive + negative LIKE, MIN()s, count, and a
    // grouped count(DISTINCT) in one aggregate
    "cb_like_distinct" -> Q.sharedSql(Seq("documents"),
      """SELECT source, min(doc_id) AS mid, min(lang) AS ml, count(*) AS c,
        | count(DISTINCT lang) AS nl
        |FROM documents
        |WHERE text LIKE '%the%' AND text NOT LIKE '%robot%' AND source <> ''
        |GROUP BY source ORDER BY c DESC, source LIMIT 10""".stripMargin),

    // JOB/imdb 06a shape (benchmark/imdb_plan_cost/queries/06a.sql): a
    // selective star join — LIKE filter on one dimension, equality
    // literals on two others, MIN aggregates over the joined star. The
    // JOB stress is join-order sensitivity under correlated selective
    // filters; here Catalyst broadcast-joins the three filtered dims and
    // AQE can re-order by runtime sizes. Comma-join syntax is shared SQL.
    "job_star_min" -> Q.sharedSql(
      Seq("lineitem", "part", "supplier", "orders", "customer", "nation"),
      """SELECT min(p.p_name) AS pn, min(s.s_name) AS sn,
        | min(o.o_orderdate) AS od, min(c.c_name) AS cn
        |FROM lineitem l, part p, supplier s, orders o, customer c, nation n
        |WHERE p.p_name LIKE '%red%' AND n.n_name = 'NATION_3'
        | AND o.o_orderpriority = '1-URGENT'
        | AND l.l_partkey = p.p_partkey AND l.l_suppkey = s.s_suppkey
        | AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
        | AND c.c_nationkey = n.n_nationkey""".stripMargin),

    // h2oai db-benchmark JOIN suite shapes (benchmark/h2oai/join/): the
    // groupby family above stresses aggregation; these stress the join
    // data path at three build-side sizes. Fact = lineitem; small dim =
    // supplier (broadcast), medium dim = part (broadcast at bench SF,
    // degrades to shuffle at warehouse SF — deliberately unhinted), big
    // side = orders (genuine shuffle join on differing cluster keys).
    "h2o_join_small" -> Q.sharedSql(Seq("lineitem", "supplier"),
      """SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS rev,
        | round(sum(s_acctbal), 2) AS bal
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey""".stripMargin),

    "h2o_join_medium" -> Q.sharedSql(Seq("lineitem", "part"),
      """SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS rev,
        | round(sum(p_retailprice), 2) AS retail
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin),

    // LEFT join with a filtered right side so unmatched rows exist and
    // null-extension is exercised on the measure
    "h2o_join_left" -> Q.sharedSql(Seq("lineitem", "part"),
      """SELECT count(*) AS n, count(p_retailprice) AS matched,
        | round(sum(l_quantity), 2) AS q, round(sum(p_retailprice), 2) AS retail
        |FROM lineitem LEFT JOIN part
        |  ON l_partkey = p_partkey AND p_size > 25""".stripMargin),

    // big-big: both sides are fact-sized and clustered on DIFFERENT keys
    // (lineitem on l_orderkey, orders on o_custkey) — a real shuffle join
    "h2o_join_big" -> Q.sharedSql(Seq("lineitem", "orders"),
      """SELECT o_orderpriority, count(*) AS n,
        | round(sum(l_extendedprice), 2) AS rev,
        | round(sum(o_totalprice), 2) AS tot
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // ClickBench date-histogram shape (q20-ish: counts per time bucket
    // over the whole fact): date_trunc returns DATE in DuckDB and
    // TIMESTAMP in Spark — CAST both to DATE for one shared text
    "cb_date_histogram" -> Q.sharedSql(Seq("orders"),
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        | count(*) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM orders GROUP BY 1 ORDER BY m""".stripMargin),

    // ClickBench q24 shape: disjunctive LIKE filters over the text
    // column with a grouped report
    "cb_multi_like_or" -> Q.sharedSql(Seq("documents"),
      """SELECT lang, count(*) AS c, min(doc_id) AS mid
        |FROM documents
        |WHERE text LIKE '%merge%' OR text LIKE '%batch%'
        |   OR text LIKE '%window%'
        |GROUP BY lang ORDER BY c DESC, lang LIMIT 10""".stripMargin),

    // ClickBench q12/q17 shape: multi-column COUNT(DISTINCT pair) plus a
    // plain distinct count from one scan. Dialect pin: Spark spells the
    // pair as a multi-arg DISTINCT, DuckDB as a row-value DISTINCT —
    // identical semantics (rows with any NULL component are excluded by
    // Spark's multi-arg form, so the oracle filters them explicitly)
    "cb_count_distinct_pairs" -> (({ (s: org.apache.spark.sql.SparkSession, d: String) =>
      graft.Tables(s, d, "events").createOrReplaceTempView("events")
      s.sql(
        """SELECT count(DISTINCT user_id) AS users,
          | count(DISTINCT user_id, event_type) AS pairs, count(*) AS n
          |FROM events""".stripMargin)
    }: Q.Fn),
      """SELECT count(DISTINCT user_id) AS users,
        | count(DISTINCT (user_id, event_type))
        |   FILTER (user_id IS NOT NULL AND event_type IS NOT NULL) AS pairs,
        | count(*) AS n
        |FROM events""".stripMargin))

  val queries: Map[String, Q.Fn] = shared.map { case (k, (fn, _)) => k -> fn }
  val oracle: Map[String, String] = shared.map { case (k, (_, sql)) => k -> sql }
}
