#!/usr/bin/env python3
"""Re-measure the DuckDB baseline with the EXACT query semantics Bench.scala
runs (1996 date windows for q3/q5 — round-1 BASELINE.md used 1995/1994
literals, making q5 near-empty and the comparison dishonest).

Protocol (mirrors /root/reference/benchmark/README.md): per query 6 runs,
first discarded, median of remaining 5 reported. duckdb python, default
threads (32), in-memory DB, views over the sf parquet.
"""
import duckdb, json, statistics, sys, time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]

# Same logical work as graft.Bench headline queries (graft/queries/Headline.scala).
QUERIES = {
    "q1_pricing_summary": """
      SELECT l_returnflag, l_linestatus, sum(l_quantity), sum(l_extendedprice),
             sum(l_extendedprice*(1-l_discount)), sum(l_extendedprice*(1-l_discount)*(1+l_tax)),
             avg(l_quantity), avg(l_extendedprice), avg(l_discount), count(*)
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q3_shipping_priority": """
      SELECT l_orderkey, sum(l_extendedprice*(1-l_discount)) AS revenue, o_orderdate
      FROM customer JOIN orders ON c_custkey=o_custkey JOIN lineitem ON l_orderkey=o_orderkey
      WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1996-03-15'
        AND l_shipdate > TIMESTAMP '1996-03-15'
      GROUP BY l_orderkey, o_orderdate ORDER BY revenue DESC, o_orderdate LIMIT 10""",
    "q5_local_supplier": """
      SELECT n_name, sum(l_extendedprice*(1-l_discount)) AS revenue
      FROM customer JOIN orders ON c_custkey=o_custkey JOIN lineitem ON l_orderkey=o_orderkey
        JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
        JOIN nation ON s_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey
      WHERE r_name='ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC""",
    "distinct_exact_vs_approx": """
      SELECT count(DISTINCT l_partkey), approx_count_distinct(l_suppkey) FROM lineitem""",
    "window_rank_running": """
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) rn,
             sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) run_total
      FROM orders QUALIFY rn <= 3 ORDER BY o_custkey, rn LIMIT 100""",
    "topk_lineitem": """
      SELECT l_orderkey, l_extendedprice FROM lineitem ORDER BY l_extendedprice DESC LIMIT 10""",
    "events_tumbling_1h": """
      SELECT date_trunc('hour', ts) bucket, event_type, count(*), avg(value)
      FROM events GROUP BY 1,2 ORDER BY 1,2 LIMIT 50""",
    "events_sessionize_lag": """
      SELECT user_id, count(*) AS sessions FROM (
        SELECT user_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS new_s
        FROM events) WHERE new_s=1 GROUP BY user_id ORDER BY sessions DESC LIMIT 10""",
}

con = duckdb.connect(":memory:")
for t in TABLES:
    # driver testdata is one file per table; Spark-written datasets (e.g.
    # the ScaleData sf1 evidence set) are directories of part files
    path = f"{SF_DIR}/{t}.parquet"
    import os
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

out = {}
for name, q in QUERIES.items():
    times = []
    for i in range(6):
        t0 = time.perf_counter()
        con.execute(q).fetchall()
        times.append(time.perf_counter() - t0)
    med = statistics.median(times[1:])
    out[name] = round(med, 4)
    print(f"{name}: median {med:.4f}s  (runs: {[round(t,4) for t in times]})", file=sys.stderr)

print(json.dumps({"sf": SF_DIR, "queries": out, "total": round(sum(out.values()), 4)}))
