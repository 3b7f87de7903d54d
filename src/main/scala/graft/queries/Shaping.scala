package graft.queries

import graft.Tables
import graft.operators.RecursiveCte
import graft.streaming.StreamingFacade
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-shaping operators: UNNEST, PIVOT/UNPIVOT, sampling, limit/offset,
  * recursive CTEs, session windows — SURVEY.md §2.2/§2.6/§2.7.
  */
object Shaping {

  private val shared: Map[String, (Q.Fn, String)] = Map(
    "limit_offset" -> Q.sharedSql(Seq("orders"),
      """SELECT o_orderkey, o_custkey FROM orders
        |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin)
  )

  val queries: Map[String, Q.Fn] = shared.map { case (k, v) => k -> v._1 } ++ Map[String, Q.Fn](
    // LIMIT n PERCENT (reference: physical_limit_percent.cpp) — Spark has
    // no percent limit; the mapping is an exact count then limit. The
    // count is a metadata-cheap job; the limit itself stays distributed.
    "limit_percent" -> { (s, d) =>
      val ord = Tables(s, d, "orders")
      val n = math.ceil(ord.count() * 0.01).toInt
      ord.select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")).limit(n)
    },

    // repeat table function (reference: src/function/table/repeat.cpp):
    // n copies of a constant row ≙ range + literal projection
    "util_repeat" -> { (s, d) =>
      s.range(500).select(lit("ab").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("n"))
    },

    // catalog introspection (reference: duckdb_tables() system table) ≙
    // spark.catalog / SHOW TABLES — engine-specific output → rows-only
    "util_catalog" -> { (s, d) =>
      Tables.relational.foreach(t => Tables(s, d, t).createOrReplaceTempView(s"cat_$t"))
      s.sql("SHOW TABLES").filter(col("tableName").startsWith("cat_"))
        .select(col("tableName"), col("isTemporary"))
        .orderBy(col("tableName"))
    },

    // UNNEST with ordinality (reference: physical_unnest.cpp)
    "unnest_words" -> { (s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")).as(Seq("pos0", "word")))
        .select(col("p_partkey"), (col("pos0") + 1).cast("long").as("pos"), col("word"))
        .orderBy(col("p_partkey"), col("pos")).limit(300)
    },

    // PIVOT (reference: physical_pivot.cpp / transform_pivot_stmt.cpp)
    "pivot_orderstatus" -> { (s, d) =>
      Tables(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("o_totalprice")))
        .select(col("o_orderpriority"),
          round(col("F"), 2).as("F"), round(col("O"), 2).as("O"), round(col("P"), 2).as("P"))
        .orderBy(col("o_orderpriority"))
    },

    // dynamic PIVOT — no IN-list: Spark's no-values pivot() runs a
    // distinct discovery job first, the analog of the reference's
    // discovery pre-query (transform_pivot_stmt.cpp); the oracle uses
    // DuckDB's dynamic PIVOT statement, so BOTH engines discover the
    // column set from the data
    "pivot_dynamic" -> { (s, d) =>
      Tables(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus")
        .agg(round(sum(col("o_totalprice")), 2))
        .orderBy(col("o_orderpriority"))
    },

    "unpivot_part" -> { (s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "metric", "value")
        .select(col("p_partkey"), col("metric"), round(col("value"), 2).as("value"))
        .orderBy(col("p_partkey"), col("metric")).limit(300)
    },

    // TABLESAMPLE surface (reference: physical_reservoir_sample.cpp) —
    // engines sample differently → rows-only checks
    "sample_bernoulli" -> { (s, d) =>
      Tables(s, d, "lineitem").sample(withReplacement = false, 0.1, seed = 42)
        .agg(count(lit(1)).as("n_sampled"),
          round(avg(col("l_quantity")), 6).as("avg_qty"))
    },

    "sample_reservoir" -> { (s, d) =>
      // exact-N reservoir ≙ order by deterministic pseudo-random key
      Tables(s, d, "lineitem")
        .withColumn("_r", xxhash64(col("l_orderkey"), col("l_linenumber"), col("l_partkey")))
        .orderBy(col("_r")).limit(100)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    },

    // WITH RECURSIVE fixpoint (driver loop, distributed steps)
    "recursive_cte_series" -> { (s, d) =>
      import s.implicits._
      val seed = Seq(1L).toDF("n")
      RecursiveCte.iterate(seed, f => f.filter(col("n") < 100).select((col("n") + 1).as("n")))
        .orderBy(col("n"))
    },

    // EXPLAIN ANALYZE profile surface (reference: query_profiler.cpp) —
    // per-operator metric rows for a real aggregation query; operator/
    // metric names and timing values are engine-specific → rows-only.
    // The deterministic part (numOutputRows on the final aggregate) is
    // pinned in QueryProfileSpec.
    "util_profile" -> { (s, d) =>
      graft.plans.QueryProfile.profile(
        Tables(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity")).as("s")))
    },

    // SUMMARIZE ≙ df.summary() (reference: src/function/table/summary.cpp)
    // — statistic names/format are engine-specific → rows-only check
    "util_summary" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .summary("count", "mean", "stddev", "min", "25%", "50%", "75%", "max")
    },

    // session_window batch aggregation ≙ lag-gap sessionization
    "events_session_window" -> { (s, d) =>
      val sess = StreamingFacade.sessionStats(Tables(s, d, "events"))
      sess.select(col("user_id"),
          row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("sw.start"))).cast("long").as("sid"),
          col("n"), unix_micros(col("start_ts")).as("start_us"))
        .orderBy(col("user_id"), col("sid")).limit(300)
    }
  )

  val oracle: Map[String, String] = shared.map { case (k, v) => k -> v._2 } ++ Map(
    "limit_percent" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 1%""".stripMargin,

    "util_repeat" ->
      """SELECT v, count(*) AS n FROM repeat('ab', 500) t(v) GROUP BY v""".stripMargin,

    "unnest_words" ->
      """SELECT p_partkey, CAST(generate_subscripts(w, 1) AS BIGINT) AS pos, unnest(w) AS word
        |FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part) t
        |ORDER BY p_partkey, pos LIMIT 300""".stripMargin,

    "pivot_orderstatus" ->
      """SELECT o_orderpriority,
        | round(sum(CASE WHEN o_orderstatus='F' THEN o_totalprice END), 2) AS F,
        | round(sum(CASE WHEN o_orderstatus='O' THEN o_totalprice END), 2) AS O,
        | round(sum(CASE WHEN o_orderstatus='P' THEN o_totalprice END), 2) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // (DuckDB's dynamic `PIVOT ... USING` accepts only a bare aggregate —
    // no round() — and unrounded double sums are not hash-stable, so the
    // oracle spells the expected columns; the DYNAMIC behavior under test
    // is the Spark side's no-values discovery.)
    "pivot_dynamic" ->
      """SELECT o_orderpriority,
        | round(sum(CASE WHEN o_orderstatus='F' THEN o_totalprice END), 2) AS F,
        | round(sum(CASE WHEN o_orderstatus='O' THEN o_totalprice END), 2) AS O,
        | round(sum(CASE WHEN o_orderstatus='P' THEN o_totalprice END), 2) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "unpivot_part" ->
      """SELECT p_partkey, metric, round(value, 2) AS value FROM (
        | SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        | UNION ALL
        | SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part) u
        |ORDER BY p_partkey, metric LIMIT 300""".stripMargin,

    "recursive_cte_series" ->
      """WITH RECURSIVE t(n) AS (
        | SELECT CAST(1 AS BIGINT) AS n
        | UNION ALL
        | SELECT n + 1 FROM t WHERE n < 100)
        |SELECT n FROM t ORDER BY n""".stripMargin,

    "events_session_window" ->
      """WITH x AS (
        | SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |       THEN 1 ELSE 0 END AS new_s
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT user_id, ts,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM x)
        |SELECT user_id, CAST(sid AS BIGINT) AS sid, count(*) AS n,
        | epoch_us(min(ts)) AS start_us
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sid LIMIT 300""".stripMargin
  )
}
