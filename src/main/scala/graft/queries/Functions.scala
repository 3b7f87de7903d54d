package graft.queries

import graft.Tables
import graft.functions.Strftime
import org.apache.spark.sql.functions._

/** Scalar-function parity — SURVEY.md §2.8 (~500 registered names in the
  * reference; registries at /root/reference/src/function/function_list.cpp
  * and /root/reference/extension/core_functions/function_list.cpp).
  *
  * Where the two SQL dialects agree (names, types after explicit CASTs),
  * queries share one SQL text. Where they diverge (regexp_replace 'g'
  * flag, list_* vs array_*, strftime vs date_format, json operators),
  * the Spark side is DataFrame API with a hand-written DuckDB oracle.
  */
object Functions {

  private val shared: Map[String, (Q.Fn, String)] = Map(
    "fn_string" -> Q.sharedSql(Seq("part"),
      """SELECT p_partkey,
        | upper(p_name) AS up, lower(p_brand) AS lo, substring(p_name, 3, 8) AS sub,
        | CAST(length(p_name) AS BIGINT) AS len, concat_ws('|', p_brand, p_type) AS cw,
        | replace(p_type, 'a', '_') AS rep, reverse(p_brand) AS rev,
        | repeat(left(p_brand, 2), 3) AS rep3, right(p_type, 4) AS rgt,
        | lpad(p_brand, 12, '.') AS lp, rpad(p_brand, 12, '.') AS rp,
        | trim(concat('  ', p_name, '  ')) AS tr, split_part(p_type, ' ', 1) AS sp,
        | CAST(instr(p_name, 'a') AS BIGINT) AS pos_a, CAST(ascii(p_brand) AS BIGINT) AS asc1,
        | md5(p_name) AS h, CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev
        |FROM part ORDER BY p_partkey LIMIT 100""".stripMargin),

    "fn_math" -> Q.sharedSql(Seq("lineitem"),
      """SELECT l_orderkey, l_linenumber,
        | round(abs(0-l_extendedprice),2) AS ab, CAST(ceil(l_discount*100) AS DOUBLE) AS ce,
        | CAST(floor(l_tax*100) AS DOUBLE) AS fl, round(sqrt(l_quantity),6) AS sq,
        | round(exp(l_discount),6) AS ex, round(ln(l_extendedprice),6) AS ln_p,
        | round(log10(l_extendedprice),6) AS l10, round(log2(l_quantity),6) AS l2,
        | round(pow(l_quantity,2),2) AS p2, round(sin(l_discount),6) AS sn,
        | round(cos(l_tax),6) AS cs, round(atan2(l_discount, l_tax+0.01),6) AS at2,
        | CAST(sign(l_quantity-25) AS DOUBLE) AS sg, round(degrees(l_discount),6) AS dg,
        | round(radians(l_quantity),6) AS rd,
        | CAST(bit_count(CAST(l_linenumber AS INTEGER)) AS BIGINT) AS bc,
        | round(cbrt(l_quantity),6) AS cb
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_discount, l_tax
        |LIMIT 200""".stripMargin),

    "fn_conditional" -> Q.sharedSql(Seq("part"),
      """SELECT p_partkey, coalesce(nullif(p_brand, 'Brand#11'), 'OTHER') AS cb,
        | greatest(p_size, 25) AS g, least(p_size, 25) AS l,
        | CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS sz,
        | CAST(try_cast(p_type AS INTEGER) AS BIGINT) AS tc,
        | CAST(try_cast(substring(p_brand, 7, 2) AS INTEGER) AS BIGINT) AS bnum
        |FROM part ORDER BY p_partkey LIMIT 100""".stripMargin)
  )

  val queries: Map[String, Q.Fn] = shared.map { case (k, v) => k -> v._1 } ++ Map[String, Q.Fn](
    // dialect gap: DuckDB regexp_replace is first-match unless 'g'
    // (RE2 — /root/reference/third_party/re2); Spark is global (Java regex)
    "fn_regex" -> { (s, d) =>
      Tables(s, d, "part").select(
          col("p_partkey"),
          regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).as("brand_num"),
          regexp_replace(col("p_name"), "[aeiou]", "*").as("devowel"),
          col("p_name").rlike("^[a-z]+ [a-z]+$").as("matches_2w"),
          size(split(col("p_name"), "\\s+")).cast("long").as("n_tok"))
        .orderBy(col("p_partkey")).limit(100)
    },

    "fn_datetime" -> { (s, d) =>
      Tables(s, d, "orders").select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          expr("CAST(weekday(o_orderdate) + 1 AS BIGINT)").as("isodow"),
          expr("CAST(date_part('hour', o_orderdate) AS BIGINT)").as("hr"),
          expr("timestampadd(DAY, 5, o_orderdate)").as("plus5d"),
          last_day(col("o_orderdate")).as("ld"),
          // parquet writes these as TIMESTAMP_NTZ; unix_micros needs an
          // instant — cast is exact under the session's UTC zone
          unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
          date_format(col("o_orderdate"), Strftime.toJava("%Y-%m-%d %H:%M:%S")).as("fmt"),
          date_format(col("o_orderdate"), Strftime.toJava("%a %d %b %Y")).as("fmt2"),
          expr("CAST(datediff(o_orderdate, TIMESTAMP '1995-01-01') AS BIGINT)").as("dd"),
          make_date(lit(2024), month(col("o_orderdate")), lit(1)).as("md"))
        .orderBy(col("o_orderkey")).limit(100)
    },

    "fn_list" -> { (s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"), split(col("p_name"), " ").as("w"),
          sequence(lit(1), col("p_size")).as("seq"))
        .select(
          col("p_partkey"),
          size(col("w")).cast("long").as("n_words"),
          element_at(col("w"), 1).as("first_word"),
          array_join(slice(col("w"), 1, 2), "-").as("sl"),
          array_contains(col("w"), "red").as("has_red"),
          array_position(col("w"), "ring").as("pos_ring"),
          array_join(array_sort(col("w")), ",").as("sorted_words"),
          array_join(array_sort(array_distinct(col("w"))), ",").as("dw"),
          aggregate(col("seq"), lit(0L), (acc, x) => acc + x).as("sum_seq"),
          array_join(transform(col("w"), x => upper(x)), ",").as("upper_words"),
          // nullif: DuckDB's array_to_string of an empty list yields NULL
          nullif(array_join(filter(col("w"), x => length(x) > 4), ","), lit("")).as("long_words"),
          array_max(col("seq")).cast("long").as("mx"),
          size(flatten(array(col("w"), col("w")))).cast("long").as("n2"))
        .orderBy(col("p_partkey")).limit(100)
    },

    // Spark 4 collation support ≙ reference ICU collations (SURVEY §2.9:
    // icu_extension.cpp sort keys); UTF8_LCASE order ≙ ORDER BY lower()
    "fn_collation" -> { (s, d) =>
      val mixed = when(col("p_size") % 2 === 0, upper(col("p_name"))).otherwise(col("p_name"))
      Tables(s, d, "part")
        .select(col("p_partkey"), mixed.as("v"),
          (collate(mixed, "UTF8_LCASE") === lit("small ring")).as("is_small_ring"))
        .orderBy(collate(col("v"), "UTF8_LCASE"), col("p_partkey"))
        .limit(200)
    },

    // UNION type emulation (SURVEY §1.2: tag + one field per member
    // struct encoding; reference casts at src/function/cast/union_casts.cpp)
    "fn_union" -> { (s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"), expr(
          """named_struct(
            | 'tag', CASE WHEN p_size % 2 = 0 THEN 'num' ELSE 'str' END,
            | 'num', CASE WHEN p_size % 2 = 0 THEN p_size END,
            | 'str', CASE WHEN p_size % 2 <> 0 THEN p_brand END)""".stripMargin).as("u"))
        .select(col("p_partkey"), col("u.tag").as("tag"),
          col("u.num").cast("long").as("num_val"), col("u.str").as("str_val"))
        .orderBy(col("p_partkey")).limit(200)
    },

    // higher-order lambdas beyond transform/filter/aggregate: zip_with,
    // exists, forall (reference: lambda_functions.cpp list_zip/
    // list_has_any) + width_bucket (arithmetic-emulated oracle)
    "fn_lambda" -> { (s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"), col("p_size"), sequence(lit(1), col("p_size")).as("seq"))
        .select(
          col("p_partkey"),
          // two DISTINCT inputs (seq and its reverse): a broken zip_with
          // cannot masquerade as a working one on identical arrays
          aggregate(zip_with(col("seq"), reverse(col("seq")), (x, y) => x * y),
            lit(0L), (acc, x) => acc + x).as("zw_sum"),
          exists(col("seq"), x => x > 40).as("has_big"),
          forall(col("seq"), x => x > 0).as("all_pos"),
          expr("CAST(width_bucket(p_size, 0, 50, 5) AS BIGINT)").as("wb"))
        .orderBy(col("p_partkey")).limit(200)
    },

    // nested-nested types (reference: test/sql/types/nested/
    // nested_nested_types.test): list<struct{i, j:list}> with a NULL
    // element, inspected via positional access so the gate compares
    // scalars, not engine-specific rendering
    "fn_nested_nested" -> { (s, d) =>
      s.range(1).selectExpr(
        "array(named_struct('i', 1, 'j', array(2, 3)), NULL, " +
          "named_struct('i', 4, 'j', array(5))) AS xs")
        .selectExpr(
          "CAST(size(xs) AS BIGINT) AS n",
          "xs[0].i AS first_i",
          "xs[0].j[1] AS first_j2",
          "CAST(xs[1] IS NULL AS BOOLEAN) AS mid_null",
          "CAST(size(xs[2].j) AS BIGINT) AS last_jn")
    },

    // map with struct values + nested map keys (reference: test/sql/
    // types/nested/map/test_map_nested_keys.test): cardinality, key
    // list, struct-member extraction through the map
    "fn_map_nested" -> { (s, d) =>
      s.range(1).selectExpr(
        "map('a', named_struct('x', 1, 'y', 2.5D), " +
          "'b', named_struct('x', 3, 'y', 4.5D)) AS m")
        .selectExpr(
          "CAST(size(m) AS BIGINT) AS n",
          "array_join(array_sort(map_keys(m)), ',') AS ks",
          "m['a'].x AS ax",
          "m['b'].y AS yb")
    },

    // nested struct cast (reference: test/sql/types/struct/
    // struct_cast.test shape): widen int members through
    // struct<list<struct>> without losing values
    "fn_struct_cast_nested" -> { (s, d) =>
      s.range(1).selectExpr(
        "CAST(named_struct('a', 1, 'xs', array(named_struct('v', 2), " +
          "named_struct('v', 3))) AS " +
          "STRUCT<a: BIGINT, xs: ARRAY<STRUCT<v: DOUBLE>>>) AS st")
        .selectExpr(
          "st.a AS a",
          "st.xs[0].v AS v1",
          "st.xs[1].v AS v2")
    },

    "fn_struct_map" -> { (s, d) =>
      Tables(s, d, "part").select(
          col("p_partkey"),
          expr("CAST(named_struct('brand', p_brand, 'size', p_size).size AS BIGINT)").as("s_size"),
          expr("named_struct('brand', p_brand, 'size', p_size).brand").as("s_brand"),
          expr("map('b', p_brand, 't', p_type)['t']").as("m_t"),
          expr("CAST(size(map('b', p_brand, 't', p_type)) AS BIGINT)").as("m_n"),
          expr("array_join(map_keys(map('b', p_brand, 't', p_type)), ',')").as("m_keys"))
        .orderBy(col("p_partkey")).limit(100)
    },

    "fn_json" -> { (s, d) =>
      Tables(s, d, "events").select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"),
          expr("from_json(props, 'k BIGINT').k").as("k_struct"),
          expr("array_join(json_object_keys(props), ',')").as("ks"))
        .orderBy(col("event_id")).limit(200)
    },

    // JSON surface pass 2 (reference extension/json/json_functions/):
    // row→json (to_json ≙ DuckDB to_json of a struct), schema-directed
    // parse (from_json ≙ json_transform), json_array_length, json_valid
    "fn_json2" -> { (s, d) =>
      Tables(s, d, "orders").select(
          col("o_orderkey"),
          to_json(struct(col("o_orderkey"), col("o_orderpriority"))).as("js"),
          expr("from_json(to_json(named_struct('o_orderkey', o_orderkey, 'o_orderpriority', o_orderpriority)), " +
            "'o_orderkey BIGINT, o_orderpriority STRING').o_orderkey").as("t_key"),
          expr("from_json(to_json(named_struct('o_orderkey', o_orderkey, 'o_orderpriority', o_orderpriority)), " +
            "'o_orderkey BIGINT, o_orderpriority STRING').o_orderpriority").as("t_pri"),
          to_json(array(col("o_orderkey"), col("o_orderkey") * 2)).as("arr"),
          expr("CAST(json_array_length(to_json(array(o_orderkey, o_orderkey * 2))) AS BIGINT)").as("alen"),
          get_json_object(to_json(struct(col("o_orderkey"))), "$").isNotNull.as("ok"),
          get_json_object(lit("{not json"), "$").isNotNull.as("bad"))
        .orderBy(col("o_orderkey")).limit(200)
    },

    // RFC 7386 JSON merge patch (reference: json_merge_patch.cpp) over
    // JSON built identically on both sides from table values: recursive
    // object merge, null-deletes, wholesale array replace. json_pretty
    // has no DuckDB-1.0 oracle — spec-gated in FunctionsSpec instead;
    // json(pretty(x)) == json(x) normalization is asserted here.
    "fn_json3" -> { (s, d) =>
      Tables(s, d, "orders").select(
          col("o_orderkey"),
          expr("""json_merge_patch(
              concat('{"k":', o_orderkey, ',"status":"', o_orderstatus,
                     '","meta":{"pri":"', o_orderpriority, '","x":1,"drop":2}}'),
              concat('{"meta":{"x":null,"q":', o_custkey, '},"extra":"y"}'))""").as("merged"),
          expr("""json_merge_patch(concat('{"a":', o_orderkey, '}'), '{"a":null}')""").as("deleted"),
          expr("""json_merge_patch('{"a":1}', concat('', o_custkey))""").as("scalar_patch"),
          expr("""get_json_object(json_pretty(concat('{"k":', o_orderkey, ',"arr":[1,2]}')), '$.k')""").as("pretty_k"))
        .orderBy(col("o_orderkey")).limit(200)
    },

    // TIME-of-day convention (SURVEY §1.2): the engine maps TIME to
    // micros-since-midnight LongType; parity vs DuckDB's native TIME is
    // asserted through epoch/make_time roundtrips on the oracle side
    "fn_time" -> { (s, d) =>
      Tables(s, d, "events")
        .withColumn("tod_us",
          unix_micros(col("ts")) - unix_micros(date_trunc("day", col("ts"))))
        .select(col("event_id"), col("tod_us"),
          expr("tod_us div 3600000000").as("h"),
          expr("(tod_us % 3600000000) div 60000000").as("m"),
          expr("tod_us % 60000000").as("us_in_min"),
          expr("(tod_us div 3600000000)*3600000000 + " +
            "((tod_us % 3600000000) div 60000000)*60000000 + " +
            "tod_us % 60000000 = tod_us").as("roundtrip_ok"))
        .orderBy(col("event_id")).limit(300)
    },

    // TIME_TZ convention (SURVEY §1.2): TIME WITH TIME ZONE ≙
    // (micros-since-midnight LOCAL clock, offset seconds) pair. The
    // oracle builds real TIMETZ values (offsets −6:30..+6:30 in 30-min
    // steps) and extracts epoch/timezone parts; the engine derives the
    // same pair + the UTC normalization from the convention's arithmetic
    "fn_timetz" -> { (s, d) =>
      Tables(s, d, "orders")
        .withColumn("h", col("o_orderkey") % 24)
        .withColumn("m", col("o_custkey") % 60)
        .withColumn("offm", (col("o_orderkey") % 27) * 30 - 390)
        .select(col("o_orderkey"),
          ((col("h") * 3600 + col("m") * 60) * 1000000L).as("local_us"),
          (col("offm") * 60).as("off_sec"),
          ((col("h") * 3600 + col("m") * 60) * 1000000L
            - col("offm") * 60 * 1000000L).as("utc_us"))
        .orderBy(col("o_orderkey")).limit(200)
    },

    // interval / timezone pass (reference extension/icu/): AT TIME ZONE
    // conversion, INTERVAL month/day/minute arithmetic (month addition
    // clamps at month end on both engines), and age() decomposed into
    // calendar year/month/day components vs a fixed anchor
    "fn_datetime2" -> { (s, d) =>
      val anchor = "TIMESTAMP '1995-01-01'"
      Tables(s, d, "orders").select(
          col("o_orderkey"),
          expr("convert_timezone('UTC', 'America/New_York', o_orderdate)").as("nyc"),
          expr("convert_timezone('UTC', 'Asia/Tokyo', o_orderdate)").as("tokyo"),
          expr("o_orderdate + INTERVAL '1' MONTH").as("plus1mo"),
          expr("o_orderdate - INTERVAL '45' DAY").as("minus45d"),
          expr("o_orderdate + INTERVAL '90' MINUTE").as("plus90min"),
          expr(s"CAST(floor(months_between(o_orderdate, $anchor)) DIV 12 AS BIGINT)").as("age_y"),
          expr(s"CAST(floor(months_between(o_orderdate, $anchor)) % 12 AS BIGINT)").as("age_m"),
          expr(s"CAST(datediff(CAST(o_orderdate AS DATE), " +
            s"CAST(add_months($anchor, floor(months_between(o_orderdate, $anchor))) AS DATE)) AS BIGINT)").as("age_d"))
        .orderBy(col("o_orderkey")).limit(200)
    },

    // gamma/lgamma (Lanczos), IEEE nextafter, and NFC normalization —
    // the remaining math/string gaps from the reference registry
    "fn_math3" -> { (s, d) =>
      import graft.functions.{MathFunctions, NfcNormalize}
      Tables(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          round(MathFunctions.gamma(col("l_linenumber") + lit(0.5)), 6).as("gm"),
          round(MathFunctions.lgamma(col("l_linenumber") * 3 + lit(0.25)), 6).as("lg"),
          MathFunctions.nextafter(col("l_discount"), lit(1.0)).as("na"),
          NfcNormalize.nfc_normalize(concat(col("l_returnflag"), lit("e\u0301"))).as("nfc"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixtures --
        // break ties on the value columns like fn_math does
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("na"), col("nfc"))
        .limit(200)
    },

    // grapheme-aware string length (reference length() counts grapheme
    // clusters; Spark's counts code points — documented divergence, with
    // grapheme_length as the explicit parity function). The accent
    // column appends COMBINING ACUTE: 1 grapheme, 2 code points.
    "fn_grapheme" -> { (s, d) =>
      import graft.functions.GraphemeLength.grapheme_length
      Tables(s, d, "part").select(
          col("p_partkey"),
          grapheme_length(col("p_name")).cast("long").as("g_plain"),
          length(col("p_name")).cast("long").as("cp_plain"),
          grapheme_length(concat(col("p_brand"), lit("e\u0301"))).cast("long").as("g_accent"),
          length(concat(col("p_brand"), lit("e\u0301"))).cast("long").as("cp_accent"))
        .orderBy(col("p_partkey")).limit(100)
    },

    // bar(x, min, max[, width]) block-character chart cell (reference
    // extension/core_functions/scalar/string/bar.cpp). Exercises the
    // partial-eighth blocks, the x<=min/x>=max clamps (acctbal spans
    // negatives), a fractional width, and the default width 80.
    "fn_bar" -> { (s, d) =>
      import graft.functions.UnicodeBar.bar
      Tables(s, d, "supplier").select(
          col("s_suppkey"),
          bar(col("s_acctbal"), lit(0.0), lit(10000.0), lit(20.0)).as("b20"),
          bar(col("s_acctbal"), lit(-1000.0), lit(10000.0), lit(80.0)).as("b80"),
          bar(col("s_acctbal"), lit(0.0), lit(10000.0), lit(12.5)).as("bfrac"))
        .orderBy(col("s_suppkey")).limit(200)
    },

    // bit functions (reference extension/core_functions/scalar/bit/):
    // get_bit/set_bit/bit_position over the engine's '0'/'1' bitstring
    // encoding (see functions.BitFunctions), plus bit_count
    "fn_bit" -> { (s, d) =>
      import graft.functions.BitFunctions
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          expr("lpad(bin(o_orderkey % 256), 8, '0')").as("bits"),
          expr("CAST(o_orderkey % 8 AS INT)").as("pos"))
        .select(col("o_orderkey"), col("bits"),
          BitFunctions.get_bit(col("bits"), col("pos")).as("g"),
          BitFunctions.set_bit(col("bits"), col("pos"), lit(1)).as("sb"),
          // single-bit pattern: DuckDB's multi-bit bit_position misses
          // matches at padding-dependent offsets (its BIT layout quirk);
          // the 1-bit search agrees exactly on all 256 byte patterns
          BitFunctions.bit_position(lit("1"), col("bits")).as("bp"),
          expr("CAST(bit_count(o_orderkey % 256) AS BIGINT)").as("bc"))
        .orderBy(col("o_orderkey")).limit(200)
    },

    "fn_hash" -> { (s, d) =>
      Tables(s, d, "part").select(
          col("p_partkey"),
          md5(col("p_name")).as("h_md5"),
          sha2(col("p_name").cast("binary"), 256).as("h_sha"),
          lower(hex(col("p_name"))).as("h_hex"),
          base64(col("p_name").cast("binary")).as("b64"))
        .orderBy(col("p_partkey")).limit(100)
    },

    // even/gcd/lcm/factorial — reference math surface Spark lacks
    // (custom expressions in functions.MathExpressions)
    "fn_math2" -> { (s, d) =>
      import graft.functions.MathFunctions._
      Tables(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          even(col("l_quantity") / 7.0).as("ev"),
          gcd(col("l_partkey"), col("l_suppkey")).as("g"),
          lcm(col("l_linenumber").cast("long"), lit(6L)).as("lc"),
          expr("CAST(factorial(l_linenumber) AS BIGINT)").as("fact"),
          isnan(lit("NaN").cast("double") * col("l_quantity")).as("nan_check"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
        .limit(200)
    },

    // DECIMAL arithmetic parity (SURVEY §7 hard part): exact decimal sums
    // surfaced as doubles so both engines' differing result precisions
    // compare equal
    "fn_decimal" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").as("dec_sum"),
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE)").as("dec_qty"),
          expr("CAST(min(CAST(l_discount AS DECIMAL(10,4))) AS DOUBLE)").as("dec_min"))
        .orderBy(col("l_returnflag"))
    },

    // strip_accents / format_bytes / printf / path parsing — remaining
    // reference string surface (custom expressions in StringExtra)
    "fn_string2" -> { (s, d) =>
      import graft.functions.StringExtraFunctions._
      val path = concat(lit("/data/"), col("p_brand"), lit("/"), col("p_name"), lit(".txt"))
      Tables(s, d, "part").select(
          col("p_partkey"),
          strip_accents(col("p_name")).as("sa"),
          format_bytes((col("p_retailprice") * 1000).cast("long")).as("fb"),
          format_bytes(col("p_size").cast("long")).as("fb_small"),
          expr("printf('%d-%s', p_size, p_brand)").as("pf"),
          element_at(split(path, "/"), -1).as("fname"),
          array_join(slice(split(path, "/"), lit(1), size(split(path, "/")) - 1), "/").as("dirpath"))
        .orderBy(col("p_partkey")).limit(200)
    },

    // ANSI-divergence surface: Spark 4 is ANSI by default (errors where
    // the reference returns NULL); try_* restores NULL-on-error semantics
    "fn_try" -> { (s, d) =>
      Tables(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          round(expr("try_divide(l_extendedprice, l_quantity)"), 6).as("div_ok"),
          expr("try_divide(l_quantity, l_quantity - l_quantity)").as("div_zero"),
          expr("CAST(try_cast(l_returnflag AS INT) AS BIGINT)").as("tc_bad"),
          expr("CAST(try_cast(CAST(l_linenumber AS STRING) AS INT) AS BIGINT)").as("tc_ok"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_quantity"))
        .limit(200)
    },

    // time_bucket (reference: extension/core_functions/scalar/date/
    // time_bucket.cpp) via integer epoch flooring — stays in codegen.
    "events_time_bucket" -> { (s, d) =>
      Tables(s, d, "events")
        .groupBy(expr("timestamp_micros((unix_micros(ts) div 7200000000) * 7200000000)").as("bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
        .orderBy(col("bucket"))
    }
  )

  val oracle: Map[String, String] = shared.map { case (k, v) => k -> v._2 } ++ Map(
    "fn_regex" ->
      """SELECT p_partkey,
        | regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS brand_num,
        | regexp_replace(p_name, '[aeiou]', '*', 'g') AS devowel,
        | regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS matches_2w,
        | CAST(len(regexp_split_to_array(p_name, '\s+')) AS BIGINT) AS n_tok
        |FROM part ORDER BY p_partkey LIMIT 100""".stripMargin,

    "fn_datetime" ->
      """SELECT o_orderkey,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | year(o_orderdate) AS yr, month(o_orderdate) AS mo, day(o_orderdate) AS dom,
        | isodow(o_orderdate) AS isodow,
        | date_part('hour', o_orderdate) AS hr,
        | o_orderdate + INTERVAL 5 DAY AS plus5d,
        | last_day(o_orderdate) AS ld,
        | epoch_us(o_orderdate) AS us,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fmt,
        | strftime(o_orderdate, '%a %d %b %Y') AS fmt2,
        | CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS dd,
        | make_date(2024, CAST(month(o_orderdate) AS INTEGER), 1) AS md
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,

    "fn_list" ->
      """SELECT p_partkey,
        | CAST(len(w) AS BIGINT) AS n_words,
        | w[1] AS first_word,
        | array_to_string(w[1:2], '-') AS sl,
        | list_contains(w, 'red') AS has_red,
        | CAST(coalesce(list_position(w, 'ring'), 0) AS BIGINT) AS pos_ring,
        | array_to_string(list_sort(w), ',') AS sorted_words,
        | array_to_string(list_sort(list_distinct(w)), ',') AS dw,
        | CAST(list_sum(seq) AS BIGINT) AS sum_seq,
        | array_to_string(list_transform(w, x -> upper(x)), ',') AS upper_words,
        | nullif(array_to_string(list_filter(w, x -> length(x) > 4), ','), '') AS long_words,
        | CAST(list_max(seq) AS BIGINT) AS mx,
        | CAST(len(flatten([w, w])) AS BIGINT) AS n2
        |FROM (SELECT p_partkey, string_split(p_name, ' ') AS w,
        |       range(1, p_size+1) AS seq FROM part) t
        |ORDER BY p_partkey LIMIT 100""".stripMargin,

    "fn_lambda" ->
      """SELECT p_partkey,
        | CAST(list_sum(list_transform(list_zip(seq, list_reverse(seq)),
        |    s -> s[1] * s[2])) AS BIGINT) AS zw_sum,
        | len(list_filter(seq, x -> x > 40)) > 0 AS has_big,
        | len(list_filter(seq, x -> NOT (x > 0))) = 0 AS all_pos,
        | CAST(CASE WHEN p_size < 0 THEN 0 WHEN p_size >= 50 THEN 6
        |       ELSE floor(p_size / 10.0) + 1 END AS BIGINT) AS wb
        |FROM (SELECT p_partkey, p_size, range(1, p_size + 1) AS seq FROM part) t
        |ORDER BY p_partkey LIMIT 200""".stripMargin,

    "fn_collation" ->
      """SELECT p_partkey, v, lower(v) = 'small ring' AS is_small_ring
        |FROM (SELECT p_partkey,
        |  CASE WHEN p_size % 2 = 0 THEN upper(p_name) ELSE p_name END AS v
        | FROM part) t
        |ORDER BY lower(v), p_partkey LIMIT 200""".stripMargin,

    "fn_union" ->
      """SELECT p_partkey, CAST(union_tag(u) AS VARCHAR) AS tag,
        | CAST(union_extract(u, 'num') AS BIGINT) AS num_val,
        | union_extract(u, 'str') AS str_val
        |FROM (SELECT p_partkey,
        |  CASE WHEN p_size % 2 = 0
        |   THEN union_value(num := p_size)::UNION(num INTEGER, str VARCHAR)
        |   ELSE union_value(str := p_brand)::UNION(num INTEGER, str VARCHAR) END AS u
        | FROM part) t
        |ORDER BY p_partkey LIMIT 200""".stripMargin,

    // duck list indexing is 1-based and map subscript yields a LIST
    "fn_nested_nested" ->
      """SELECT CAST(len(xs) AS BIGINT) AS n,
        | struct_extract(xs[1], 'i') AS first_i,
        | (struct_extract(xs[1], 'j'))[2] AS first_j2,
        | (xs[2] IS NULL) AS mid_null,
        | CAST(len(struct_extract(xs[3], 'j')) AS BIGINT) AS last_jn
        |FROM (SELECT [struct_pack(i := 1, j := [2, 3]), NULL,
        |              struct_pack(i := 4, j := [5])] AS xs)""".stripMargin,

    "fn_map_nested" ->
      """SELECT CAST(cardinality(m) AS BIGINT) AS n,
        | array_to_string(list_sort(map_keys(m)), ',') AS ks,
        | struct_extract((m['a'])[1], 'x') AS ax,
        | struct_extract((m['b'])[1], 'y') AS yb
        |FROM (SELECT map(['a', 'b'],
        |  [struct_pack(x := 1, y := CAST(2.5 AS DOUBLE)),
        |   struct_pack(x := 3, y := CAST(4.5 AS DOUBLE))]) AS m)""".stripMargin,

    "fn_struct_cast_nested" ->
      """SELECT struct_extract(st, 'a') AS a,
        | struct_extract((struct_extract(st, 'xs'))[1], 'v') AS v1,
        | struct_extract((struct_extract(st, 'xs'))[2], 'v') AS v2
        |FROM (SELECT CAST(struct_pack(a := 1,
        |    xs := [struct_pack(v := 2), struct_pack(v := 3)])
        |  AS STRUCT(a BIGINT, xs STRUCT(v DOUBLE)[])) AS st)""".stripMargin,

    "fn_struct_map" ->
      """SELECT p_partkey,
        | CAST(struct_extract(struct_pack(brand := p_brand, size := p_size), 'size') AS BIGINT) AS s_size,
        | struct_extract(struct_pack(brand := p_brand, size := p_size), 'brand') AS s_brand,
        | (map(['b','t'], [p_brand, p_type])['t'])[1] AS m_t,
        | CAST(cardinality(map(['b','t'], [p_brand, p_type])) AS BIGINT) AS m_n,
        | array_to_string(map_keys(map(['b','t'], [p_brand, p_type])), ',') AS m_keys
        |FROM part ORDER BY p_partkey LIMIT 100""".stripMargin,

    "fn_json" ->
      """SELECT event_id,
        | CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
        | CAST(props->>'k' AS BIGINT) AS k_struct,
        | array_to_string(json_keys(props), ',') AS ks
        |FROM events ORDER BY event_id LIMIT 200""".stripMargin,

    "fn_json2" ->
      """SELECT o_orderkey,
        | to_json({'o_orderkey': o_orderkey, 'o_orderpriority': o_orderpriority})::VARCHAR AS js,
        | (json_transform(to_json({'o_orderkey': o_orderkey, 'o_orderpriority': o_orderpriority}),
        |    '{"o_orderkey":"BIGINT","o_orderpriority":"VARCHAR"}')).o_orderkey AS t_key,
        | (json_transform(to_json({'o_orderkey': o_orderkey, 'o_orderpriority': o_orderpriority}),
        |    '{"o_orderkey":"BIGINT","o_orderpriority":"VARCHAR"}')).o_orderpriority AS t_pri,
        | to_json([o_orderkey, o_orderkey*2])::VARCHAR AS arr,
        | CAST(json_array_length(to_json([o_orderkey, o_orderkey*2])) AS BIGINT) AS alen,
        | json_valid(to_json({'o_orderkey': o_orderkey})::VARCHAR) AS ok,
        | json_valid('{not json') AS bad
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin,

    "fn_json3" ->
      """SELECT o_orderkey,
        | json_merge_patch(
        |   ('{"k":' || o_orderkey || ',"status":"' || o_orderstatus ||
        |    '","meta":{"pri":"' || o_orderpriority || '","x":1,"drop":2}}')::JSON,
        |   ('{"meta":{"x":null,"q":' || o_custkey || '},"extra":"y"}')::JSON)::VARCHAR AS merged,
        | json_merge_patch(('{"a":' || o_orderkey || '}')::JSON, '{"a":null}'::JSON)::VARCHAR AS deleted,
        | json_merge_patch('{"a":1}'::JSON, ('' || o_custkey)::JSON)::VARCHAR AS scalar_patch,
        | CAST(o_orderkey AS VARCHAR) AS pretty_k
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin,

    "fn_time" ->
      """SELECT event_id,
        | CAST((date_part('hour', ts::TIME)*60 + date_part('minute', ts::TIME))*60000000
        |       + date_part('microsecond', ts::TIME) AS BIGINT) AS tod_us,
        | CAST(date_part('hour', ts::TIME) AS BIGINT) AS h,
        | CAST(date_part('minute', ts::TIME) AS BIGINT) AS m,
        | CAST(date_part('microsecond', ts::TIME) AS BIGINT) AS us_in_min,
        | (make_time(CAST(date_part('hour', ts::TIME) AS BIGINT),
        |            CAST(date_part('minute', ts::TIME) AS BIGINT),
        |            date_part('microsecond', ts::TIME)/1000000.0) = ts::TIME
        |  AND CAST(round(date_part('epoch', ts::TIME)*1000000) AS BIGINT) =
        |      CAST((date_part('hour', ts::TIME)*60 + date_part('minute', ts::TIME))*60000000
        |            + date_part('microsecond', ts::TIME) AS BIGINT)) AS roundtrip_ok
        |FROM events ORDER BY event_id LIMIT 300""".stripMargin,

    "fn_timetz" ->
      """WITH t AS (
        | SELECT o_orderkey,
        |  o_orderkey % 24 AS h, o_custkey % 60 AS m,
        |  (o_orderkey % 27) * 30 - 390 AS offm
        | FROM orders),
        |tz AS (
        | SELECT o_orderkey, offm,
        |  (lpad(CAST(h AS VARCHAR), 2, '0') || ':' || lpad(CAST(m AS VARCHAR), 2, '0')
        |   || ':00' || (CASE WHEN offm < 0 THEN '-' ELSE '+' END)
        |   || lpad(CAST(abs(offm) // 60 AS VARCHAR), 2, '0') || ':'
        |   || lpad(CAST(abs(offm) % 60 AS VARCHAR), 2, '0'))::TIMETZ AS v
        | FROM t)
        |SELECT o_orderkey,
        | CAST(round(date_part('epoch', v) * 1000000) AS BIGINT) AS local_us,
        | CAST(date_part('timezone', v) AS BIGINT) AS off_sec,
        | CAST(round(date_part('epoch', v) * 1000000) AS BIGINT)
        |   - CAST(date_part('timezone', v) AS BIGINT) * 1000000 AS utc_us
        |FROM tz ORDER BY o_orderkey LIMIT 200""".stripMargin,

    "fn_datetime2" ->
      """SELECT o_orderkey,
        | CAST(timezone('America/New_York', o_orderdate::TIMESTAMPTZ) AS TIMESTAMP) AS nyc,
        | CAST(timezone('Asia/Tokyo', o_orderdate::TIMESTAMPTZ) AS TIMESTAMP) AS tokyo,
        | o_orderdate + INTERVAL 1 MONTH AS plus1mo,
        | o_orderdate - INTERVAL 45 DAY AS minus45d,
        | o_orderdate + INTERVAL 90 MINUTE AS plus90min,
        | CAST(date_part('year', age(o_orderdate, TIMESTAMP '1995-01-01')) AS BIGINT) AS age_y,
        | CAST(date_part('month', age(o_orderdate, TIMESTAMP '1995-01-01')) AS BIGINT) AS age_m,
        | CAST(date_part('day', age(o_orderdate, TIMESTAMP '1995-01-01')) AS BIGINT) AS age_d
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin,

    "fn_math3" ->
      """SELECT l_orderkey, l_linenumber,
        | round(gamma(l_linenumber + 0.5), 6) AS gm,
        | round(lgamma(l_linenumber * 3 + 0.25), 6) AS lg,
        | nextafter(l_discount, 1.0) AS na,
        | nfc_normalize(l_returnflag || 'e' || chr(769)) AS nfc
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, na, nfc LIMIT 200""".stripMargin,

    "fn_grapheme" ->
      """SELECT p_partkey,
        | CAST(length_grapheme(p_name) AS BIGINT) AS g_plain,
        | CAST(length(p_name) AS BIGINT) AS cp_plain,
        | CAST(length_grapheme(p_brand || 'e' || chr(769)) AS BIGINT) AS g_accent,
        | CAST(length(p_brand || 'e' || chr(769)) AS BIGINT) AS cp_accent
        |FROM part ORDER BY p_partkey LIMIT 100""".stripMargin,

    "fn_bar" ->
      """SELECT s_suppkey,
        | bar(s_acctbal, 0, 10000, 20) AS b20,
        | bar(s_acctbal, -1000, 10000) AS b80,
        | bar(s_acctbal, 0, 10000, 12.5) AS bfrac
        |FROM supplier ORDER BY s_suppkey LIMIT 200""".stripMargin,

    "fn_bit" ->
      """SELECT o_orderkey,
        | lpad(bin(o_orderkey % 256), 8, '0') AS bits,
        | CAST(get_bit(lpad(bin(o_orderkey % 256), 8, '0')::BIT, CAST(o_orderkey % 8 AS INT)) AS BIGINT) AS g,
        | set_bit(lpad(bin(o_orderkey % 256), 8, '0')::BIT, CAST(o_orderkey % 8 AS INT), 1)::VARCHAR AS sb,
        | CAST(bit_position('1'::BIT, lpad(bin(o_orderkey % 256), 8, '0')::BIT) AS BIGINT) AS bp,
        | CAST(bit_count(o_orderkey % 256) AS BIGINT) AS bc
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin,

    "fn_hash" ->
      """SELECT p_partkey, md5(p_name) AS h_md5, sha256(p_name) AS h_sha,
        | lower(hex(p_name)) AS h_hex, base64(p_name::BLOB) AS b64
        |FROM part ORDER BY p_partkey LIMIT 100""".stripMargin,

    "fn_math2" ->
      """SELECT l_orderkey, l_linenumber,
        | even(l_quantity / 7.0) AS ev,
        | gcd(l_partkey, l_suppkey) AS g,
        | lcm(l_linenumber, 6) AS lc,
        | CAST(factorial(CAST(l_linenumber AS INTEGER)) AS BIGINT) AS fact,
        | isnan(CAST('NaN' AS DOUBLE) * l_quantity) AS nan_check
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey
        |LIMIT 200""".stripMargin,

    "fn_decimal" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS dec_sum,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS dec_qty,
        | CAST(min(CAST(l_discount AS DECIMAL(10,4))) AS DOUBLE) AS dec_min
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "fn_string2" ->
      """SELECT p_partkey,
        | strip_accents(p_name) AS sa,
        | format_bytes(CAST(p_retailprice * 1000 AS BIGINT)) AS fb,
        | format_bytes(CAST(p_size AS BIGINT)) AS fb_small,
        | printf('%d-%s', p_size, p_brand) AS pf,
        | parse_filename('/data/' || p_brand || '/' || p_name || '.txt') AS fname,
        | parse_dirpath('/data/' || p_brand || '/' || p_name || '.txt') AS dirpath
        |FROM part ORDER BY p_partkey LIMIT 200""".stripMargin,

    // DuckDB returns NULL on division by zero — matching try_divide
    "fn_try" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice / l_quantity, 6) AS div_ok,
        | l_quantity / (l_quantity - l_quantity) AS div_zero,
        | CAST(try_cast(l_returnflag AS INTEGER) AS BIGINT) AS tc_bad,
        | CAST(try_cast(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS BIGINT) AS tc_ok
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |LIMIT 200""".stripMargin,

    "events_time_bucket" ->
      """SELECT time_bucket(INTERVAL 2 HOUR, ts) AS bucket,
        | count(*) AS n, round(sum(value),2) AS sv
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
