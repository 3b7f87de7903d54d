package graft

import org.scalatest.funsuite.AnyFunSuite

/** sources/TpchFixture + queries/TpchVerbatim: the fixture invariants the
  * verbatim texts' hash-exactness and selectivity rest on, pinned so a
  * generator edit fails HERE instead of as a driver hash-red.
  *
  * Two invariant classes (both learned on the TPC-DS track):
  *  - EXACTNESS: money integer-valued, discount/tax 1/64-multiples, and
  *    the worst-case sum (charge * 4096) below 2^53 — the round-free
  *    verbatim aggregates are bit-exact in any accumulation order only
  *    while these hold.
  *  - ORDER-DETERMINISM: the driver compare is row-order sensitive, so
  *    ORDER BY keys that are computed doubles must be tie-free at least
  *    through any LIMIT cutoff (q3/q10/q11).
  */
class TpchVerbatimSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.sources.TpchFixture
  import org.apache.spark.sql.functions._

  private def table(name: String) = {
    TpchFixture.ensure(spark)
    spark.read.parquet(s"${TpchFixture.dir}/$name.parquet")
  }

  test("contract: 22 queries, oracle keys match") {
    assert(queries.TpchVerbatim.queries.size == 22)
    assert(queries.TpchVerbatim.queries.keySet ==
      queries.TpchVerbatim.oracle.keySet)
  }

  test("exactness invariants: integer money, 1/64 discount/tax, 2^53 headroom") {
    val li = table("lineitem").cache()
    // integer-valued doubles
    for (c <- Seq("l_quantity", "l_extendedprice")) {
      val frac = li.filter(col(c) =!= floor(col(c))).count()
      assert(frac == 0, s"$c has $frac non-integer values")
    }
    // discount and tax are exact multiples of 1/64 (binary-exact)
    for (c <- Seq("l_discount", "l_tax")) {
      val off = li.filter(col(c) * 64 =!= floor(col(c) * 64)).count()
      assert(off == 0, s"$c has $off non-1/64 values")
    }
    // q6's BETWEEN 0.05 AND 0.07 band holds exactly one arm (4/64)
    val band = li.filter(col("l_discount").between(0.05, 0.07))
      .select(countDistinct(col("l_discount"))).head.getLong(0)
    assert(band == 1, s"q6 discount band holds $band distinct values")
    // worst-case verbatim sum: charge <= ext * (1+8/64), 12 fractional
    // bits -> sum * 4096 must stay below 2^53 for order-free exactness
    val total = li.select(sum(col("l_extendedprice") * 1.125)).head.getDouble(0)
    assert(total * 4096 < math.pow(2, 53),
      f"charge-sum headroom exhausted: $total%.0f * 4096 >= 2^53")
    for (c <- Seq("ps_supplycost" -> "partsupp", "o_totalprice" -> "orders",
      "c_acctbal" -> "customer", "s_acctbal" -> "supplier",
      "p_retailprice" -> "part")) {
      val frac = table(c._2).filter(col(c._1) =!= floor(col(c._1))).count()
      assert(frac == 0, s"${c._1} has $frac non-integer values")
    }
    li.unpersist()
  }

  test("referential integrity: lineitem suppliers exist in partsupp, keys in range") {
    val li = table("lineitem")
    val ps = table("partsupp").cache()
    // q9's inner join must not drop lines: every (part, supp) pair exists
    val orphans = li.select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct()
      .join(ps, col("pk") === col("ps_partkey") && col("sk") === col("ps_suppkey"),
        "left_anti").count()
    assert(orphans == 0, s"$orphans lineitem (part, supp) pairs missing from partsupp")
    // each part's four supplier arms are distinct (partsupp PK)
    val dup = ps.groupBy("ps_partkey", "ps_suppkey").count()
      .filter(col("count") > 1).count()
    assert(dup == 0, s"$dup duplicate partsupp pairs")
    // dbgen rule: custkey ≡ 0 (mod 3) never orders (q22's NOT EXISTS set)
    val mod3 = table("orders").filter(pmod(col("o_custkey"), lit(3)) === 0).count()
    assert(mod3 == 0, s"$mod3 orders reference custkey ≡ 0 mod 3")
    ps.unpersist()
  }

  test("order-determinism: computed ORDER BY doubles are tie-free through cutoffs") {
    TpchFixture.view(spark, "lineitem")
    TpchFixture.view(spark, "partsupp")
    TpchFixture.view(spark, "supplier")
    TpchFixture.view(spark, "nation")
    TpchFixture.view(spark, "orders")
    TpchFixture.view(spark, "customer")
    // q11: one row per part, ORDER BY value DESC with no tiebreak
    val q11 = spark.sql(
      """SELECT sum(ps_supplycost * ps_availqty) AS v FROM partsupp, supplier, nation
        |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND n_name = 'GERMANY' GROUP BY ps_partkey""".stripMargin).cache()
    assert(q11.count() == q11.select(countDistinct(col("v"))).head.getLong(0),
      "q11 value column has ties — widen ps_supplycost range")
    q11.unpersist()
    // q3 (LIMIT 10) and q10 (LIMIT 20): the revenue order key must be
    // tie-free through one past the cutoff
    val q3 = spark.sql(
      """SELECT sum(l_extendedprice * (1 - l_discount)) AS r
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_shippriority
        |ORDER BY r DESC LIMIT 11""".stripMargin)
      .collect().map(_.getDouble(0))
    assert(q3.distinct.length == q3.length, "q3 revenue tie inside the top-11")
    val q10 = spark.sql(
      """SELECT sum(l_extendedprice * (1 - l_discount)) AS r
        |FROM customer, orders, lineitem
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= DATE '1993-10-01' AND o_orderdate < DATE '1994-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey ORDER BY r DESC LIMIT 21""".stripMargin)
      .collect().map(_.getDouble(0))
    assert(q10.distinct.length == q10.length, "q10 revenue tie inside the top-21")
  }

  test("plants hold: q17/q19 parts, q18 heavy orders, nation plants, q16 complaints") {
    val p = table("part")
    assert(p.filter(col("p_brand") === "Brand#23" && col("p_container") === "MED BOX")
      .count() >= 8, "q17 plant (Brand#23/MED BOX) drifted")
    assert(p.filter(col("p_brand") === "Brand#12" && col("p_container") === "SM CASE" &&
      col("p_size").between(1, 5)).count() >= 8, "q19 arm-1 plant drifted")
    assert(p.filter(col("p_brand") === "Brand#34" && col("p_container") === "LG PACK" &&
      col("p_size").between(1, 15)).count() >= 8, "q19 arm-3 plant drifted")
    // q18: the planted orders clear HAVING sum(l_quantity) > 300
    val heavy = table("lineitem").groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("q")).filter(col("q") > 300).count()
    assert(heavy >= 8, s"only $heavy orders clear q18's 300-quantity bar")
    // planted nations (q20 CANADA, q21 SAUDI ARABIA, q11 GERMANY, q7 FRANCE)
    val s = table("supplier").cache()
    for ((nk, n) <- Seq(3 -> 3, 20 -> 4, 7 -> 2, 6 -> 2))
      assert(s.filter(col("s_nationkey") === nk).count() >= n,
        s"nation $nk supplier plant drifted")
    assert(s.filter(col("s_comment").like("%Customer%Complaints%")).count() >= 2,
      "q16 complaints plant drifted")
    s.unpersist()
  }

  test("sparse verbatim queries return real (non-null) results") {
    for (name <- Seq("thq02", "thq07", "thq12", "thq16", "thq20", "thq21")) {
      val n = queries.TpchVerbatim.queries(name)(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
    // single-row aggregates: the value itself must be non-NULL (an empty
    // input would vacuously "match" the oracle as NULL)
    for (name <- Seq("thq14", "thq17", "thq19")) {
      val row = queries.TpchVerbatim.queries(name)(spark, sf).head
      assert(!row.isNullAt(0), s"$name aggregate is NULL (empty input)")
    }
    // q8 must produce BOTH compared years
    val years = queries.TpchVerbatim.queries("thq08")(spark, sf)
      .collect().map(_.getLong(0)).sorted
    assert(years.toSeq == Seq(1995L, 1996L), s"thq08 years: ${years.mkString(",")}")
  }
}
