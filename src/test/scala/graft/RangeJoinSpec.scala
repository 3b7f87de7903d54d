package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed band join: result parity with the naive nested-loop form,
  * sub-quadratic candidate generation, and a plan pin that the quadratic
  * operators (BNLJ / cartesian) are gone from the gated range query.
  */
class RangeJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("band join matches the naive non-equi join row-for-row") {
    val sup = Tables(spark, sf, "supplier")
    val cust = Tables(spark, sf, "customer")
    val cond = col("c_acctbal") > col("s_acctbal") - 10 && col("c_acctbal") <= col("s_acctbal")
    val naive = sup.join(cust, cond)
      .select(col("s_suppkey"), col("c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val banded = RangeJoin.band(sup, cust, "s_acctbal", "c_acctbal", -10.0, 0.0, cond)
      .select(col("s_suppkey"), col("c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(banded.length == naive.length)
    assert(banded.toSeq == naive.toSeq)
  }

  test("negative keys and open/closed endpoints bucket correctly") {
    import spark.implicits._
    val l = Seq(-25.0, -10.0, 0.0, 3.5, 17.0).toDF("lv")
    val r = Seq(-30.0, -25.0, -20.5, -10.0, -3.0, 0.0, 3.5, 9.9, 17.0, 40.0).toDF("rv")
    val cond = col("rv") > col("lv") - 10 && col("rv") <= col("lv")
    val naive = l.crossJoin(r).filter(cond)
      .collect().map(x => (x.getDouble(0), x.getDouble(1))).sorted
    val banded = RangeJoin.band(l, r, "lv", "rv", -10.0, 0.0, cond)
      .collect().map(x => (x.getDouble(0), x.getDouble(1))).sorted
    assert(banded.toSeq == naive.toSeq)
  }

  test("candidate count is sub-quadratic on a fact-sized self band join") {
    // orders × orders on totalprice within ±50: n² would be 2.25e8 pairs
    // at sf0.001 (15k×15k); the bucketed candidates must stay orders of
    // magnitude below that
    val ord = Tables(spark, sf, "orders").select(col("o_orderkey").as("a_key"),
      col("o_totalprice").as("a_price"))
    val ord2 = Tables(spark, sf, "orders").select(col("o_orderkey").as("b_key"),
      col("o_totalprice").as("b_price"))
    val n = ord.count()
    val cands = RangeJoin.bandCandidates(ord, ord2, "a_price", "b_price", -50.0, 50.0).count()
    assert(cands < n * n / 100,
      s"candidates $cands not sub-quadratic vs n²=${n * n}")
    // and the exact band result is what the naive predicate produces
    val cond = col("b_price") >= col("a_price") - 50 && col("b_price") <= col("a_price") + 50
    val banded = RangeJoin.band(ord, ord2, "a_price", "b_price", -50.0, 50.0, cond).count()
    val naive = ord.join(ord2, cond).count()
    assert(banded == naive)
  }

  test("integral keys take the exact-arithmetic path and match the naive join") {
    import spark.implicits._
    // keys sitting ON bucket boundaries (multiples of w=10) — the shape
    // where double floor-division could disagree between the two sides
    val l = Seq(-30L, -20L, -10L, 0L, 10L, 20L, 25L).toDF("lv")
    val r = Seq(-40L, -30L, -21L, -20L, -10L, -1L, 0L, 9L, 10L, 19L, 20L, 30L).toDF("rv")
    val cond = col("rv") >= col("lv") - 10 && col("rv") <= col("lv")
    val naive = l.crossJoin(r).filter(cond)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val banded = RangeJoin.band(l, r, "lv", "rv", -10.0, 0.0, cond)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    assert(banded.toSeq == naive.toSeq)
    // tight 2-bucket explode: candidates = 2 joins' worth, never 4
    val cands = RangeJoin.bandCandidates(l, r, "lv", "rv", -10.0, 0.0)
    assert(cands.count() <= 2L * l.count() * r.count())
  }

  test("double keys within ulps of bucket boundaries match the naive join") {
    import spark.implicits._
    // every key sits ON or within a few ulps of a bucket boundary (k·w)
    // — the shape where the two sides' independent double divisions can
    // floor across the boundary in opposite directions. The widened left
    // explode must keep every genuine pair no matter which way each side
    // rounds; the naive cross join is the oracle.
    val w = 0.3 // not exactly representable: divisions actually round
    def ulps(x: Double, n: Int): Double = {
      var v = x; var i = 0
      while (i < math.abs(n)) { v = if (n > 0) Math.nextUp(v) else Math.nextDown(v); i += 1 }
      v
    }
    val vals = for {
      k <- Seq(-7, -3, -1, 0, 1, 4, 9)
      d <- Seq(-2, -1, 0, 1, 2)
    } yield ulps(k * w, d)
    val l = vals.toDF("lv")
    val r = vals.toDF("rv")
    val cond = col("rv") >= col("lv") - lit(w) && col("rv") <= col("lv")
    val naive = l.crossJoin(r).filter(cond)
      .collect().map(x => (x.getDouble(0), x.getDouble(1))).sorted
    val banded = RangeJoin.band(l, r, "lv", "rv", -w, 0.0, cond)
      .collect().map(x => (x.getDouble(0), x.getDouble(1))).sorted
    assert(banded.toSeq == naive.toSeq)
  }

  test("double path refuses quotients beyond 2^51 instead of dropping matches") {
    import spark.implicits._
    // |key/w| ~ 3e16 > 2^51: one ulp of the quotient exceeds a bucket, so
    // the lb-1..lb+2 window can no longer absorb the rounding error —
    // the join must fail loudly, not return an incomplete result
    val l = Seq(1.0e16).toDF("a")
    val r = Seq(1.0e16 + 0.1).toDF("b")
    val e = intercept[Exception] {
      RangeJoin.band(l, r, "a", "b", lo = -0.3, hi = 0.3,
        cond = col("b") >= col("a") - 0.3 && col("b") <= col("a") + 0.3).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("2^51"),
      s"expected the magnitude guard, got: ${e.getMessage}")
  }

  test("gated range query plans no BNLJ and no cartesian product") {
    val e = SparkEntry.queries("join_non_equi_range")(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!e.contains("BroadcastNestedLoopJoin"), e.take(2000))
    assert(!e.contains("CartesianProduct"), e.take(2000))
    assert(e.contains("SortMergeJoin") || e.contains("ShuffledHashJoin")
      || e.contains("BroadcastHashJoin"), e.take(2000))
  }

  // --- two-inequality IEJoin ---

  private def iePairs(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame,
      sX: Boolean, sY: Boolean, blocks: Int = 8): Seq[(Long, Long)] =
    RangeJoin.ieJoin(l, r, "lx", "rx", sX, "ly", "ry", sY, blocks)
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq

  private def naivePairs(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame,
      sX: Boolean, sY: Boolean): Seq[(Long, Long)] = {
    val cx = if (sX) col("lx") < col("rx") else col("lx") <= col("rx")
    val cy = if (sY) col("ly") > col("ry") else col("ly") >= col("ry")
    l.crossJoin(r).filter(cx && cy)
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
  }

  test("ieJoin matches the naive 2-inequality join across strictness variants") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val l = (1L to 400L).map(i => (i, rnd.nextInt(100).toDouble, rnd.nextInt(100).toDouble))
      .toDF("lid", "lx", "ly")
    val r = (1L to 400L).map(i => (i, rnd.nextInt(100).toDouble, rnd.nextInt(100).toDouble))
      .toDF("rid", "rx", "ry")
    for (sX <- Seq(true, false); sY <- Seq(true, false)) {
      val got = iePairs(l, r, sX, sY)
      val want = naivePairs(l, r, sX, sY)
      assert(got == want, s"strictX=$sX strictY=$sY: ${got.length} vs ${want.length}")
    }
  }

  test("ieJoin is exact on long keys beyond 2^53 (double collapse post-filtered)") {
    import spark.implicits._
    // 2^53 = 9007199254740992: base+0 and base+1 collapse to the SAME
    // double, so a double-only strict sweep would both emit false pairs
    // and (with strict bounds applied on doubles) drop true ones — the
    // non-strict sweep + exact typed post-filter must return the naive
    // answer
    val base = 9007199254740992L
    val l = Seq((1L, base, base + 3L), (2L, base + 1L, base + 1L),
        (3L, base + 2L, base + 5L))
      .toDF("lid", "lxL", "lyL")
      .select(col("lid"), col("lxL").as("lx"), col("lyL").as("ly"))
    val r = Seq((1L, base + 1L, base + 2L), (2L, base + 2L, base + 1L),
        (3L, base + 5L, base + 4L))
      .toDF("rid", "rxL", "ryL")
      .select(col("rid"), col("rxL").as("rx"), col("ryL").as("ry"))
    for (sX <- Seq(true, false); sY <- Seq(true, false)) {
      val got = RangeJoin.ieJoin(l, r, "lx", "rx", sX, "ly", "ry", sY, blocks = 4)
        .select(col("lid"), col("rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      val cx = if (sX) col("lx") < col("rx") else col("lx") <= col("rx")
      val cy = if (sY) col("ly") > col("ry") else col("ly") >= col("ry")
      val want = l.crossJoin(r).filter(cx && cy)
        .select(col("lid"), col("rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(got == want, s"strictX=$sX strictY=$sY: $got vs $want")
    }
  }

  test("ieJoin keeps matches at the -0.0/0.0 boundary (normalized keys)") {
    import spark.implicits._
    // SQL: -0.0 = 0.0, so with a non-strict y bound the -0.0-keyed left
    // row must match a 0.0 probe (java.lang.Double orders -0.0 BELOW
    // 0.0 — an unnormalized TreeMap tail view would drop it)
    val l = Seq((1L, 1.0, -0.0), (2L, 1.0, 0.0)).toDF("lid", "lx", "ly")
    val r = Seq((1L, 2.0, 0.0), (2L, 2.0, -0.0)).toDF("rid", "rx", "ry")
    val got = iePairs(l, r, sX = true, sY = false)
    assert(got == Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)), got.toString)
  }

  test("ieJoin drops null-keyed rows (SQL inequality semantics) and handles empty sides") {
    import spark.implicits._
    val l = Seq((1L, Some(1.0), Some(5.0)), (2L, None, Some(5.0)), (3L, Some(2.0), None))
      .toDF("lid", "lx", "ly")
    val r = Seq((1L, Some(2.0), Some(1.0)), (2L, None, Some(0.0)))
      .toDF("rid", "rx", "ry")
    assert(iePairs(l, r, sX = true, sY = true) == Seq((1L, 1L)))
    val empty = l.limit(0)
    assert(iePairs(empty, r, sX = true, sY = true).isEmpty)
  }

  test("ieJoin interval-overlap gate matches its oracle shape and plans no BNLJ") {
    val df = SparkEntry.queries("join_iejoin_overlap")(spark, sf)
    val e = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!e.contains("BroadcastNestedLoopJoin"), e.take(2000))
    assert(!e.contains("CartesianProduct"), e.take(2000))
    // differential vs the nested-loop spelling on the same fixture slice
    val o = Tables(spark, sf, "orders")
    val a = o.filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("a_id"), col("o_totalprice").as("a_lo"),
        (col("o_totalprice") + 5000.0).as("a_hi"))
    val b = o.filter(col("o_orderkey") % 89 === 0)
      .select(col("o_orderkey").as("b_id"), col("o_totalprice").as("b_lo"),
        (col("o_totalprice") + 5000.0).as("b_hi"))
    val naive = a.crossJoin(b)
      .filter(col("a_lo") < col("b_hi") && col("a_hi") > col("b_lo"))
      .select(col("a_id"), col("b_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    val got = df.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got == naive.sorted.take(500))
  }
}
