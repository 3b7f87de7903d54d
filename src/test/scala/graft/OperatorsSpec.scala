package graft

import graft.operators.{AsOfJoin, PositionalJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-level unit tests on micro-fixtures mirroring the reference's
  * sqllogictest patterns (e.g. test/sql/join/asof/test_asof_join.test's
  * trades/prices fixture).
  */
class OperatorsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("approx MAD tracks exact MAD within sketch error") {
    import graft.operators.StatsOps
    import spark.implicits._
    val df = (1 to 2000).map(i => ("g" + (i % 2), (i % 97).toDouble)).toDF("k", "v")
    val exact = StatsOps.mad(df, Seq("k"), Seq("v" -> "m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = StatsOps.madApprox(df, Seq("k"), Seq("v" -> "m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, m) =>
      assert(math.abs(approx(k) - m) <= math.max(1.0, m * 0.05),
        s"$k: approx=${approx(k)} exact=$m")
    }
  }

  test("asof backward join matches nearest-predecessor semantics") {
    import spark.implicits._
    // prices: key, t, price — trades: key, t
    val prices = Seq(("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0), ("B", 4L, 20.0))
      .toDF("k", "t", "price")
    val trades = Seq(("A", 0L), ("A", 1L), ("A", 6L), ("A", 100L), ("B", 3L), ("B", 4L))
      .toDF("k", "t")
    val got = AsOfJoin.backward(trades, prices, Seq("k"), "t", Seq("price"))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      ("A", 0L, None),         // before first price
      ("A", 1L, Some(10.0)),   // exact tie matches (>= semantics)
      ("A", 6L, Some(11.0)),   // nearest predecessor
      ("A", 100L, Some(12.0)), // last known
      ("B", 3L, None),
      ("B", 4L, Some(20.0))))
  }

  test("asof forward join matches nearest-successor semantics") {
    import spark.implicits._
    val prices = Seq(("A", 5L, 11.0), ("A", 9L, 12.0)).toDF("k", "t", "price")
    val trades = Seq(("A", 4L), ("A", 5L), ("A", 10L)).toDF("k", "t")
    val got = AsOfJoin.forward(trades, prices, Seq("k"), "t", Seq("price"))
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (4L, Some(11.0)),  // next price at t=5
      (5L, Some(11.0)),  // tie matches (<= semantics)
      (10L, None)))      // nothing after
  }

  test("asof tolerance nulls out distant matches") {
    import spark.implicits._
    // timestamps: tolerance is measured in microseconds; mk takes millis
    val mk = (ms: Long) => new java.sql.Timestamp(ms)
    val prices = Seq(("A", mk(1000000), 10.0)).toDF("k", "t", "price")
    val trades = Seq(("A", mk(1000500)), ("A", mk(90000000))).toDF("k", "t")
    val got = AsOfJoin.join(trades, prices, Seq("k"), "t", Seq("price"),
        forward = false, toleranceMicros = Some(1000L * 1000))
      .orderBy("t").collect().map(r => Option(r.get(2)))
    assert(got.toSeq == Seq(Some(10.0), None)) // 0.5s ok, 89s beyond 1s tolerance
  }

  test("asof backward matches a brute-force reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val prices = Seq.fill(300)((s"k${rnd.nextInt(20)}", rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .distinctBy(p => (p._1, p._2)) // unique (k,t) keeps the match unambiguous
      .toDF("k", "t", "price")
    val trades = Seq.fill(200)((s"k${rnd.nextInt(25)}", rnd.nextInt(1000).toLong)).distinct
    val tradesDf = trades.toDF("k", "t")
    val got = AsOfJoin.backward(tradesDf, prices, Seq("k"), "t", Seq("price"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    // brute force: for each trade, the price row with max t' <= t (ties:
    // the union+window picks the one latest in (t, insertion) order — with
    // distinct (k,t) price rows the max t' is unique)
    val priceRows = prices.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    trades.foreach { case (k, t) =>
      val expected = priceRows.getOrElse(k, Array.empty)
        .filter(_._2 <= t).sortBy(_._2).lastOption.map(_._3)
      assert(got((k, t)) == expected, s"key=$k t=$t")
    }
  }

  test("positional join pads the shorter side with nulls") {
    import spark.implicits._
    val l = Seq("a", "b", "c").toDF("x")
    val r = Seq(1, 2).toDF("y")
    val got = PositionalJoin(l, r).orderBy("pos")
      .collect().map(r => (r.getLong(r.fieldIndex("pos")), r.getString(0), Option(r.get(1))))
    assert(got.toSeq == Seq((1L, "a", Some(1)), (2L, "b", Some(2)), (3L, "c", None)))
  }
}
