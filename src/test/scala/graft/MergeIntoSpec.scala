package graft

import graft.operators.MergeInto
import org.scalatest.funsuite.AnyFunSuite

class MergeIntoSpec extends AnyFunSuite {
  import SparkTestSession._

  test("upsert updates matched keys and inserts unmatched ones") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "v")
    val updates = Seq((2L, "B2", 99.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val got = MergeInto.upsert(base, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, "a", 10.0), (2L, "B2", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert lets a matched update row null out a column (UPDATE SET *)") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    val updates = Seq((1L, null.asInstanceOf[String], 11.0)).toDF("k", "name", "v")
    val rows = MergeInto.upsert(base, updates, Seq("k")).orderBy("k").collect()
    // matched row: the update wins for every column, including its NULL
    assert(rows(0).isNullAt(1) && rows(0).getDouble(2) == 11.0)
    // unmatched base row passes through untouched
    assert(rows(1).getString(1) == "b" && rows(1).getDouble(2) == 20.0)
  }

  test("delete removes exactly the keyed rows") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val del = Seq(Tuple1(2L)).toDF("k")
    val got = MergeInto.delete(base, del, Seq("k")).orderBy("k")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 3L))
  }
}
