package graft

import java.nio.file.{Files, Paths}

import graft.sources.{DeltaFixture, DeltaScan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Delta-log reader: snapshot replay (add/remove), time travel,
  * partition-value attachment, log-level pruning, and the loud
  * unsupported-feature guards.
  */
class DeltaScanSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val nation =
    spark.read.parquet(s"$sf/nation.parquet").orderBy(col("n_nationkey"))
  private lazy val table = DeltaFixture.nationTable(spark, sf)

  test("latest snapshot equals the source table after add+remove compaction") {
    val got = DeltaScan.scan(spark, table).orderBy(col("n_nationkey"))
    assert(got.collect().toSeq == nation.collect().toSeq)
    // v2 removed the two v0/v1 files: exactly one active file remains
    assert(DeltaScan.snapshot(spark, table).files.map(_.path) == Seq("part-v2-full.parquet"))
  }

  test("time travel: v0 is the first commit's rows, v1 the union") {
    val v0 = DeltaScan.scan(spark, table, versionAsOf = Some(0L))
    assert(v0.collect().toSeq ==
      nation.filter(col("n_nationkey") < 20).collect().toSeq)
    val v1 = DeltaScan.scan(spark, table, versionAsOf = Some(1L))
      .orderBy(col("n_nationkey"))
    assert(v1.collect().toSeq == nation.collect().toSeq)
  }

  test("partitioned table: partition values attach from the log, typed") {
    val part = DeltaFixture.nationByRegion(spark, sf)
    val got = DeltaScan.scan(spark, part)
    assert(got.schema("n_regionkey").dataType ==
      nation.schema("n_regionkey").dataType)
    assert(got.orderBy(col("n_nationkey")).collect().toSeq ==
      nation.select(got.columns.map(col).toSeq: _*).collect().toSeq)
  }

  test("scanWhere: the predicate itself prunes files from the log") {
    val part = DeltaFixture.nationByRegion(spark, sf)
    val allFiles = DeltaScan.snapshot(spark, part).files.size
    val pruned = DeltaScan.scanWhere(spark, part, col("n_regionkey") === 2)
    assert(pruned.orderBy(col("n_nationkey")).collect().toSeq ==
      nation.filter(col("n_regionkey") === 2)
        .select(pruned.columns.map(col).toSeq: _*).collect().toSeq)
    // pruning is observable: fewer data files enter the scan
    assert(pruned.inputFiles.length < allFiles,
      s"expected < $allFiles files, scanned ${pruned.inputFiles.length}")
    // a predicate over non-partition columns degrades to keep-all, never
    // to wrong answers
    val residual = DeltaScan.scanWhere(spark, part, col("n_nationkey") < 5)
    assert(residual.orderBy(col("n_nationkey")).collect().toSeq ==
      nation.filter(col("n_nationkey") < 5)
        .select(residual.columns.map(col).toSeq: _*).collect().toSeq)
    assert(residual.inputFiles.length == allFiles)
  }

  test("log-level partition pruning keeps only matching files") {
    val part = DeltaFixture.nationByRegion(spark, sf)
    val pruned = DeltaScan.scan(spark, part,
      partitionPruner = pv => pv.get("n_regionkey").contains("2"))
    assert(pruned.select(col("n_regionkey")).distinct().collect().map(_.get(0)).toSeq
      .map(_.toString) == Seq("2"))
    assert(pruned.count() ==
      nation.filter(col("n_regionkey").cast("string") === "2").count())
  }

  test("checkpoint + truncated log: snapshot folds from the checkpoint") {
    val t = DeltaFixture.nationTable(spark, sf)
    val cv = DeltaFixture.checkpoint(spark, t, truncate = true)
    assert(cv == 2L)
    // pre-checkpoint JSON commits are GONE — only the checkpoint can serve
    assert(DeltaScan.scan(spark, t).orderBy(col("n_nationkey")).collect().toSeq
      == nation.collect().toSeq)
    // time travel before the checkpoint is now impossible — clear error
    assertThrows[IllegalArgumentException](DeltaScan.snapshot(spark, t, Some(0L)))
  }

  test("checkpoint + later JSON commits replay on top") {
    val t = DeltaFixture.nationTable(spark, sf)
    DeltaFixture.checkpoint(spark, t, truncate = true) // cv = 2
    // v3: remove the compacted file, re-add the low half only
    java.nio.file.Files.copy(
      Paths.get(t, "part-v2-full.parquet"), Paths.get(t, "part-v3-copy.parquet"))
    DeltaFixture.appendCommit(t, 3L,
      removes = Seq("part-v2-full.parquet"), adds = Seq("part-v3-copy.parquet"))
    val snap = DeltaScan.snapshot(spark, t)
    assert(snap.version == 3L)
    assert(snap.files.map(_.path) == Seq("part-v3-copy.parquet"))
    assert(DeltaScan.scan(spark, t).count() == nation.count())
  }

  test("unsupported features fail loudly") {
    val t2 = DeltaFixture.nationTable(spark, sf)
    Files.write(Paths.get(t2, "_delta_log", f"${3L}%020d.json"),
      java.util.Arrays.asList("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""))
    assertThrows[UnsupportedOperationException](DeltaScan.snapshot(spark, t2))
    // but time travel BELOW the breaking protocol version still works
    assert(DeltaScan.scan(spark, t2, versionAsOf = Some(2L)).count() == nation.count())

    // multi-part checkpoints are read part-by-part; a referenced part
    // that is missing on disk must fail loudly, not scan a partial state
    val t3 = DeltaFixture.nationTable(spark, sf)
    Files.write(Paths.get(t3, "_delta_log", "_last_checkpoint"),
      java.util.Arrays.asList("""{"version":1,"size":3,"parts":2}"""))
    val e = intercept[IllegalArgumentException](DeltaScan.snapshot(spark, t3))
    assert(e.getMessage.contains("checkpoint part missing"))
  }
}
