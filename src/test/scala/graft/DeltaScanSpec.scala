package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.sources.{DeletionVectors, DeltaFixture, DeltaScan}
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

  test("z85 codec matches the public ZeroMQ test vector and round-trips") {
    // rfc.zeromq.org/spec/32: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B <-> "HelloWorld"
    val v = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b).map(_.toByte)
    assert(DeletionVectors.z85Encode(v) == "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").sameElements(v))
    val rnd = new scala.util.Random(3)
    val bytes = Array.fill(64)(rnd.nextInt().toByte)
    assert(DeletionVectors.z85Decode(DeletionVectors.z85Encode(bytes)).sameElements(bytes))
  }

  test("roaring DV payload round-trips across container types and 32-bit boundaries") {
    // array container + bitmap container (>4096 dense values) + a second
    // 16-bit key chunk + indexes past 2^32 (second bitmap in the array)
    val idx = (Array(1L, 5L, 9L) ++
      (10000L until 15000L) ++ // bitmap container in chunk 0
      Array(70000L, 70001L) ++ // chunk 1
      Array(1L << 32 | 42L, 1L << 32 | 43L) // bitmap index 1
      ).sorted
    val got = DeletionVectors.deserialize(DeletionVectors.serialize(idx))
    assert(got.sameElements(idx))
    // wire shape: little-endian magic, 2 bitmaps
    val bytes = DeletionVectors.serialize(idx)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt == 1681511377)
    assert(bb.getLong == 2L)
  }

  test("deletion vectors: sidecar + inline DVs mask rows; cardinality and crc are honored") {
    val t = DeltaFixture.nationWithDv(spark, sf)
    val got = DeltaScan.scan(spark, t)
      .select("n_nationkey").collect().map(_.getAs[Number](0).longValue).sorted
    val want = (0L until 25L).filterNot(Set(1L, 5L, 9L, 14L, 20L))
    assert(got.toSeq == want)
    // v0 (pre-DV) still reads the full table — DVs attach to the v1 adds
    assert(DeltaScan.scan(spark, t, versionAsOf = Some(0L)).count() == 25L)
    // a corrupted sidecar byte must fail the checksum, not mis-read
    val dvFile = java.nio.file.Files.list(Paths.get(t)).iterator()
      .asScala.find(_.getFileName.toString.startsWith("deletion_vector_")).get
    val raw = java.nio.file.Files.readAllBytes(dvFile)
    raw(raw.length - 6) = (raw(raw.length - 6) ^ 0x01).toByte // inside payload
    java.nio.file.Files.write(dvFile, raw)
    val e = intercept[Exception](DeltaScan.scan(spark, t).count())
    assert(e.getMessage.contains("checksum") || e.getMessage.contains("magic"),
      s"expected integrity failure, got: ${e.getMessage}")
  }

  test("protocol v3 gate: deletionVectors+columnMapping readable, unknown features throw") {
    val t = DeltaFixture.nationTable(spark, sf)
    Files.write(Paths.get(t, "_delta_log", f"${3L}%020d.json"),
      java.util.Arrays.asList("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","columnMapping","v2Checkpoint"]}}"""))
    val e = intercept[UnsupportedOperationException](DeltaScan.snapshot(spark, t))
    // only the genuinely-unimplemented feature is named as unsupported
    assert(e.getMessage.contains("readerFeatures v2Checkpoint unsupported"))
  }

  test("column mapping (name mode): logical names, physical files, keyed partition values") {
    val t = DeltaFixture.nationWithColumnMapping(spark, sf)
    val snap = DeltaScan.snapshot(spark, t)
    assert(snap.columnMappingMode == "name")
    // partitionValues in the log are keyed by the PHYSICAL name
    assert(snap.files.forall(_.partitionValues.keySet == Set("pn-regionkey")))
    val got = DeltaScan.scan(spark, t)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"))
    val want = nation
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"))
    assert(got.collect().toSeq == want.collect().toSeq)
    // log-level pruning speaks LOGICAL names even though the log is physical
    val pruned = DeltaScan.scan(spark, t,
      partitionPruner = pv => pv.get("n_regionkey").contains("2"))
    assert(pruned.select(col("n_regionkey")).distinct().collect()
      .map(_.getAs[Number](0).longValue).toSeq == Seq(2L))
    assert(pruned.count() ==
      nation.filter(col("n_regionkey") === 2).count())
  }

  test("unsupported features fail loudly") {
    val t2 = DeltaFixture.nationTable(spark, sf)
    Files.write(Paths.get(t2, "_delta_log", f"${3L}%020d.json"),
      java.util.Arrays.asList("""{"protocol":{"minReaderVersion":4,"minWriterVersion":9}}"""))
    assertThrows[UnsupportedOperationException](DeltaScan.snapshot(spark, t2))
    // but time travel BELOW the breaking protocol version still works
    assert(DeltaScan.scan(spark, t2, versionAsOf = Some(2L)).count() == nation.count())
    // legacy minReaderVersion=2 (column-mapping era) is READABLE now —
    // without a mapping config it reads as a plain table
    val t2b = DeltaFixture.nationTable(spark, sf)
    Files.write(Paths.get(t2b, "_delta_log", f"${3L}%020d.json"),
      java.util.Arrays.asList("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""))
    assert(DeltaScan.scan(spark, t2b).count() == nation.count())

    // multi-part checkpoints are read part-by-part; a referenced part
    // that is missing on disk must fail loudly, not scan a partial state
    val t3 = DeltaFixture.nationTable(spark, sf)
    Files.write(Paths.get(t3, "_delta_log", "_last_checkpoint"),
      java.util.Arrays.asList("""{"version":1,"size":3,"parts":2}"""))
    val e = intercept[IllegalArgumentException](DeltaScan.snapshot(spark, t3))
    assert(e.getMessage.contains("checkpoint part missing"))
  }

  test("scanChanges: appended commits replay incrementally, OPTIMIZE skipped") {
    import graft.sources.DeltaWrite
    val dir = Files.createTempDirectory("graft_cdf").toString + "/t"
    val n = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    DeltaWrite.create(spark, n.filter(col("n_nationkey") < 10), dir)   // v0
    DeltaWrite.append(spark,
      n.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 18), dir) // v1
    val vOpt = DeltaWrite.optimize(spark, dir)                          // v2
    assert(vOpt == 2L, "optimize must have compacted (two small files)")
    DeltaWrite.append(spark, n.filter(col("n_nationkey") >= 18), dir)   // v3

    // full window: v1 + v3 rows only — v2's rewrite (dataChange=false)
    // must NOT re-emit v0/v1's rows
    val all = DeltaScan.scanChanges(spark, dir, fromVersion = 0L)
    assert(all.orderBy(col("n_nationkey"))
      .select(col("n_nationkey"), col("_commit_version")).collect().toSeq.map(r =>
        (r.getInt(0), r.getLong(1))) ==
      (10 until 18).map(k => (k, 1L)) ++ (18 until 25).map(k => (k, 3L)))

    // bounded window (0,1]: only v1; (1,3] crosses the OPTIMIZE: only v3
    assert(DeltaScan.scanChanges(spark, dir, 0L, toVersion = 1L).count() == 8)
    val tail = DeltaScan.scanChanges(spark, dir, 1L, toVersion = 3L)
    assert(tail.select(col("_commit_version")).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(3L))

    // caught-up consumer: empty frame, schema intact
    val empty = DeltaScan.scanChanges(spark, dir, fromVersion = 3L)
    assert(empty.count() == 0 &&
      empty.columns.last == "_commit_version")
  }

  test("history lists commits newest-first with operations and timestamps") {
    import graft.sources.DeltaWrite
    val dir = Files.createTempDirectory("graft_hist").toString + "/t"
    val n = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    DeltaWrite.create(spark, n.filter(col("n_nationkey") < 10), dir)
    DeltaWrite.append(spark, n.filter(col("n_nationkey") >= 10), dir)
    DeltaWrite.deleteWhere(spark, dir, col("n_nationkey") % 5 === 0)

    val h = DeltaScan.history(spark, dir).collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(2L, 1L, 0L))
    assert(h.map(_.getString(2)).toSeq ==
      Seq("DELETE", "WRITE", "CREATE TABLE AS SELECT"))
    // timestamps nondecreasing with version
    val ts = h.reverse.map(_.getTimestamp(1).getTime)
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
  }

  test("scanChanges: data-changing remove throws; ignoreChanges reads rewrites") {
    import graft.sources.DeltaWrite
    val dir = Files.createTempDirectory("graft_cdf_del").toString + "/t"
    val n = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    DeltaWrite.create(spark, n, dir)                                    // v0
    DeltaWrite.deleteWhere(spark, dir, col("n_nationkey") % 2 === 0)    // v1

    val e = intercept[UnsupportedOperationException](
      DeltaScan.scanChanges(spark, dir, fromVersion = 0L).collect())
    assert(e.getMessage.contains("ignoreChanges"))

    // ignoreChanges: the rewritten file's SURVIVING rows surface as adds
    val got = DeltaScan.scanChanges(spark, dir, 0L, ignoreChanges = true)
    assert(got.orderBy(col("n_nationkey")).select(col("n_nationkey"))
      .collect().map(_.getInt(0)).toSeq ==
      (0 until 25).filter(_ % 2 == 1))
  }
}
