package graft

import java.nio.file.{FileAlreadyExistsException, Files, Paths}

import scala.jdk.CollectionConverters._

import graft.sources.{DeltaScan, DeltaWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native transactional Delta writer: create/append round trips, atomic
  * commit conflicts, file-pruned (copy-on-write) MERGE and DELETE, the
  * checkpoint writer, and time travel over writer-produced versions.
  */
class DeltaWriteSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft_delta_write")
    Files.delete(d) // create() makes it; we only want the unique name
    d.toString
  }

  private lazy val nation =
    spark.read.parquet(s"$sf/nation.parquet").orderBy(col("n_nationkey"))

  test("create + append round-trip equals the source; versions travel") {
    val path = freshDir()
    DeltaWrite.create(spark, nation.filter(col("n_nationkey") < 12), path)
    val v1 = DeltaWrite.append(spark, nation.filter(col("n_nationkey") >= 12), path)
    assert(v1 == 1L)
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq ==
      nation.collect().toSeq)
    assert(DeltaScan.scan(spark, path, versionAsOf = Some(0L))
      .orderBy(col("n_nationkey")).collect().toSeq ==
      nation.filter(col("n_nationkey") < 12).collect().toSeq)
  }

  test("partitioned create: partition values land in the log and prune") {
    val path = freshDir()
    DeltaWrite.create(spark, nation, path, partitionBy = Seq("n_regionkey"))
    val snap = DeltaScan.snapshot(spark, path)
    assert(snap.partitionColumns == Seq("n_regionkey"))
    assert(snap.files.forall(_.partitionValues.contains("n_regionkey")))
    val pruned = DeltaScan.scan(spark, path,
      partitionPruner = pv => pv.get("n_regionkey").contains("2"))
    assert(pruned.orderBy(col("n_nationkey")).collect().toSeq ==
      nation.filter(col("n_regionkey") === 2)
        .select(pruned.columns.map(col).toSeq: _*).collect().toSeq)
  }

  test("concurrent commit: second writer of the same version loses loudly") {
    val path = freshDir()
    DeltaWrite.create(spark, nation.limit(5), path)
    val snapVersion = DeltaScan.snapshot(spark, path).version
    // adversary claims version snap+1 between our read and our commit
    Files.write(Paths.get(path, "_delta_log", f"${snapVersion + 1}%020d.json"),
      Seq("").asJava)
    intercept[FileAlreadyExistsException] {
      DeltaWrite.commit(Paths.get(path), snapVersion + 1, Seq(""))
    }
    // a retry against the refreshed snapshot (version snap+2) succeeds
    assert(DeltaWrite.append(spark, nation.limit(0), path) == snapVersion + 2)
  }

  test("merge rewrites only files containing matched keys") {
    val path = freshDir()
    val base = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    DeltaWrite.create(spark, base.filter(col("n_nationkey") < 12), path)
    DeltaWrite.append(spark, base.filter(col("n_nationkey") >= 12), path)
    val untouchedBefore = DeltaScan.snapshot(spark, path).files.map(_.path).toSet

    // updates touch only keys < 12 (the v0 file set) + one fresh insert
    val updates = base.filter(col("n_nationkey") < 5)
      .withColumn("n_name", concat(col("n_name"), lit("_X")))
      .unionAll(spark.createDataFrame(Seq((99, "NEWLAND", 1)))
        .toDF("n_nationkey", "n_name", "n_regionkey")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey")))
    DeltaWrite.merge(spark, path, updates, Seq("n_nationkey"))

    val after = DeltaScan.snapshot(spark, path).files.map(_.path).toSet
    // the >=12 file(s) survived the commit untouched
    val v1Files = untouchedBefore.filter(after.contains)
    assert(v1Files.nonEmpty, s"expected some untouched files, got $after")

    val got = DeltaScan.scan(spark, path).orderBy(col("n_nationkey"))
    val expected = graft.operators.MergeInto
      .upsert(base, updates, Seq("n_nationkey"))
      .orderBy(col("n_nationkey"))
    assert(got.collect().toSeq == expected.collect().toSeq)
  }

  test("merge on a PARTITIONED table keeps the layout and the log's values") {
    val path = freshDir()
    val base = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    DeltaWrite.create(spark, base, path, partitionBy = Seq("n_regionkey"))

    val updates = base.filter(col("n_nationkey") < 5)
      .withColumn("n_name", concat(col("n_name"), lit("_M")))
    DeltaWrite.merge(spark, path, updates, Seq("n_nationkey"))

    val snap = DeltaScan.snapshot(spark, path)
    assert(snap.partitionColumns == Seq("n_regionkey"))
    assert(snap.files.forall(_.partitionValues.get("n_regionkey").exists(_ != null)),
      "rewritten files must carry partition values in the log")
    val got = DeltaScan.scan(spark, path).orderBy(col("n_nationkey"))
    val expected = graft.operators.MergeInto
      .upsert(base, updates, Seq("n_nationkey"))
      .select(got.columns.map(col).toSeq: _*)
      .orderBy(col("n_nationkey"))
    assert(got.collect().toSeq == expected.collect().toSeq)
    // pruning still works after the merge commit
    val pruned = DeltaScan.scan(spark, path,
      partitionPruner = pv => pv.get("n_regionkey").contains("2"))
    assert(pruned.select(col("n_regionkey")).distinct().collect()
      .map(_.get(0).toString).toSeq == Seq("2"))
  }

  test("deleteWhere rewrites only touched files; null predicate rows survive") {
    val path = freshDir()
    DeltaWrite.create(spark, nation.filter(col("n_nationkey") < 12), path)
    DeltaWrite.append(spark, nation.filter(col("n_nationkey") >= 12), path)
    val before = DeltaScan.snapshot(spark, path).files.map(_.path).toSet

    DeltaWrite.deleteWhere(spark, path, col("n_nationkey") < 3)
    val after = DeltaScan.snapshot(spark, path).files.map(_.path).toSet
    assert(before.intersect(after).nonEmpty, "untouched file should survive")
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq ==
      nation.filter(col("n_nationkey") >= 3).collect().toSeq)

    // no matching rows → no new version
    val v = DeltaScan.snapshot(spark, path).version
    assert(DeltaWrite.deleteWhere(spark, path, col("n_nationkey") < 0) == v)
  }

  test("string partition values with spaces/'%'/'=' survive write, merge and delete") {
    import spark.implicits._
    val path = freshDir()
    // values that stress hive escaping AND the log's percent-encoding:
    // the on-disk dir for "a=b" is "k=a%3Db", whose literal '%' must
    // re-encode as %25 in the log and in input_file_name() URIs
    val base = Seq((1L, "a b", 10.0), (2L, "a=b", 20.0), (3L, "c%d", 30.0),
        (4L, "plain", 40.0), (5L, "a b", 50.0))
      .toDF("id", "k", "v")
    DeltaWrite.create(spark, base, path, partitionBy = Seq("k"))
    val snap0 = DeltaScan.snapshot(spark, path)
    assert(snap0.files.map(_.partitionValues("k")).toSet ==
      Set("a b", "a=b", "c%d", "plain"))
    assert(DeltaScan.scan(spark, path).orderBy(col("id")).collect().toSeq ==
      base.orderBy(col("id")).collect().toSeq)

    // merge touching only the "a=b" partition must remove its old file
    val updates = Seq((2L, "a=b", 99.0)).toDF("id", "k", "v")
    DeltaWrite.merge(spark, path, updates, Seq("id"))
    val afterMerge = DeltaScan.scan(spark, path).orderBy(col("id")).collect()
    assert(afterMerge.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      Seq((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0), (5L, 50.0)),
      s"merge corrupted rows: ${afterMerge.toSeq}")

    // delete inside the "a b" partition: exactly one row goes
    DeltaWrite.deleteWhere(spark, path, col("id") === 5L)
    assert(DeltaScan.scan(spark, path).count() == 4)
    // per-file sizes are real (carried into snapshots for the checkpoint)
    assert(DeltaScan.snapshot(spark, path).files.forall(_.size > 100L))
  }

  test("timestamp time travel resolves to the last commit at or before the pin") {
    val path = freshDir()
    DeltaWrite.create(spark, nation.filter(col("n_nationkey") < 12), path)
    DeltaWrite.append(spark, nation.filter(col("n_nationkey") >= 12), path)
    // pin the commit times deterministically: rewrite v0's commitInfo to
    // sit 10s before v1's (wall-clock commits can share a millisecond)
    val logDir = Paths.get(path, "_delta_log")
    def readTs(v: Long): Long = {
      import org.json4s._
      implicit val fmts: Formats = DefaultFormats
      Files.readAllLines(logDir.resolve(f"$v%020d.json")).asScala
        .flatMap(l => (org.json4s.jackson.JsonMethods.parse(l) \ "commitInfo" \ "timestamp")
          .extractOpt[Long]).head
    }
    val t1 = readTs(1L)
    val v0File = logDir.resolve(f"${0L}%020d.json")
    val rewritten = Files.readAllLines(v0File).asScala.map(
      _.replaceFirst("\"timestamp\":\\d+", s""""timestamp":${t1 - 10000}"""))
    Files.write(v0File, rewritten.asJava)

    val atV0 = DeltaScan.scan(spark, path, timestampAsOf = Some(t1 - 5000))
    assert(atV0.orderBy(col("n_nationkey")).collect().toSeq ==
      nation.filter(col("n_nationkey") < 12).collect().toSeq)
    val atV1 = DeltaScan.scan(spark, path, timestampAsOf = Some(t1))
    assert(atV1.count() == nation.count())
    intercept[IllegalArgumentException] {
      DeltaScan.snapshot(spark, path, timestampAsOf = Some(t1 - 20000))
    }
    intercept[IllegalArgumentException] {
      DeltaScan.snapshot(spark, path, versionAsOf = Some(0L),
        timestampAsOf = Some(t1))
    }
  }

  test("timestamp time travel resolves against a checkpoint-only (truncated) log") {
    val path = freshDir()
    DeltaWrite.create(spark, nation.filter(col("n_nationkey") < 12), path)
    DeltaWrite.append(spark, nation.filter(col("n_nationkey") >= 12), path)
    DeltaWrite.checkpoint(spark, path)
    val logDir = Paths.get(path, "_delta_log")
    Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
      .toSeq.foreach(Files.delete)
    // a pin after the checkpoint's mtime resolves to the checkpointed state
    val got = DeltaScan.scan(spark, path,
      timestampAsOf = Some(System.currentTimeMillis() + 60000))
    assert(got.count() == nation.count())
    // a pin before anything surviving fails with the versioned diagnostic
    val e = intercept[IllegalArgumentException] {
      DeltaScan.snapshot(spark, path, timestampAsOf = Some(1000L))
    }
    assert(e.getMessage.contains("earliest surviving version is v1"), e.getMessage)
  }

  test("randomized op sequence: every committed version equals the DataFrame fold") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val path = freshDir()
    val rnd = new scala.util.Random(42)
    def mkRows(n: Int, keyLo: Long): DataFrame =
      (0 until n).map(i => (keyLo + i, rnd.nextInt(100).toLong)).toDF("k", "v")

    var expected: DataFrame = mkRows(20, 0)
    DeltaWrite.create(spark, expected, path)
    def rows(df: DataFrame): Seq[String] =
      df.orderBy(col("k"), col("v")).collect().map(_.toString).toSeq
    val byVersion = scala.collection.mutable.Map[Long, Seq[String]](0L -> rows(expected))

    for (step <- 1 to 6) {
      val vBefore = DeltaScan.snapshot(spark, path).version
      rnd.nextInt(3) match {
        case 0 =>
          val df = mkRows(5, 1000L * step)
          DeltaWrite.append(spark, df, path)
          expected = expected.unionAll(df)
        case 1 =>
          // keys straddle the existing range: both updates and inserts
          val ups = mkRows(8, rnd.nextInt(25).toLong)
          DeltaWrite.merge(spark, path, ups, Seq("k"))
          expected = graft.operators.MergeInto.upsert(expected, ups, Seq("k"))
        case 2 =>
          val thr = rnd.nextInt(40).toLong
          DeltaWrite.deleteWhere(spark, path, col("v") < thr)
          expected = expected.filter(col("v") >= thr)
      }
      val vAfter = DeltaScan.snapshot(spark, path).version
      assert(vAfter == vBefore || vAfter == vBefore + 1)
      byVersion(vAfter) = rows(expected)
      assert(rows(DeltaScan.scan(spark, path)) == byVersion(vAfter),
        s"step $step: snapshot diverged from the fold")
    }
    // version time travel reproduces every recorded fold state
    byVersion.foreach { case (v, exp) =>
      assert(rows(DeltaScan.scan(spark, path, versionAsOf = Some(v))) == exp,
        s"versionAsOf=$v diverged")
    }
  }

  test("append/merge enforce the declared schema: compatible types cast, incompatible fail fast") {
    import spark.implicits._
    val path = freshDir()
    DeltaWrite.create(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path) // k: long, v: string
    // int k casts up to the declared long; column order differs — both fine
    DeltaWrite.append(spark, Seq(("c", 3)).toDF("v", "k"), path)
    val got = DeltaScan.scan(spark, path).orderBy(col("k")).collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // array where the table declares long: must fail AT WRITE TIME, not
    // poison the table for later scans
    val bad = Seq((Seq(1L), "x")).toDF("k", "v")
    intercept[IllegalArgumentException] { DeltaWrite.append(spark, bad, path) }
    intercept[IllegalArgumentException] { DeltaWrite.merge(spark, path, bad, Seq("k")) }
    // a missing declared column also fails fast
    intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq(4L).toDF("k"), path)
    }
    // the failed writes committed nothing
    assert(DeltaScan.snapshot(spark, path).version == 1L)
  }

  test("corrupt _last_checkpoint: scan falls back to checkpoint discovery") {
    val path = freshDir()
    DeltaWrite.create(spark, nation.filter(col("n_nationkey") < 12), path)
    DeltaWrite.append(spark, nation.filter(col("n_nationkey") >= 12), path)
    DeltaWrite.checkpoint(spark, path)
    val logDir = Paths.get(path, "_delta_log")
    // truncate the log so ONLY the checkpoint can serve the snapshot,
    // then corrupt the pointer the way a non-atomic writer would
    Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
      .toSeq.foreach(Files.delete)
    Files.write(logDir.resolve("_last_checkpoint"), "".getBytes)
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq ==
      nation.collect().toSeq)
    Files.write(logDir.resolve("_last_checkpoint"), "{\"vers".getBytes) // partial JSON
    assert(DeltaScan.scan(spark, path).count() == nation.count())
  }

  test("staging temp dirs are cleaned up after write and checkpoint") {
    val path = freshDir()
    val tmpRoot = Paths.get(System.getProperty("java.io.tmpdir"))
    def staged(): Set[String] = {
      val l = Files.list(tmpRoot)
      try l.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("graft_delta_stage") || n.startsWith("graft_delta_cp"))
        .toSet
      finally l.close()
    }
    val before = staged()
    DeltaWrite.create(spark, nation, path)
    DeltaWrite.append(spark, nation.limit(3), path)
    DeltaWrite.deleteWhere(spark, path, col("n_nationkey") < 2)
    DeltaWrite.checkpoint(spark, path)
    assert(staged() == before, "delta staging dirs leaked under /tmp")
  }

  test("checkpoint: log truncation before the checkpoint still reads") {
    val path = freshDir()
    DeltaWrite.create(spark, nation.filter(col("n_nationkey") < 12), path)
    DeltaWrite.append(spark, nation.filter(col("n_nationkey") >= 12), path)
    val cpv = DeltaWrite.checkpoint(spark, path)
    assert(cpv == 1L)
    // truncate: delete all JSON commits at or before the checkpoint
    val logDir = Paths.get(path, "_delta_log")
    Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
      .toSeq.foreach(Files.delete)
    DeltaWrite.append(spark, nation.limit(0), path) // v2 on top of the checkpoint
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq ==
      nation.collect().toSeq)
  }

  private def truncateJsonLog(path: String): Unit = {
    val logDir = Paths.get(path, "_delta_log")
    Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
      .toSeq.foreach(Files.delete)
  }

  test("column-mapped table: writes stage physical files, reads stay logical") {
    val path = graft.sources.DeltaFixture.nationWithColumnMapping(spark, sf)
    val plain = spark.read.parquet(s"$sf/nation.parquet")

    // MERGE by logical key: uppercase names for a key band
    val updates = plain
      .filter(col("n_nationkey") >= 10 && col("n_nationkey") < 20)
      .withColumn("n_name", upper(col("n_name")))
    DeltaWrite.merge(spark, path, updates, Seq("n_nationkey"))
    // DELETE by a logical non-partition predicate
    DeltaWrite.deleteWhere(spark, path, col("n_nationkey") % 3 === 0)

    val expected = plain
      .withColumn("n_name",
        when(col("n_nationkey") >= 10 && col("n_nationkey") < 20,
          upper(col("n_name"))).otherwise(col("n_name")))
      .filter(!(col("n_nationkey") % 3 === 0))
      .orderBy(col("n_nationkey"))
    val got = DeltaScan.scan(spark, path).orderBy(col("n_nationkey"))
    assert(got.columns.toSeq == plain.columns.toSeq) // logical names surface
    assert(got.collect().toSeq ==
      expected.select(got.columns.map(col).toSeq: _*).collect().toSeq)

    val snap = DeltaScan.snapshot(spark, path)
    // every add action is keyed by the PHYSICAL partition column name
    assert(snap.files.forall(_.partitionValues.keySet == Set("pn-regionkey")))
    // and the staged data files carry PHYSICAL column names on disk
    val newest = snap.files.map(f => s"$path/${f.path}")
      .find(_.contains("part-")).getOrElse(fail("no staged file"))
    val onDisk = spark.read.parquet(newest).schema.fieldNames.toSet
    assert(onDisk.forall(_.startsWith("pn-")), s"physical names expected, got $onDisk")
  }

  test("checkpoint fidelity: configuration and protocol survive truncation (column mapping)") {
    val path = graft.sources.DeltaFixture.nationWithColumnMapping(spark, sf)
    DeltaWrite.checkpoint(spark, path)
    truncateJsonLog(path)
    val snap = DeltaScan.snapshot(spark, path)
    assert(snap.columnMappingMode == "name") // configuration survived
    assert(snap.protocol == DeltaScan.Protocol(2, 5)) // not downgraded to 1/2
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq ==
      nation.collect().toSeq)
  }

  test("checkpoint fidelity: deletion vectors survive truncation") {
    val path = graft.sources.DeltaFixture.nationWithDv(spark, sf)
    val before = DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq
    DeltaWrite.checkpoint(spark, path)
    truncateJsonLog(path)
    val snap = DeltaScan.snapshot(spark, path)
    assert(snap.protocol ==
      DeltaScan.Protocol(3, 7, Seq("deletionVectors"), Seq("deletionVectors")))
    assert(snap.files.exists(_.dv.nonEmpty), "DV descriptors dropped by checkpoint")
    // deleted rows must NOT resurrect once only the checkpoint remains
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq ==
      before)
  }

  test("optimize bin-packs small files; dataChange=false; old versions still travel") {
    val path = freshDir()
    // five commits of a few rows each → at least five small files
    DeltaWrite.create(spark, nation.filter(col("n_nationkey") < 5), path)
    (1 to 4).foreach { i =>
      DeltaWrite.append(spark,
        nation.filter(col("n_nationkey") >= i * 5 && col("n_nationkey") < (i + 1) * 5), path)
    }
    val before = DeltaScan.snapshot(spark, path)
    assert(before.files.size >= 5)
    val expected = DeltaScan.scanSnapshot(spark, before)
      .orderBy(col("n_nationkey")).collect().toSeq

    val v = DeltaWrite.optimize(spark, path)
    assert(v == before.version + 1)
    val after = DeltaScan.snapshot(spark, path)
    assert(after.files.size < before.files.size,
      s"optimize must shrink the file count: ${before.files.size} -> ${after.files.size}")
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq
      == expected)

    // the OPTIMIZE commit's actions all carry dataChange=false
    val log = Files.readAllLines(
      Paths.get(path, "_delta_log", f"$v%020d.json")).asScala.mkString("\n")
    assert(log.contains("OPTIMIZE"))
    assert(!log.contains("\"dataChange\":true"))

    // replaced files remain on disk until vacuum: pre-optimize versions travel
    assert(DeltaScan.scan(spark, path, versionAsOf = Some(before.version))
      .orderBy(col("n_nationkey")).collect().toSeq == expected)

    // idempotent: a second optimize over one big file is a no-op version
    assert(DeltaWrite.optimize(spark, path) == v)
  }

  test("optimize on a partitioned table compacts per partition and keeps pruning") {
    val path = freshDir()
    val base = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    DeltaWrite.create(spark, base.filter(col("n_nationkey") < 12), path,
      partitionBy = Seq("n_regionkey"))
    DeltaWrite.append(spark, base.filter(col("n_nationkey") >= 12), path)
    val before = DeltaScan.snapshot(spark, path)

    DeltaWrite.optimize(spark, path)
    val after = DeltaScan.snapshot(spark, path)
    assert(after.files.size < before.files.size)
    // one file per partition value after compaction
    assert(after.files.groupBy(_.partitionValues).values.forall(_.size == 1))
    assert(after.files.forall(_.partitionValues.get("n_regionkey").exists(_ != null)))
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq ==
      base.orderBy(col("n_nationkey")).collect().toSeq)
    val pruned = DeltaScan.scan(spark, path,
      partitionPruner = pv => pv.get("n_regionkey").contains("2"))
    assert(pruned.select(col("n_regionkey")).distinct().collect()
      .map(_.get(0).toString).toSeq == Seq("2"))
  }

  test("optimize purges deletion vectors; deleted rows stay deleted") {
    val path = graft.sources.DeltaFixture.nationWithDv(spark, sf)
    val expected = DeltaScan.scan(spark, path)
      .orderBy(col("n_nationkey")).collect().toSeq
    assert(DeltaScan.snapshot(spark, path).files.exists(_.dv.isDefined))

    DeltaWrite.optimize(spark, path)
    val after = DeltaScan.snapshot(spark, path)
    assert(after.files.forall(_.dv.isEmpty), "optimize must materialize DVs away")
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq
      == expected)
  }

  test("optimize is allowed on appendOnly tables (no logical change)") {
    val path = freshDir()
    DeltaWrite.create(spark, nation.filter(col("n_nationkey") < 10), path)
    DeltaWrite.append(spark, nation.filter(col("n_nationkey") >= 10), path)
    graft.sources.DeltaFixture.setTableConfig(spark, path,
      Map("delta.appendOnly" -> "true"))
    val before = DeltaScan.snapshot(spark, path)
    DeltaWrite.optimize(spark, path)
    assert(DeltaScan.snapshot(spark, path).files.size < before.files.size)
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq ==
      nation.collect().toSeq)
  }

  test("vacuum reclaims unreferenced files past retention, never live ones") {
    val path = freshDir()
    DeltaWrite.create(spark, nation.filter(col("n_nationkey") < 12), path)
    DeltaWrite.append(spark, nation.filter(col("n_nationkey") >= 12), path)
    val preOpt = DeltaScan.snapshot(spark, path)
    DeltaWrite.optimize(spark, path)
    // an OCC loser's orphan: staged data no log version references
    Files.write(Paths.get(path, "orphan-loser.parquet"), Array[Byte](1, 2, 3))

    // inside the retention window nothing is reclaimed
    assert(DeltaWrite.vacuum(spark, path) == 0)
    assert(DeltaScan.scan(spark, path, versionAsOf = Some(preOpt.version))
      .count() == nation.count())

    // retention 0: replaced files + the orphan go; the live set survives
    val removed = DeltaWrite.vacuum(spark, path, retentionMillis = 0L)
    assert(removed == preOpt.files.size + 1,
      s"expected ${preOpt.files.size} replaced files + 1 orphan, got $removed")
    assert(!Files.exists(Paths.get(path, "orphan-loser.parquet")))
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq ==
      nation.collect().toSeq)
    // time travel to the reclaimed version now fails (documented contract)
    intercept[Exception] {
      DeltaScan.scan(spark, path, versionAsOf = Some(preOpt.version)).collect()
    }
  }

  test("vacuum on a partitioned table prunes emptied partition dirs, spares DV sidecars") {
    val path = graft.sources.DeltaFixture.nationWithDv(spark, sf)
    val expected = DeltaScan.scan(spark, path)
      .orderBy(col("n_nationkey")).collect().toSeq
    // nothing is unreferenced yet: vacuum(0) must delete nothing and the
    // DV sidecar (.bin) must never be a candidate
    assert(DeltaWrite.vacuum(spark, path, retentionMillis = 0L) == 0)
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq
      == expected)

    val path2 = freshDir()
    val base = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    DeltaWrite.create(spark, base, path2, partitionBy = Seq("n_regionkey"))
    // delete one whole region, then reclaim: its directory empties out
    DeltaWrite.deleteWhere(spark, path2, col("n_regionkey") === 2)
    assert(DeltaWrite.vacuum(spark, path2, retentionMillis = 0L) >= 1)
    assert(!Files.exists(Paths.get(path2, "n_regionkey=2")),
      "emptied partition dir should be pruned")
    assert(DeltaScan.scan(spark, path2).orderBy(col("n_nationkey")).collect().toSeq ==
      base.filter(col("n_regionkey") =!= 2).orderBy(col("n_nationkey")).collect().toSeq)
  }

  test("update rewrites only touched files; SET casts to the declared type") {
    val path = freshDir()
    val base = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    DeltaWrite.create(spark, base.filter(col("n_nationkey") < 12), path)  // file A
    DeltaWrite.append(spark, base.filter(col("n_nationkey") >= 12), path) // file B
    val before = DeltaScan.snapshot(spark, path)

    // predicate hits only file B's key range: file A must survive as-is
    val v = DeltaWrite.update(spark, path,
      Map("n_name" -> lower(col("n_name"))), col("n_nationkey") >= 20)
    assert(v == before.version + 1)
    val after = DeltaScan.snapshot(spark, path)
    assert((before.files.map(_.path).toSet & after.files.map(_.path).toSet).size == 1,
      "exactly one file (the untouched one) must survive the rewrite")
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey"))
      .select(col("n_nationkey"), col("n_name")).collect().toSeq ==
      base.orderBy(col("n_nationkey"))
        .select(col("n_nationkey"),
          when(col("n_nationkey") >= 20, lower(col("n_name")))
            .otherwise(col("n_name")).as("n_name")).collect().toSeq)

    // SET value of a compatible-but-different type casts to the schema's
    val v2 = DeltaWrite.update(spark, path,
      Map("n_regionkey" -> lit(9L)), col("n_nationkey") === 0) // long -> int col
    assert(v2 == v + 1)
    val got = DeltaScan.scan(spark, path)
      .filter(col("n_nationkey") === 0).select(col("n_regionkey")).head()
    assert(got.getInt(0) == 9) // still read as INT — schema contract intact

    // guards: unknown column and partition-column SET refuse
    intercept[IllegalArgumentException](
      DeltaWrite.update(spark, path, Map("nope" -> lit(1)), lit(true)))
    val part = freshDir()
    DeltaWrite.create(spark, base, part, partitionBy = Seq("n_regionkey"))
    intercept[IllegalArgumentException](
      DeltaWrite.update(spark, part, Map("n_regionkey" -> lit(1)), lit(true)))
  }

  test("deleteWhereDv: no file rewrites, DV sidecars, protocol upgrade, merge") {
    val path = freshDir()
    val base = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    DeltaWrite.create(spark, base, path)                                    // v0
    val filesBefore = DeltaScan.snapshot(spark, path).files.map(_.path).toSet

    val v = DeltaWrite.deleteWhereDv(spark, path, col("n_nationkey") % 2 === 0)
    assert(v == 1L)
    val after = DeltaScan.snapshot(spark, path)
    // same data files, now carrying DVs — nothing was rewritten
    assert(after.files.map(_.path).toSet == filesBefore)
    assert(after.files.forall(_.dv.isDefined))
    assert(after.files.map(_.dv.get.cardinality).sum == 13) // 0,2,..,24
    // protocol upgraded to the feature form
    assert(after.protocol.minReader == 3 &&
      after.protocol.readerFeatures.contains("deletionVectors"))
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey"))
      .select(col("n_nationkey")).collect().map(_.getInt(0)).toSeq ==
      (0 until 25).filter(_ % 2 == 1))
    // pre-delete version still reads everything
    assert(DeltaScan.scan(spark, path, versionAsOf = Some(0L)).count() == 25)

    // a second DV delete MERGES into the existing vectors
    DeltaWrite.deleteWhereDv(spark, path, col("n_nationkey") % 3 === 0)
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey"))
      .select(col("n_nationkey")).collect().map(_.getInt(0)).toSeq ==
      (0 until 25).filter(k => k % 2 == 1 && k % 3 != 0))

    // optimize materializes the DVs away; content unchanged
    DeltaWrite.optimize(spark, path)
    assert(DeltaScan.snapshot(spark, path).files.forall(_.dv.isEmpty))
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey"))
      .select(col("n_nationkey")).collect().map(_.getInt(0)).toSeq ==
      (0 until 25).filter(k => k % 2 == 1 && k % 3 != 0))
  }

  test("mergeDv equals copy-on-write merge; base files survive with DVs") {
    val base = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val updates = base.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 30)
      .withColumn("n_name", upper(col("n_name")))
      .unionAll(spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row(99, "NEWLAND", 0))),
        base.schema))

    val cowPath = freshDir(); val dvPath = freshDir()
    DeltaWrite.create(spark, base, cowPath)
    DeltaWrite.create(spark, base, dvPath)
    DeltaWrite.merge(spark, cowPath, updates, Seq("n_nationkey"))
    val filesBefore = DeltaScan.snapshot(spark, dvPath).files.map(_.path).toSet
    DeltaWrite.mergeDv(spark, dvPath, updates, Seq("n_nationkey"))

    // identical results, different physical strategy
    assert(DeltaScan.scan(spark, dvPath).orderBy(col("n_nationkey")).collect().toSeq ==
      DeltaScan.scan(spark, cowPath).orderBy(col("n_nationkey")).collect().toSeq)
    val after = DeltaScan.snapshot(spark, dvPath)
    // every original base file survives (matched rows masked by DV, not
    // rewritten); update rows arrived as NEW files
    assert(filesBefore.subsetOf(after.files.map(_.path).toSet))
    assert(after.files.exists(f => filesBefore.contains(f.path) && f.dv.isDefined))
    assert(after.files.exists(f => !filesBefore.contains(f.path)))
    // matched old versions are exactly the DV'd positions
    assert(after.files.flatMap(_.dv).map(_.cardinality).sum == 15) // keys 10..24 exist

    // pure-insert merge (no matches): no DVs written, still correct
    val v = DeltaWrite.mergeDv(spark, dvPath,
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row(100, "ATLANTIS", 1))),
        base.schema), Seq("n_nationkey"))
    assert(v == after.version + 1)
    assert(DeltaScan.scan(spark, dvPath).count() == 27) // 25 + 99 + 100
  }

  test("deleteWhereDv on a partitioned table touches only matching partitions") {
    val path = freshDir()
    val base = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    DeltaWrite.create(spark, base, path, partitionBy = Seq("n_regionkey"))
    DeltaWrite.deleteWhereDv(spark, path,
      col("n_regionkey") === 2 && col("n_nationkey") % 2 === 0)
    val after = DeltaScan.snapshot(spark, path)
    // only region-2 files carry DVs
    assert(after.files.filter(_.dv.isDefined)
      .forall(_.partitionValues.get("n_regionkey").contains("2")))
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq ==
      base.filter(!(col("n_regionkey") === 2 && col("n_nationkey") % 2 === 0))
        .orderBy(col("n_nationkey")).collect().toSeq)
    // no-match predicate is a no-op version
    val vNow = DeltaScan.snapshot(spark, path).version
    assert(DeltaWrite.deleteWhereDv(spark, path, col("n_nationkey") > 999) == vNow)
  }

  test("delta.checkpointInterval auto-checkpoints every N commits") {
    val path = freshDir()
    DeltaWrite.create(spark, nation.filter(col("n_nationkey") < 5), path)   // v0
    graft.sources.DeltaFixture.setTableConfig(spark, path,
      Map("delta.checkpointInterval" -> "2"))                               // v1
    DeltaWrite.append(spark,
      nation.filter(col("n_nationkey") >= 5 && col("n_nationkey") < 10), path) // v2
    def cp(v: Long) = Paths.get(path, "_delta_log", f"$v%020d.checkpoint.parquet")
    assert(Files.exists(cp(2)), "v2 hits the interval: checkpoint expected")
    assert(Files.readAllLines(Paths.get(path, "_delta_log", "_last_checkpoint"))
      .asScala.mkString.contains("\"version\":2"))

    DeltaWrite.append(spark,
      nation.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 15), path) // v3
    assert(!Files.exists(cp(3)), "v3 is off-interval: no checkpoint")
    DeltaWrite.append(spark, nation.filter(col("n_nationkey") >= 15), path) // v4
    assert(Files.exists(cp(4)))

    // the auto-checkpoint carries full fidelity: truncate every JSON
    // commit it superseded and the snapshot still reconstructs exactly
    (0L to 3L).foreach(v =>
      Files.delete(Paths.get(path, "_delta_log", f"$v%020d.json")))
    assert(DeltaScan.scan(spark, path).orderBy(col("n_nationkey")).collect().toSeq ==
      nation.collect().toSeq)
  }

  test("writer protocol guards: appendOnly and unknown writerFeatures refuse") {
    val path = freshDir()
    DeltaWrite.create(spark, nation, path)
    graft.sources.DeltaFixture.setTableConfig(spark, path,
      Map("delta.appendOnly" -> "true"))
    // appends still fine; removes forbidden
    DeltaWrite.append(spark, nation.limit(1), path)
    val e = intercept[UnsupportedOperationException](
      DeltaWrite.deleteWhere(spark, path, col("n_nationkey") === 0))
    assert(e.getMessage.contains("appendOnly"))

    val path2 = freshDir()
    DeltaWrite.create(spark, nation, path2)
    Files.write(Paths.get(path2, "_delta_log", f"${1L}%020d.json"),
      java.util.Arrays.asList(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
          """"writerFeatures":["generatedColumns"]}}"""))
    val e2 = intercept[UnsupportedOperationException](
      DeltaWrite.append(spark, nation.limit(1), path2))
    assert(e2.getMessage.contains("generatedColumns"))
    // the table remains READABLE — only the write path refuses
    assert(DeltaScan.scan(spark, path2).count() == nation.count())

    // legacy minWriter=4 (pre-feature-list) with an ACTUAL generated
    // column in the schema: the version alone passes, the schema evidence
    // refuses — rows this writer doesn't compute would break the contract
    val path3 = freshDir()
    DeltaWrite.create(spark, nation.select(col("n_nationkey")), path3)
    val genSchema = new org.apache.spark.sql.types.StructType()
      .add("n_nationkey", org.apache.spark.sql.types.IntegerType)
      .add("gen", org.apache.spark.sql.types.IntegerType, nullable = true,
        org.apache.spark.sql.types.Metadata.fromJson(
          """{"delta.generationExpression":"n_nationkey + 1"}"""))
    Files.write(Paths.get(path3, "_delta_log", f"${1L}%020d.json"),
      java.util.Arrays.asList(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
        s"""{"metaData":{"id":"t3","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${org.json4s.jackson.JsonMethods.compact(
            org.json4s.jackson.JsonMethods.render(
              org.json4s.JsonDSL.string2jvalue(genSchema.json)))},""" +
          s""""partitionColumns":[],"configuration":{}}}"""))
    val e3 = intercept[UnsupportedOperationException](
      DeltaWrite.append(spark, nation.select(col("n_nationkey")).limit(1), path3))
    assert(e3.getMessage.contains("generated columns"))
  }

  test("removes carry the DV uniqueId; (path, dv)-keyed replay") {
    // the spec reconciles file actions on (path, deletionVector.uniqueId):
    // a remove tombstoning a DV-carrying add must repeat the descriptor
    val path = freshDir()
    DeltaWrite.create(spark,                       // single file: both DV
      nation.select(col("n_nationkey"), col("n_name")).coalesce(1), path) // deletes hit it
    DeltaWrite.deleteWhereDv(spark, path, col("n_nationkey") === 0) // v1: add(f, dv1)
    DeltaWrite.deleteWhereDv(spark, path, col("n_nationkey") === 2) // v2: rm(f,dv1)+add(f,dv2)

    val v2 = Files.readAllLines(Paths.get(path, "_delta_log", f"${2L}%020d.json"))
      .asScala.mkString("\n")
    // the v2 remove must repeat v1's descriptor, not be a bare remove(path)
    assert(v2.contains("\"remove\"") &&
      v2.split("\n").exists(l => l.contains("\"remove\"") && l.contains("deletionVector")),
      s"v2 remove is missing its deletionVector descriptor:\n$v2")
    assert(DeltaScan.scan(spark, path).count() == 23)

    // externally-shaped commit: remove(f, dvNow) AFTER add(f, dvNew) in one
    // commit — a path-keyed replay would drop the live add; the spec key
    // keeps it. Reuse v2's own actions reordered as v3.
    val snap = DeltaScan.snapshot(spark, path)
    val f = snap.files.head
    val addLn = v2.split("\n").find(l => l.contains("\"add\"")).get
    val rmNew = v2.split("\n").find(l => l.contains("\"remove\"")).get
    Files.write(Paths.get(path, "_delta_log", f"${3L}%020d.json"),
      java.util.Arrays.asList(addLn, rmNew)) // add(f,dv2) then remove(f,dv1)
    val snap3 = DeltaScan.snapshot(spark, path)
    assert(snap3.files.map(_.path).toSet == snap.files.map(_.path).toSet)
    assert(DeltaScan.scan(spark, path).count() == 23)
    assert(snap3.files.find(_.path == f.path).get.dv == f.dv)

    // corrupt shape — two live adds for one path (stale dv never removed)
    // must fail loudly, not double-read. Drop the descriptor via a JSON
    // transform, NOT a regex: the sidecar name is a z85-encoded random
    // UUID whose alphabet includes '}', which breaks brace matching.
    val addBare = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val parsed = JsonMethods.parse(addLn).transformField {
        case ("add", JObject(fields)) =>
          ("add", JObject(fields.filterNot(_._1 == "deletionVector")))
      }
      JsonMethods.compact(JsonMethods.render(parsed))
    }
    Files.write(Paths.get(path, "_delta_log", f"${4L}%020d.json"),
      java.util.Arrays.asList(addBare))
    val e = intercept[IllegalArgumentException](DeltaScan.snapshot(spark, path))
    assert(e.getMessage.contains("multiple live add actions"))
  }

  test("mergeSchema append evolves the schema; old files read null; v0 stays narrow") {
    import spark.implicits._
    val path = freshDir()
    DeltaWrite.create(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    // an undeclared column WITHOUT mergeSchema is a loud error, not a drop
    intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((3L, "c", 30)).toDF("k", "v", "x"), path)
    }
    val v1 = DeltaWrite.append(spark,
      Seq((3L, "c", 30), (4L, "d", 40)).toDF("k", "v", "x"), path,
      mergeSchema = true)
    assert(v1 == 1L)
    val full = DeltaScan.scan(spark, path).orderBy(col("k"))
    assert(full.columns.toSeq == Seq("k", "v", "x"))
    assert(full.schema("x").nullable)
    assert(full.collect().map(r =>
        (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2))).toSeq ==
      Seq((1L, "a", -1), (2L, "b", -1), (3L, "c", 30), (4L, "d", 40)))
    // time travel BELOW the evolution: v0's own metaData governs
    val v0 = DeltaScan.scan(spark, path, versionAsOf = Some(0L))
    assert(v0.columns.toSeq == Seq("k", "v"))
    assert(v0.count() == 2)
    // same-named column keeps the DECLARED type: int input upcasts, an
    // incompatible one still fails
    DeltaWrite.append(spark, Seq((5, "e", 50)).toDF("k", "v", "x"), path,
      mergeSchema = true) // int k → declared long; no new columns → no metaData
    assert(DeltaScan.snapshot(spark, path).schema.fieldNames.toSeq ==
      Seq("k", "v", "x"))
  }

  test("addColumn commits metaData only; existing rows read null for it") {
    import spark.implicits._
    val path = freshDir()
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("k", "v"), path)
    val before = DeltaScan.snapshot(spark, path).files.map(_.path).toSet
    val v = DeltaWrite.addColumn(spark, path, "score",
      org.apache.spark.sql.types.DoubleType)
    assert(v == 1L)
    val snap = DeltaScan.snapshot(spark, path)
    assert(snap.schema.fieldNames.toSeq == Seq("k", "v", "score"))
    assert(snap.files.map(_.path).toSet == before) // no data files written
    val got = DeltaScan.scan(spark, path).collect()
    assert(got.head.isNullAt(2))
    intercept[IllegalArgumentException] {
      DeltaWrite.addColumn(spark, path, "v",
        org.apache.spark.sql.types.StringType) // duplicate name refuses
    }
  }

  test("mergeSchema on a column-mapped table mints ids and physical names") {
    val path = graft.sources.DeltaFixture.nationWithColumnMapping(spark, sf)
    // real delta-spark CM tables always carry maxColumnId; the fixture
    // predates evolution — declare it (ids 1..3 are taken)
    graft.sources.DeltaFixture.setTableConfig(spark, path,
      Map("delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "3"))
    val plain = spark.read.parquet(s"$sf/nation.parquet")
    val extra = plain.filter(col("n_nationkey") < 3)
      .withColumn("n_flag", col("n_nationkey") * 10)
    DeltaWrite.append(spark, extra, path, mergeSchema = true)
    val snap = DeltaScan.snapshot(spark, path)
    val f = snap.schema("n_flag")
    assert(f.metadata.getLong("delta.columnMapping.id") == 4L)
    val pn = f.metadata.getString("delta.columnMapping.physicalName")
    assert(pn.startsWith("col-"))
    assert(snap.configuration("delta.columnMapping.maxColumnId") == "4")
    // staged file carries the minted physical name; reads stay logical
    val got = DeltaScan.scan(spark, path)
    assert(got.columns.toSeq == plain.columns.toSeq :+ "n_flag")
    assert(got.filter(col("n_nationkey") === 1 && col("n_flag") === 10).count() >= 1)
    // pre-evolution rows read null for the evolved column
    assert(got.filter(col("n_flag").isNull).count() == 25)
  }

  test("metaData.id stays stable across evolution, addColumn and checkpoints") {
    import spark.implicits._
    val path = freshDir()
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("k", "v"), path)
    val id0 = DeltaScan.snapshot(spark, path).tableId
    assert(id0.nonEmpty, "create must mint a metaData.id")
    // schema-evolution append rewrites metaData — same id
    DeltaWrite.append(spark, Seq((2L, "b", 20)).toDF("k", "v", "x"), path,
      mergeSchema = true)
    assert(DeltaScan.snapshot(spark, path).tableId == id0)
    // ADD COLUMN rewrites metaData — same id
    DeltaWrite.addColumn(spark, path, "score",
      org.apache.spark.sql.types.DoubleType)
    assert(DeltaScan.snapshot(spark, path).tableId == id0)
    // checkpoint re-emits metaData; a checkpoint-served snapshot (log
    // truncated below it) must still carry the original id
    DeltaWrite.checkpoint(spark, path)
    val logDir = Paths.get(path, "_delta_log")
    (0L to 2L).foreach(v => Files.deleteIfExists(logDir.resolve(f"$v%020d.json")))
    assert(DeltaScan.snapshot(spark, path).tableId == id0)
  }

  test("append with case-differing column aligns to the declared column") {
    import spark.implicits._
    val path = freshDir()
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("k", "name"), path)
    // NAME differs only in case: under Spark's default case-insensitive
    // resolution this is the declared column, not a new one — with or
    // without mergeSchema
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("K", "NAME"), path)
    DeltaWrite.append(spark, Seq((3L, "c")).toDF("k", "Name"), path,
      mergeSchema = true)
    val snap = DeltaScan.snapshot(spark, path)
    assert(snap.schema.fieldNames.toSeq == Seq("k", "name"),
      "case-differing input must not evolve a duplicate-modulo-case column")
    assert(DeltaScan.scan(spark, path).orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // a duplicate-modulo-case column is refused on ADD COLUMN too
    intercept[IllegalArgumentException] {
      DeltaWrite.addColumn(spark, path, "NAME",
        org.apache.spark.sql.types.StringType)
    }
  }
}
