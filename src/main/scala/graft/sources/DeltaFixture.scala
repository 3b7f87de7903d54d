package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic Delta-table fixture writer (dev/test only — the engine's
  * product surface is the READER in [[DeltaScan]]). Emits the public log
  * format by hand: one parquet data file per commit plus the
  * `_delta_log/<v>.json` action lines, so the reader is exercised against
  * a table whose bytes this repo fully controls (no delta-spark needed).
  */
object DeltaFixture {

  private def writeOneParquet(df: DataFrame, tableDir: Path, fileName: String): Unit = {
    val tmp = Files.createTempDirectory("graft_delta_part").resolve("out")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error(s"no parquet written under $tmp"))
    Files.createDirectories(tableDir.resolve(Paths.get(fileName)).getParent match {
      case null => tableDir
      case p => p
    })
    Files.move(part, tableDir.resolve(fileName))
  }

  private def commit(tableDir: Path, version: Long, lines: Seq[String]): Unit = {
    val logDir = tableDir.resolve("_delta_log")
    Files.createDirectories(logDir)
    Files.write(logDir.resolve(f"$version%020d.json"), lines.asJava)
  }

  private def metaDataLine(df: DataFrame, partitionColumns: Seq[String]): String =
    JsonMethods.compact(JsonMethods.render(
      "metaData" -> (
        ("id" -> "graft-fixture") ~
        ("format" -> (("provider" -> "parquet") ~ ("options" -> Map.empty[String, String]))) ~
        ("schemaString" -> df.schema.json) ~
        ("partitionColumns" -> partitionColumns) ~
        ("configuration" -> Map.empty[String, String]))))

  private def protocolLine: String =
    JsonMethods.compact(JsonMethods.render(
      "protocol" -> (("minReaderVersion" -> 1) ~ ("minWriterVersion" -> 2))))

  private def addLine(file: String, pv: Map[String, String]): String =
    JsonMethods.compact(JsonMethods.render(
      "add" -> (("path" -> file) ~ ("partitionValues" -> pv) ~ ("size" -> 1L) ~
        ("modificationTime" -> 0L) ~ ("dataChange" -> true))))

  private def removeLine(file: String): String =
    JsonMethods.compact(JsonMethods.render(
      "remove" -> (("path" -> file) ~ ("deletionTimestamp" -> 0L) ~ ("dataChange" -> true))))

  /** Three-version unpartitioned table built from the sfDir `nation`:
    * v0 adds nationkeys < 20, v1 adds the rest, v2 compacts (removes both
    * and re-adds the full table as one file). Latest snapshot == the full
    * nation table (DuckDB-oracle-checkable); v0/v1 exercise time travel,
    * v2 exercises remove handling.
    */
  def nationTable(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_delta_nation")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val lo = nation.filter(col("n_nationkey") < 20).orderBy(col("n_nationkey"))
    val hi = nation.filter(col("n_nationkey") >= 20).orderBy(col("n_nationkey"))
    val full = nation.orderBy(col("n_nationkey"))

    writeOneParquet(lo, dir, "part-v0-lo.parquet")
    commit(dir, 0L, Seq(protocolLine, metaDataLine(nation, Nil),
      addLine("part-v0-lo.parquet", Map.empty)))

    writeOneParquet(hi, dir, "part-v1-hi.parquet")
    commit(dir, 1L, Seq(addLine("part-v1-hi.parquet", Map.empty)))

    writeOneParquet(full, dir, "part-v2-full.parquet")
    commit(dir, 2L, Seq(removeLine("part-v0-lo.parquet"),
      removeLine("part-v1-hi.parquet"), addLine("part-v2-full.parquet", Map.empty)))

    dir.toString
  }

  private def protocolV3DvLine: String =
    JsonMethods.compact(JsonMethods.render(
      "protocol" -> (("minReaderVersion" -> 3) ~ ("minWriterVersion" -> 7) ~
        ("readerFeatures" -> Seq("deletionVectors")) ~
        ("writerFeatures" -> Seq("deletionVectors")))))

  private def addDvLine(file: String, d: DeletionVectors.Descriptor): String =
    JsonMethods.compact(JsonMethods.render(
      "add" -> (("path" -> file) ~ ("partitionValues" -> Map.empty[String, String]) ~
        ("size" -> 1L) ~ ("modificationTime" -> 0L) ~ ("dataChange" -> false) ~
        ("deletionVector" -> (
          ("storageType" -> d.storageType) ~
          ("pathOrInlineDv" -> d.pathOrInlineDv) ~
          ("offset" -> d.offset) ~
          ("sizeInBytes" -> d.sizeInBytes) ~
          ("cardinality" -> d.cardinality))))))

  /** Protocol-v3 deletionVectors table from the sfDir `nation`:
    * v0 adds two sorted files (keys < 13 / ≥ 13); v1 re-adds both with
    * DVs — the low file's through a UUID SIDECAR (storageType `u`), the
    * high file's INLINE (storageType `i`) — deleting keys {1,5,9} and
    * {14,20} by physical row position. Files are written sorted with one
    * row group, so key k sits at row index k (low) / k-13 (high); the
    * snapshot is oracle-expressible as `n_nationkey NOT IN (…)`.
    */
  def nationWithDv(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_delta_dv")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val lo = nation.filter(col("n_nationkey") < 13).orderBy(col("n_nationkey"))
    val hi = nation.filter(col("n_nationkey") >= 13).orderBy(col("n_nationkey"))
    writeOneParquet(lo, dir, "part-dv-lo.parquet")
    writeOneParquet(hi, dir, "part-dv-hi.parquet")
    commit(dir, 0L, Seq(protocolV3DvLine, metaDataLine(nation, Nil),
      addLine("part-dv-lo.parquet", Map.empty),
      addLine("part-dv-hi.parquet", Map.empty)))

    val sidecar = DeletionVectors.writeSidecar(dir.toString,
      Array(1L, 5L, 9L), new java.util.UUID(0x67726166746e6f77L, 0x1122334455667788L))
    val inline = DeletionVectors.inlineDescriptor(Array(1L, 7L)) // keys 14, 20
    commit(dir, 1L, Seq(
      removeLine("part-dv-lo.parquet"),
      addDvLine("part-dv-lo.parquet", sidecar),
      removeLine("part-dv-hi.parquet"),
      addDvLine("part-dv-hi.parquet", inline)))
    dir.toString
  }

  /** Column-mapping (mode `name`) table from the sfDir `nation`,
    * partitioned on `n_regionkey`: data files carry PHYSICAL column
    * names (`pn-…`, like delta-spark's `col-<uuid>`), the logical schema
    * carries `delta.columnMapping.{id,physicalName}` field metadata, and
    * `add.partitionValues` are keyed by the PHYSICAL partition-column
    * name — exactly the byte layout a delta-spark writer with
    * `delta.columnMapping.mode=name` produces (protocol 2/5). Latest
    * snapshot == the full nation table (DuckDB-oracle-checkable).
    */
  def nationWithColumnMapping(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{MetadataBuilder, StructType}
    val dir = Files.createTempDirectory("graft_delta_cm")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    // physical name = "pn-" + logical minus the n_ prefix (shaped like
    // delta-spark's col-<uuid>: no relation to the logical name needed)
    val phys: Map[String, String] = nation.schema.fieldNames
      .map(n => n -> s"pn-${n.stripPrefix("n_")}").toMap
    require(phys.contains("n_regionkey"), "fixture expects nation.n_regionkey")
    val logical = StructType(nation.schema.fields.zipWithIndex.map { case (f, i) =>
      f.copy(metadata = new MetadataBuilder()
        .putLong("delta.columnMapping.id", i + 1L)
        .putString("delta.columnMapping.physicalName", phys(f.name)).build())
    })
    val metaLine = JsonMethods.compact(JsonMethods.render(
      "metaData" -> (
        ("id" -> "graft-fixture-cm") ~
        ("format" -> (("provider" -> "parquet") ~ ("options" -> Map.empty[String, String]))) ~
        ("schemaString" -> logical.json) ~
        ("partitionColumns" -> Seq("n_regionkey")) ~
        ("configuration" -> Map("delta.columnMapping.mode" -> "name")))))
    val protoLine = JsonMethods.compact(JsonMethods.render(
      "protocol" -> (("minReaderVersion" -> 2) ~ ("minWriterVersion" -> 5))))
    val regions = nation.select(col("n_regionkey")).distinct()
      .collect().map(_.get(0).toString).sorted
    val adds = regions.toSeq.map { r =>
      val slice = nation.filter(col("n_regionkey") === r.toInt)
        .orderBy(col("n_nationkey"))
        .select(nation.schema.fieldNames.filterNot(_ == "n_regionkey")
          .map(n => col(n).as(phys(n))).toSeq: _*)
      val fn = s"pn-regionkey=$r/part-cm-$r.parquet"
      writeOneParquet(slice, dir, fn)
      addLine(fn, Map(phys("n_regionkey") -> r))
    }
    commit(dir, 0L, Seq(protoLine, metaLine) ++ adds)
    dir.toString
  }

  /** Append a commit that re-declares metaData with `config` (schema and
    * partitioning unchanged) — the protocol's mechanism for ALTER TABLE
    * SET TBLPROPERTIES (test helper).
    */
  def setTableConfig(spark: SparkSession, tablePath: String,
                     config: Map[String, String]): Unit = {
    val snap = DeltaScan.snapshot(spark, tablePath)
    val metaLine = JsonMethods.compact(JsonMethods.render(
      "metaData" -> (
        ("id" -> "graft-fixture-reconf") ~
        ("format" -> (("provider" -> "parquet") ~ ("options" -> Map.empty[String, String]))) ~
        ("schemaString" -> snap.schema.json) ~
        ("partitionColumns" -> snap.partitionColumns) ~
        ("configuration" -> config))))
    DeltaWrite.commit(Paths.get(tablePath), snap.version + 1, Seq(metaLine))
  }

  /** Append a plain JSON commit of removes + adds (test helper). */
  def appendCommit(tablePath: String, version: Long,
                   removes: Seq[String], adds: Seq[String]): Unit =
    commit(Paths.get(tablePath), version,
      removes.map(removeLine) ++ adds.map(addLine(_, Map.empty)))

  // checkpoint action-row shapes (one non-null action per row)
  private case class CpFormat(provider: String)
  private case class CpProtocol(minReaderVersion: Int, minWriterVersion: Int)
  private case class CpMeta(id: String, format: CpFormat, schemaString: String,
                            partitionColumns: Seq[String])
  private case class CpAdd(path: String, partitionValues: Map[String, String],
                           size: Long, modificationTime: Long, dataChange: Boolean)
  private case class CpRow(protocol: Option[CpProtocol], metaData: Option[CpMeta],
                           add: Option[CpAdd])

  /** Compact the table's current snapshot into a single-part parquet
    * checkpoint at its latest version and (optionally) TRUNCATE the JSON
    * commits it subsumes — the real-world state a long-lived Delta table
    * is in, and the reason checkpoints exist.
    */
  def checkpoint(spark: SparkSession, tablePath: String, truncate: Boolean): Long = {
    import spark.implicits._
    val snap = DeltaScan.snapshot(spark, tablePath)
    val rows: Seq[CpRow] =
      CpRow(Some(CpProtocol(1, 2)), None, None) +:
      CpRow(None, Some(CpMeta("graft-fixture", CpFormat("parquet"),
        snap.schema.json, snap.partitionColumns)), None) +:
      snap.files.map(f => CpRow(None, None,
        Some(CpAdd(f.path, f.partitionValues, 1L, 0L, dataChange = false))))
    val logDir = Paths.get(tablePath, "_delta_log")
    writeOneParquet(rows.toDF(), logDir, f"${snap.version}%020d.checkpoint.parquet")
    Files.write(logDir.resolve("_last_checkpoint"),
      java.util.Arrays.asList(
        s"""{"version":${snap.version},"size":${rows.size}}"""))
    if (truncate)
      Files.list(logDir).iterator().asScala
        .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
        .filter(_.getFileName.toString.stripSuffix(".json").toLong <= snap.version)
        .foreach(Files.delete)
    snap.version
  }

  /** Partitioned variant (partition column in the LOG only, not the data
    * files): nation partitioned by n_regionkey — exercises partition-value
    * attachment and log-level pruning.
    */
  def nationByRegion(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_delta_nation_part")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val regions = nation.selectExpr("cast(n_regionkey as string)").distinct()
      .collect().map(_.getString(0)).sorted
    commit(dir, 0L, Seq(protocolLine, metaDataLine(nation, Seq("n_regionkey"))))
    val adds = regions.map { r =>
      val file = s"part-r$r.parquet"
      writeOneParquet(
        nation.filter(col("n_regionkey").cast("string") === r).drop("n_regionkey")
          .orderBy(col("n_nationkey")), dir, file)
      addLine(file, Map("n_regionkey" -> r))
    }
    commit(dir, 1L, adds.toSeq)
    dir.toString
  }
}
