package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native transactional Delta Lake WRITE path — the counterpart of
  * [[DeltaScan]], completing the reference's Delta surface
  * (/root/reference/extension/delta/src/functions/delta_scan.cpp is
  * read-only; the write side maps the reference's INSERT ... ON CONFLICT,
  * /root/reference/src/execution/operator/persistent/physical_insert.cpp,
  * onto the public Delta commit protocol) without the delta-spark package.
  *
  * The commit protocol is the published one: stage immutable parquet data
  * files into the table directory, then publish `_delta_log/<v>.json`
  * with the add/remove actions via an ATOMIC rename — the filesystem
  * rejects the rename if `<v>.json` already exists, which IS Delta's
  * optimistic concurrency control (first writer wins, loser re-reads the
  * snapshot and retries). Readers never see a partial commit: data files
  * are invisible until the log entry lands.
  *
  * Scale posture: data writes are ordinary distributed
  * `df.write.parquet` jobs (every executor writes its own part files —
  * nothing is funneled through the driver); the driver handles only
  * O(files-touched) action metadata, the same division of labor as
  * delta-spark. MERGE and DELETE rewrite ONLY the data files that
  * actually contain matched keys (log-pruned copy-on-write): at 100 TB a
  * merge touching 0.1% of keys rewrites ~0.1% of files, and a base table
  * clustered on the merge key tightens that bound further.
  */
object DeltaWrite {

  // ---------------------------------------------------------------- commit

  /** Publish one commit atomically. Throws [[java.nio.file.FileAlreadyExistsException]]
    * if a concurrent writer claimed the version first (caller: re-read
    * snapshot, re-stage against it, retry).
    */
  private[graft] def commit(tableDir: Path, version: Long, lines: Seq[String],
                            operation: String = "WRITE"): Unit = {
    val logDir = tableDir.resolve("_delta_log")
    Files.createDirectories(logDir)
    val tmp = logDir.resolve(s".${UUID.randomUUID()}.json.tmp")
    // commitInfo leads the commit: its timestamp is what timestamp-based
    // time travel resolves against (DeltaScan falls back to file mtime
    // for logs from writers that omit it)
    val info = JsonMethods.compact(JsonMethods.render(
      "commitInfo" -> (("timestamp" -> System.currentTimeMillis()) ~
        ("operation" -> operation))))
    Files.write(tmp, (info +: lines).asJava)
    val target = logDir.resolve(f"$version%020d.json")
    // hard link, not move: link(2) fails EEXIST ATOMICALLY, whereas
    // Files.move is an exists-check followed by rename(2), which would
    // silently REPLACE a concurrent writer's commit in the race window
    try Files.createLink(target, tmp)
    catch { case e: Throwable => Files.deleteIfExists(tmp); throw e }
    Files.deleteIfExists(tmp)
  }

  /** metaData.id is the table's STABLE unique identifier (Delta spec) —
    * only [[create]] mints one; every later metaData rewrite (schema
    * evolution, ADD COLUMN, checkpoints) must re-emit the id replayed
    * from the snapshot, or external readers caching by id see a table
    * replacement mid-history.
    */
  private[sources] def tableIdOf(snap: DeltaScan.Snapshot): String =
    if (snap.tableId.nonEmpty) snap.tableId else UUID.randomUUID().toString

  private def metaDataLine(schema: StructType, partitionColumns: Seq[String],
                           configuration: Map[String, String] = Map.empty,
                           id: String = null): String =
    JsonMethods.compact(JsonMethods.render(
      "metaData" -> (
        ("id" -> (if (id == null) UUID.randomUUID().toString else id)) ~
        ("format" -> (("provider" -> "parquet") ~ ("options" -> Map.empty[String, String]))) ~
        ("schemaString" -> schema.json) ~
        ("partitionColumns" -> partitionColumns) ~
        ("configuration" -> configuration))))

  private def protocolLine: String =
    JsonMethods.compact(JsonMethods.render(
      "protocol" -> (("minReaderVersion" -> 1) ~ ("minWriterVersion" -> 2))))

  /** The protocol stores `path` PERCENT-ENCODED (delta-spark decodes on
    * read); the URI constructor escapes spaces, '%', '=' and non-ASCII in
    * each on-disk path segment, so hive-escaped partition dirs round-trip
    * through standard readers. [[DeltaScan]] applies the inverse.
    */
  private[sources] def encodePath(rel: String): String =
    new java.net.URI(null, null, rel, null).toASCIIString

  /** `dataChange=false` marks actions that REARRANGE files without
    * changing the table's logical content (OPTIMIZE) — incremental/
    * streaming readers skip them instead of re-processing the rows.
    */
  private def addLine(file: String, pv: Map[String, String], size: Long,
                      dataChange: Boolean = true): String =
    JsonMethods.compact(JsonMethods.render(
      "add" -> (("path" -> encodePath(file)) ~ ("partitionValues" -> pv) ~ ("size" -> size) ~
        ("modificationTime" -> System.currentTimeMillis()) ~ ("dataChange" -> dataChange))))

  /** The spec reconciles file actions on (path, deletionVector.uniqueId),
    * so a remove tombstoning an add that carries a DV MUST repeat that
    * add's descriptor — a bare remove(path) would leave the (path, dv)
    * add live for spec-conformant readers (delta-spark InMemoryLogReplay,
    * delta-kernel FileActionKey), resurrecting deleted rows.
    */
  private def removeLine(file: String, dataChange: Boolean = true,
                         dv: Option[DeletionVectors.Descriptor] = None): String = {
    val base = ("path" -> encodePath(file)) ~
      ("deletionTimestamp" -> System.currentTimeMillis()) ~ ("dataChange" -> dataChange)
    val withDv = dv.fold(base) { d =>
      base ~ ("deletionVector" -> (("storageType" -> d.storageType) ~
        ("pathOrInlineDv" -> d.pathOrInlineDv) ~
        ("offset" -> d.offset) ~
        ("sizeInBytes" -> d.sizeInBytes) ~
        ("cardinality" -> d.cardinality)))
    }
    JsonMethods.compact(JsonMethods.render("remove" -> withDv))
  }

  /** Remove action for a file currently live in `snap` — looks up the
    * add's DV descriptor so the tombstone keys correctly.
    */
  private def removeLineFor(snap: DeltaScan.Snapshot, relPath: String,
                            dataChange: Boolean = true): String =
    removeLine(relPath, dataChange,
      snap.files.find(_.path == relPath).flatMap(_.dv))

  // ---------------------------------------------------------------- staging

  /** Hive-style %XX-unescape for partition directory values — Spark's own
    * canonical inverse of the escaping its partitioned writer applies.
    */
  private def unescapePartitionValue(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(s)

  /** Align an incoming DataFrame to the table's DECLARED schema: same
    * column set (any order), each column cast to the declared type.
    * A name-compatible but type-incompatible input (e.g. a string where
    * the table declares long) must fail HERE, at write time — committing
    * it would poison the table for every later scan, which is where the
    * damage would otherwise first surface. Mirrors delta-spark's write
    * schema enforcement.
    */
  /** Name equality per the session's `spark.sql.caseSensitive` (default
    * case-INsensitive, matching Spark's own column resolution): with an
    * exact-match rule an input column differing only in case would read
    * as "new" and evolve a duplicate-modulo-case column — a schema
    * delta-spark itself rejects — instead of aligning to the declared
    * column.
    */
  private def nameEq(caseSensitive: Boolean): (String, String) => Boolean =
    if (caseSensitive) _ == _ else _.equalsIgnoreCase(_)

  private def sessionCaseSensitive(df: DataFrame): Boolean =
    df.sparkSession.sessionState.conf.caseSensitiveAnalysis

  private[sources] def alignToSchema(df: DataFrame, schema: StructType): DataFrame = {
    val eq = nameEq(sessionCaseSensitive(df))
    val missing = schema.fieldNames
      .filterNot(d => df.schema.fieldNames.exists(i => eq(i, d)))
    require(missing.isEmpty,
      s"delta write: input is missing declared column(s) ${missing.mkString(", ")}")
    // an UNdeclared input column is a caller bug unless mergeSchema
    // evolved the declared schema first — silently dropping it would
    // lose data the caller thought they wrote
    val undeclared = df.schema.fieldNames
      .filterNot(i => schema.fieldNames.exists(d => eq(d, i)))
    require(undeclared.isEmpty,
      s"delta write: input carries undeclared column(s) ${undeclared.mkString(", ")} " +
        "(append with mergeSchema=true to evolve the table schema)")
    val cols = schema.fields.toSeq.map { f =>
      val in = df.schema.fields.find(i => eq(i.name, f.name)).get
      // safe widening only (int→long, float→double, …): a lossy-but-castable
      // input (string→long, long→int) is a caller bug, not an implicit cast —
      // the same up-cast rule delta-spark's write enforcement applies
      require(in.dataType == f.dataType ||
          org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(in.dataType, f.dataType),
        s"delta write: column '${f.name}' has type ${in.dataType}, " +
          s"incompatible with declared ${f.dataType}")
      df(in.name).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }

  // ---------------------------------------------------- schema evolution

  /** Merge the table's declared schema with an incoming one (delta-spark's
    * `mergeSchema` rule): declared columns keep their declared type and
    * metadata — the incoming side must up-cast, enforced later by
    * [[alignToSchema]] — and incoming-only columns append as NULLABLE
    * (files written before the evolution have no values for them; the
    * reader's explicit-schema parquet scan fills null). Under column
    * mapping each new field is minted a fresh `columnId`/`physicalName`
    * and `delta.columnMapping.maxColumnId` advances, per the spec's
    * add-column rule. Returns None when the incoming schema adds nothing
    * (no metaData action should be committed).
    */
  private[sources] def mergeSchemas(snap: DeltaScan.Snapshot,
      incoming: StructType,
      caseSensitive: Boolean = false): Option[(StructType, Map[String, String])] = {
    val eq = nameEq(caseSensitive)
    val added = incoming.fields
      .filterNot(f => snap.schema.fieldNames.exists(d => eq(d, f.name)))
    if (added.isEmpty) None
    else {
      require(snap.columnMappingMode == "none" ||
          snap.configuration.contains("delta.columnMapping.maxColumnId"),
        "delta write: column-mapped table lacks delta.columnMapping.maxColumnId " +
          "— cannot mint ids for new columns")
      var maxId = snap.configuration
        .get("delta.columnMapping.maxColumnId").map(_.toLong).getOrElse(0L)
      val evolvedNew = added.toSeq.map { f =>
        val meta =
          if (snap.columnMappingMode == "none") f.metadata
          else {
            maxId += 1
            new MetadataBuilder().withMetadata(f.metadata)
              .putLong("delta.columnMapping.id", maxId)
              .putString("delta.columnMapping.physicalName",
                s"col-${UUID.randomUUID()}")
              .build()
          }
        StructField(f.name, f.dataType, nullable = true, metadata = meta)
      }
      val conf =
        if (snap.columnMappingMode == "none") snap.configuration
        else snap.configuration + ("delta.columnMapping.maxColumnId" -> maxId.toString)
      Some((StructType(snap.schema.fields.toSeq ++ evolvedNew), conf))
    }
  }

  /** ALTER TABLE ADD COLUMN — a metaData-only commit (no data files): the
    * new nullable column appends to the declared schema; every existing
    * file reads back as null for it. The schema change is versioned like
    * any other commit, so time travel to an earlier version sees the
    * narrower schema (metaData replay in [[DeltaScan]] is per-version).
    */
  def addColumn(spark: SparkSession, tablePath: String,
                name: String, dataType: DataType): Long = {
    val tableDir = Paths.get(tablePath)
    val snap = DeltaScan.snapshot(spark, tablePath)
    checkWriteProtocol(snap, removesFiles = false)
    val cs = spark.sessionState.conf.caseSensitiveAnalysis
    require(!snap.schema.fieldNames.exists(nameEq(cs)(_, name)),
      s"delta write: column '$name' already exists")
    val (evolved, conf) = mergeSchemas(snap,
      StructType(Seq(StructField(name, dataType))), cs).get
    val v = snap.version + 1
    commit(tableDir, v,
      Seq(metaDataLine(evolved, snap.partitionColumns, conf, tableIdOf(snap))),
      operation = "ADD COLUMNS")
    maybeCheckpoint(spark, tablePath, snap, v)
    v
  }

  /** Recursively delete a staging temp tree; the staged payload has
    * already been moved out, so only _SUCCESS/CRC droppings remain.
    */
  private def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }

  /** Write `df` as parquet part files into a staging directory, move them
    * into the table directory under fresh unique names (preserving the
    * hive partition layout), and return the add actions.
    *
    * The data-file write is the distributed part; the move is a per-file
    * same-volume rename on the driver (on an object store this is the
    * commit-service copy step — still O(files) metadata).
    */
  private def stage(df: DataFrame, tableDir: Path,
                    partitionBy: Seq[String]): Seq[(String, Map[String, String], Long)] = {
    val stagingRoot = Files.createTempDirectory("graft_delta_stage")
    val staging = stagingRoot.resolve("out")
    try {
      val writer = df.write.mode("overwrite")
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .parquet(staging.toString)

      val walk = Files.walk(staging)
      val parts =
        try walk.iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
          .toSeq.sortBy(_.toString)
        finally walk.close()
      parts.zipWithIndex.map { case (src, idx) =>
        val rel = staging.relativize(src)
        // partition dirs (k=v components) from the staged layout
        val dirs = (0 until rel.getNameCount - 1).map(rel.getName(_).toString)
        val pv = dirs.collect { case d if d.contains("=") =>
          val Array(k, v) = d.split("=", 2)
          k -> (if (v == "__HIVE_DEFAULT_PARTITION__") null else unescapePartitionValue(v))
        }.toMap
        val name = s"part-${UUID.randomUUID().toString.take(12)}-$idx.parquet"
        val relPath = (dirs :+ name).mkString("/")
        val target = tableDir.resolve(Paths.get(relPath))
        Files.createDirectories(target.getParent)
        Files.move(src, target)
        (relPath, pv, Files.size(target))
      }
    } finally deleteRecursively(stagingRoot) // _SUCCESS/CRC droppings + dir tree
  }

  /** NOTE (conflict semantics): data files are staged into the table
    * BEFORE the commit rename, so an OCC loser leaves fully-written but
    * never-referenced part files behind — the same contract delta-spark
    * has, where VACUUM reclaims files no log version references.
    */

  // ------------------------------------------------------------- operations

  /** CREATE TABLE AS: version 0 with protocol + metaData + the data. */
  def create(spark: SparkSession, df: DataFrame, tablePath: String,
             partitionBy: Seq[String] = Nil): Long = {
    val tableDir = Paths.get(tablePath)
    Files.createDirectories(tableDir)
    val logDir = tableDir.resolve("_delta_log")
    val empty = !Files.isDirectory(logDir) || {
      val l = Files.list(logDir)
      // only PUBLISHED log entries count — a crashed writer's leftover
      // .tmp must not brick the path for create()
      try !l.iterator().asScala.exists { f =>
        val n = f.getFileName.toString
        n.matches("\\d{20}\\.json") || n.contains("checkpoint") || n == "_last_checkpoint"
      } finally l.close()
    }
    require(empty, s"Delta table already exists at $tablePath")
    val adds = stage(df, tableDir, partitionBy)
    commit(tableDir, 0L,
      Seq(protocolLine, metaDataLine(df.schema, partitionBy)) ++
        adds.map { case (p, pv, sz) => addLine(p, pv, sz) },
      operation = "CREATE TABLE AS SELECT")
    0L
  }

  /** Writer features/properties this writer honors. Everything it cannot
    * honor must refuse BEFORE staging: committing through an unhonored
    * writer feature (e.g. generated columns we would not populate)
    * silently breaks the table's contract for every other writer.
    */
  private val SupportedWriterFeatures =
    Set("appendOnly", "invariants", "columnMapping", "deletionVectors")

  /** Protocol-version / writerFeatures gate alone — the part every
    * commit (including content-neutral OPTIMIZE) must pass.
    */
  private def checkProtocolFeatures(snap: DeltaScan.Snapshot): Unit = {
    val p = snap.protocol
    if (p.minWriter == 7) {
      val unsupported = p.writerFeatures.toSet -- SupportedWriterFeatures
      if (unsupported.nonEmpty) throw new UnsupportedOperationException(
        s"delta write: writerFeatures ${unsupported.mkString(", ")} unsupported " +
          s"(writer supports ${SupportedWriterFeatures.mkString(", ")})")
    } else if (p.minWriter > 7) throw new UnsupportedOperationException(
      s"delta write: protocol minWriterVersion=${p.minWriter} unsupported")
  }

  private def checkWriteProtocol(snap: DeltaScan.Snapshot,
                                 removesFiles: Boolean): Unit = {
    checkProtocolFeatures(snap)
    // invariants (minWriter>=2 era or the v7 feature) are honored
    // vacuously only when the schema declares none
    val withInvariant = snap.schema.fields
      .filter(_.metadata.contains("delta.invariants")).map(_.name)
    if (withInvariant.nonEmpty) throw new UnsupportedOperationException(
      s"delta write: column invariants on ${withInvariant.mkString(", ")} are " +
        "not enforced by this writer")
    // legacy minWriter 4/6 imply writer duties the feature list never
    // surfaces: generated columns (v4) and identity columns (v6). The
    // version alone is harmless (tables over-declare), but a schema that
    // actually CARRIES such columns would be silently violated by rows
    // this writer doesn't compute — refuse, like invariants above.
    val generated = snap.schema.fields
      .filter(_.metadata.contains("delta.generationExpression")).map(_.name)
    if (generated.nonEmpty) throw new UnsupportedOperationException(
      s"delta write: generated columns ${generated.mkString(", ")} are not " +
        "computed by this writer")
    val identity = snap.schema.fields.filter(f =>
      f.metadata.contains("delta.identity.start") ||
        f.metadata.contains("delta.identity.allowExplicitInsert")).map(_.name)
    if (identity.nonEmpty) throw new UnsupportedOperationException(
      s"delta write: identity columns ${identity.mkString(", ")} are not " +
        "assigned by this writer")
    // CDF tables need _change_data files for row-removing commits; blind
    // appends are representable by their add actions alone (CDF spec)
    if (removesFiles &&
        snap.configuration.get("delta.enableChangeDataFeed").contains("true"))
      throw new UnsupportedOperationException(
        "delta write: delta.enableChangeDataFeed=true requires change-data " +
          "files this writer does not produce for DELETE/MERGE/UPDATE")
    if (removesFiles && snap.configuration.get("delta.appendOnly").contains("true"))
      throw new UnsupportedOperationException(
        "delta write: table is delta.appendOnly=true — MERGE/DELETE forbidden")
  }

  /** Logical→physical projection for staging into a column-mapped table:
    * the data files must carry the PHYSICAL column names, nested fields
    * included (the struct cast renames inner fields positionally — the
    * exact inverse of [[DeltaScan.scanSnapshot]]'s read-side rename).
    * Identity for unmapped tables.
    */
  private def toPhysical(df: DataFrame, snap: DeltaScan.Snapshot): DataFrame =
    if (snap.columnMappingMode == "none") df
    else df.select(snap.schema.fields.toSeq.map { f =>
      col(f.name).cast(snap.physicalType(f.dataType)).as(snap.physicalName(f))
    }: _*)

  /** Partition columns as they appear in staged data (and therefore in
    * the log's `partitionValues` keys — physical under column mapping,
    * per the spec).
    */
  private def physPartitionCols(snap: DeltaScan.Snapshot): Seq[String] =
    snap.partitionColumns.map(c => snap.physicalName(snap.schema(c)))

  /** Post-commit checkpointing per the `delta.checkpointInterval` table
    * property (delta-spark checkpoints every N commits — its default is
    * 10; this writer honors the property only when the table sets it,
    * keeping minimal fixtures checkpoint-free). At 100 TB this is what
    * bounds snapshot reconstruction: without it a long-lived table's
    * replay cost grows with its whole commit history. Runs AFTER the
    * commit is published — a checkpoint is an optimization for future
    * readers, never part of commit atomicity, so a failure here must not
    * fail the already-committed write.
    */
  private def maybeCheckpoint(spark: SparkSession, tablePath: String,
                              snap: DeltaScan.Snapshot, committed: Long): Unit =
    snap.configuration.get("delta.checkpointInterval")
      .flatMap(s => scala.util.Try(s.toLong).toOption).filter(_ > 0)
      .foreach { n =>
        if (committed % n == 0)
          try checkpoint(spark, tablePath)
          catch { case scala.util.control.NonFatal(_) => () }
      }

  /** INSERT INTO (append): a new version carrying only add actions.
    * With `mergeSchema` (delta-spark's `option("mergeSchema","true")`),
    * input-only columns evolve the declared schema — the commit leads
    * with the evolved metaData action and the staged files carry the new
    * columns; without it an input column the table doesn't declare is a
    * caller bug and fails in [[alignToSchema]].
    */
  def append(spark: SparkSession, df: DataFrame, tablePath: String,
             mergeSchema: Boolean = false): Long = {
    val tableDir = Paths.get(tablePath)
    val snap0 = DeltaScan.snapshot(spark, tablePath)
    checkWriteProtocol(snap0, removesFiles = false)
    val evolution =
      if (mergeSchema)
        mergeSchemas(snap0, df.schema, spark.sessionState.conf.caseSensitiveAnalysis)
      else None
    val snap = evolution.fold(snap0) { case (sch, conf) =>
      snap0.copy(schema = sch, configuration = conf)
    }
    val aligned = alignToSchema(df, snap.schema)
    val adds = stage(toPhysical(aligned, snap), tableDir, physPartitionCols(snap))
    // OCC: commit at the version AFTER the snapshot we read — if another
    // writer claimed it meanwhile, the rename fails and the caller retries
    // against a fresh snapshot
    val v = snap.version + 1
    commit(tableDir, v,
      evolution.toSeq.map { case (sch, conf) =>
        metaDataLine(sch, snap.partitionColumns, conf, tableIdOf(snap))
      } ++ adds.map { case (p, pv, sz) => addLine(p, pv, sz) })
    maybeCheckpoint(spark, tablePath, snap, v)
    v
  }

  /** Map each absolute scanned-file URI back to the snapshot's relative
    * log path. input_file_name() returns URL-ENCODED `file:/...` URIs
    * (space→%20, the '%' of a hive-escaped dir→%25) while snapshot paths
    * are the raw on-disk names — decode the URI first or every special
    * character silently empties the touched set.
    */
  private def touchedRelPaths(snap: DeltaScan.Snapshot, absolute: Seq[String]): Seq[String] = {
    // EXACT absolute-path equality, not suffix matching: resolve each
    // snapshot relative path against the table dir first. A suffix match
    // (`p.endsWith("/" + r)`) can mark an UNtouched file as touched when
    // one active file's relative path is a path-suffix of another's
    // absolute path (same basename at different partition depths, e.g.
    // externally-written tables) — a spurious remove = data loss.
    val tableAbs = Paths.get(snap.tablePath).toAbsolutePath.normalize
    val absToRel = snap.files.map(f =>
      tableAbs.resolve(f.path).normalize.toString -> f.path).toMap
    absolute.map(DeltaScan.decodePath)
      .map(p => Paths.get(p).toAbsolutePath.normalize.toString)
      .flatMap(absToRel.get)
      .distinct
  }

  /** MERGE INTO (WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *) —
    * copy-on-write rewriting ONLY the files that contain matched keys.
    * Semantics layer = [[graft.operators.MergeInto.upsert]] (oracle-gated
    * by `merge_upsert`); this method adds the file-pruned transactional
    * application of it.
    */
  def merge(spark: SparkSession, tablePath: String, updates: DataFrame,
            keys: Seq[String]): Long = {
    val tableDir = Paths.get(tablePath)
    val snap = DeltaScan.snapshot(spark, tablePath)
    checkWriteProtocol(snap, removesFiles = true)
    val cols = snap.schema.fieldNames.toSeq
    // pin the read to the SAME snapshot the remove actions and version
    // number derive from — a commit landing between two independent log
    // replays would silently mix file sets
    val base = DeltaScan.scanSnapshot(spark, snap)
    val u = alignToSchema(updates, snap.schema)

    // file pruning: which data files contain at least one matched key?
    // (the collected list is file METADATA — O(files touched), not rows)
    val keyCols = keys.map(col)
    val touchedAbs = base.withColumn("_graft_file", input_file_name())
      .join(u.select(keyCols: _*).distinct(), keys, "left_semi")
      .select(col("_graft_file")).distinct().collect().map(_.getString(0)).toSeq
    val touched = touchedRelPaths(snap, touchedAbs)

    // updates that matched ANY base row rewrite in place; the rest insert.
    // Every base row with a matched key lives in a touched file, so the
    // rewrite set is closed under the match relation. One shared key
    // projection feeds both joins (persist keeps this at one base scan
    // for the pair instead of two).
    val baseKeys = base.select(keyCols: _*).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val matchedUpdates = u.join(baseKeys, keys, "left_semi")
    val inserts = u.join(baseKeys, keys, "left_anti")

    // same scan shape ⇒ input_file_name() yields the same URIs collected
    // above, so a codegen'd isin over the O(files) list selects the
    // touched rows without any UDF
    val touchedRows =
      if (touched.isEmpty) base.limit(0)
      else base.withColumn("_graft_file", input_file_name())
        .filter(col("_graft_file").isin(touchedAbs: _*)).drop("_graft_file")
    val rewritten = graft.operators.MergeInto
      .upsert(touchedRows, matchedUpdates, keys)
      .select(cols.map(col): _*)
    val newData = rewritten.unionAll(inserts)

    val adds =
      try stage(toPhysical(newData, snap), tableDir, physPartitionCols(snap))
      finally baseKeys.unpersist(blocking = false)
    val v = snap.version + 1
    commit(tableDir, v,
      touched.map(f => removeLineFor(snap, f)) ++
        adds.map { case (p, pv, sz) => addLine(p, pv, sz) },
      operation = "MERGE")
    maybeCheckpoint(spark, tablePath, snap, v)
    v
  }

  /** DELETE WHERE — copy-on-write rewriting only the files that contain
    * at least one row matching the predicate; untouched files survive
    * the commit byte-identical.
    */
  def deleteWhere(spark: SparkSession, tablePath: String, predicate: Column): Long = {
    val tableDir = Paths.get(tablePath)
    val snap = DeltaScan.snapshot(spark, tablePath)
    checkWriteProtocol(snap, removesFiles = true)
    val cols = snap.schema.fieldNames.toSeq
    val base = DeltaScan.scanSnapshot(spark, snap) // pinned: one replay, one file set

    val touchedAbs = base.withColumn("_graft_file", input_file_name())
      .filter(predicate)
      .select(col("_graft_file")).distinct().collect().map(_.getString(0)).toSeq
    val touched = touchedRelPaths(snap, touchedAbs)
    if (touched.isEmpty) return snap.version

    val survivors = base.withColumn("_graft_file", input_file_name())
      .filter(col("_graft_file").isin(touchedAbs: _*)).drop("_graft_file")
      .filter(!coalesce(predicate, lit(false)))
      .select(cols.map(col): _*)

    val adds = stage(toPhysical(survivors, snap), tableDir, physPartitionCols(snap))
    val v = snap.version + 1
    commit(tableDir, v,
      touched.map(f => removeLineFor(snap, f)) ++
        adds.map { case (p, pv, sz) => addLine(p, pv, sz) },
      operation = "DELETE")
    maybeCheckpoint(spark, tablePath, snap, v)
    v
  }

  /** UPDATE ... SET ... WHERE — copy-on-write rewriting only the files
    * that contain at least one matched row; within a rewritten file the
    * SET expressions apply exactly to the rows the predicate selects and
    * every other row re-emits unchanged (delta-spark's UPDATE shape;
    * completes the native DML triangle next to [[merge]] and
    * [[deleteWhere]]). SET values are cast to the column's declared type
    * — an UPDATE must not be able to corrupt the schema contract.
    */
  def update(spark: SparkSession, tablePath: String,
             set: Map[String, Column], predicate: Column): Long = {
    val tableDir = Paths.get(tablePath)
    val snap = DeltaScan.snapshot(spark, tablePath)
    checkWriteProtocol(snap, removesFiles = true)
    val unknown = set.keySet -- snap.schema.fieldNames
    require(unknown.isEmpty, s"update: unknown columns ${unknown.mkString(", ")}")
    require((set.keySet & snap.partitionColumns.toSet).isEmpty,
      "update: partition columns cannot be SET (delete + insert instead)")
    val base = DeltaScan.scanSnapshot(spark, snap) // pinned snapshot

    val touchedAbs = base.withColumn("_graft_file", input_file_name())
      .filter(predicate)
      .select(col("_graft_file")).distinct().collect().map(_.getString(0)).toSeq
    val touched = touchedRelPaths(snap, touchedAbs)
    if (touched.isEmpty) return snap.version

    val rewritten = base.withColumn("_graft_file", input_file_name())
      .filter(col("_graft_file").isin(touchedAbs: _*)).drop("_graft_file")
      .select(snap.schema.fields.toSeq.map { f =>
        set.get(f.name) match {
          case Some(expr) =>
            when(coalesce(predicate, lit(false)), expr.cast(f.dataType))
              .otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)

    val adds = stage(toPhysical(rewritten, snap), tableDir, physPartitionCols(snap))
    val v = snap.version + 1
    commit(tableDir, v,
      touched.map(f => removeLineFor(snap, f)) ++
        adds.map { case (p, pv, sz) => addLine(p, pv, sz) },
      operation = "UPDATE")
    maybeCheckpoint(spark, tablePath, snap, v)
    v
  }

  /** Add action carrying a deletion-vector descriptor (the same file
    * stays live, its deleted positions live in the sidecar).
    */
  private def addLineDv(file: String, pv: Map[String, String], size: Long,
                        dv: DeletionVectors.Descriptor): String =
    JsonMethods.compact(JsonMethods.render(
      "add" -> (("path" -> encodePath(file)) ~ ("partitionValues" -> pv) ~
        ("size" -> size) ~
        ("modificationTime" -> System.currentTimeMillis()) ~ ("dataChange" -> true) ~
        ("deletionVector" -> (("storageType" -> dv.storageType) ~
          ("pathOrInlineDv" -> dv.pathOrInlineDv) ~
          ("offset" -> dv.offset) ~
          ("sizeInBytes" -> dv.sizeInBytes) ~
          ("cardinality" -> dv.cardinality))))))

  /** DELETE WHERE via DELETION VECTORS — the modern delta-spark default
    * for small-fraction deletes: no data file is rewritten; matched row
    * positions are written as roaring-bitmap sidecars
    * ([[DeletionVectors.writeSidecar]]) and each touched file re-adds
    * with its (merged) DV descriptor. At 100 TB a 0.1% delete writes a
    * few KB of sidecars instead of rewriting TBs of parquet — and a
    * later [[optimize]] materializes the DVs away.
    *
    * Tables on protocol v1/v2 are upgraded in the same commit to
    * minReader 3 / minWriter 7 with the `deletionVectors` feature (plus
    * `columnMapping` when the table already uses it) — the published
    * feature-upgrade path.
    *
    * Scale posture: the match scan is an ordinary distributed parquet
    * read per partition group (`_metadata` exposes file + row position);
    * the driver collects O(matched rows) positions — the same bitmap
    * metadata bound delta-spark's DV writer accepts — and stages only
    * sidecar bytes. Matching includes rows an existing DV already
    * deleted; the union merge makes that harmless.
    */
  def deleteWhereDv(spark: SparkSession, tablePath: String,
                    predicate: Column): Long = {
    val snap = DeltaScan.snapshot(spark, tablePath)
    checkWriteProtocol(snap, removesFiles = true)
    if (snap.files.isEmpty) return snap.version
    val matched = fileRowScan(spark, snap, tablePath).filter(predicate)
      .select(col("_graft_file"), col("_graft_ri"))
    val actions = dvActions(snap, tablePath, collectPositions(snap, matched))
    if (actions.isEmpty) return snap.version
    val v = snap.version + 1
    commit(Paths.get(tablePath), v,
      dvProtocolLines(snap) ++
        actions.map { case (f, _) => removeLine(f.path, dv = f.dv) } ++
        actions.map { case (f, d) => addLineDv(f.path, f.partitionValues, f.size, d) },
      operation = "DELETE")
    maybeCheckpoint(spark, tablePath, snap, v)
    v
  }

  /** MERGE INTO via DELETION VECTORS — delta-spark's merge shape on a
    * DV-enabled table: base rows matching an update key are DV-deleted in
    * place (no base file rewrites) and ALL update rows append as new
    * files (matched keys as their new versions, unmatched as inserts).
    * Result-identical to [[merge]] — `MergeInto.upsert`'s UPDATE SET *
    * semantics — with the cost model flipped: copy-on-write rewrites the
    * touched files (good when matches cluster), DV-merge writes sidecars
    * + only the update rows (good when matches scatter across many files,
    * the common 100 TB case where every file holds a few matched keys and
    * copy-on-write degenerates to rewriting the whole table).
    */
  def mergeDv(spark: SparkSession, tablePath: String, updates: DataFrame,
              keys: Seq[String]): Long = {
    val tableDir = Paths.get(tablePath)
    val snap = DeltaScan.snapshot(spark, tablePath)
    checkWriteProtocol(snap, removesFiles = true)
    require(keys.nonEmpty && keys.forall(snap.schema.fieldNames.contains),
      s"mergeDv: keys ${keys.mkString(", ")} must exist in the table schema")
    val aligned = alignToSchema(updates, snap.schema)
    val matched =
      if (snap.files.isEmpty) Nil
      else collectPositions(snap,
        fileRowScan(spark, snap, tablePath)
          .join(aligned.select(keys.map(col): _*).distinct(), keys, "leftsemi")
          .select(col("_graft_file"), col("_graft_ri")))
    val actions = dvActions(snap, tablePath, matched)
    val adds = stage(toPhysical(aligned, snap), tableDir, physPartitionCols(snap))
    val v = snap.version + 1
    commit(tableDir, v,
      (if (actions.isEmpty) Nil else dvProtocolLines(snap)) ++
        actions.map { case (f, _) => removeLine(f.path, dv = f.dv) } ++
        actions.map { case (f, d) => addLineDv(f.path, f.partitionValues, f.size, d) } ++
        adds.map { case (p, pv, sz) => addLine(p, pv, sz) },
      operation = "MERGE")
    maybeCheckpoint(spark, tablePath, snap, v)
    v
  }

  /** Distributed scan of a snapshot's raw files surfacing the LOGICAL
    * columns plus `_graft_file` (absolute file path) and `_graft_ri`
    * (physical row position) — the match side of every DV-writing op.
    * DV-carrying files read raw: rows an existing vector already deleted
    * may re-match, and the union merge in [[dvActions]] absorbs that.
    */
  private def fileRowScan(spark: SparkSession, snap: DeltaScan.Snapshot,
                          tablePath: String): DataFrame = {
    val dataFields = snap.schema.fields.filterNot(f =>
      snap.partitionColumns.contains(f.name))
    val dataSchema = snap.physicalType(StructType(dataFields)).asInstanceOf[StructType]
    snap.files.groupBy(_.partitionValues).toSeq.map { case (pv, fs) =>
      val read = spark.read.schema(dataSchema)
        .parquet(fs.map(f => s"$tablePath/${f.path}"): _*)
        .withColumn("_graft_file", col("_metadata.file_path"))
        .withColumn("_graft_ri", col("_metadata.row_index"))
      val logical =
        if (snap.columnMappingMode == "none") read
        else read.select(dataFields.toSeq.map(f =>
          col(snap.physicalName(f)).cast(f.dataType).as(f.name))
          :+ col("_graft_file") :+ col("_graft_ri"): _*)
      snap.partitionColumns.foldLeft(logical) { (df, c) =>
        val f = snap.schema(c)
        val v = pv.get(snap.physicalName(f)).orNull
        df.withColumn(c, (if (v == null) lit(null) else lit(v)).cast(f.dataType))
      }
    }.reduce(_ unionAll _)
  }

  /** Collect matched (file, position) pairs back as per-relative-path
    * index arrays — O(matched rows) driver state, the bitmap-metadata
    * bound delta-spark's DV writer accepts.
    */
  private def collectPositions(snap: DeltaScan.Snapshot,
                               matched: DataFrame): Seq[(String, Array[Long])] = {
    val tableAbs = Paths.get(snap.tablePath).toAbsolutePath.normalize
    val absToRel = snap.files.map(f =>
      tableAbs.resolve(f.path).normalize.toString -> f.path).toMap
    matched.groupBy(col("_graft_file"))
      .agg(collect_list(col("_graft_ri")).as("ris"))
      .collect().toSeq.flatMap { r =>
        val abs = Paths.get(DeltaScan.decodePath(r.getString(0)))
          .toAbsolutePath.normalize.toString
        absToRel.get(abs).map(rel => rel -> r.getSeq[Long](1).toArray)
      }
  }

  /** Write one merged sidecar per touched file (existing vector unioned
    * with the new positions) and pair it with the file's add entry.
    */
  private def dvActions(snap: DeltaScan.Snapshot, tablePath: String,
                        newDeletes: Seq[(String, Array[Long])])
      : Seq[(DeltaScan.AddFile, DeletionVectors.Descriptor)] = {
    val byPath = snap.files.map(f => f.path -> f).toMap
    newDeletes.map { case (rel, idx) =>
      val f = byPath(rel)
      val existing = f.dv.map(d => DeletionVectors.read(tablePath, d))
        .getOrElse(Array.empty[Long])
      val merged = (existing ++ idx).distinct.sorted
      f -> DeletionVectors.writeSidecar(tablePath, merged, UUID.randomUUID())
    }
  }

  /** Protocol upgrade to the v3/v7 feature form when the table does not
    * yet declare `deletionVectors` (empty when it already does).
    */
  private def dvProtocolLines(snap: DeltaScan.Snapshot): Seq[String] = {
    val p = snap.protocol
    if (p.minReader >= 3 && p.readerFeatures.contains("deletionVectors")) Nil
    else {
      val cmFeature =
        if (snap.columnMappingMode != "none") Seq("columnMapping") else Nil
      val rf = (p.readerFeatures ++ cmFeature :+ "deletionVectors").distinct
      val wf = (p.writerFeatures ++ cmFeature :+ "deletionVectors").distinct
      Seq(JsonMethods.compact(JsonMethods.render(
        "protocol" -> (("minReaderVersion" -> 3) ~ ("minWriterVersion" -> 7) ~
          ("readerFeatures" -> rf) ~ ("writerFeatures" -> wf)))))
    }
  }

  /** OPTIMIZE (bin-pack compaction): rewrite each partition's small data
    * files (size < `targetFileBytes`) into consolidated ones, and rewrite
    * every deletion-vector-carrying file into a plain one (materializing
    * the DV away, as delta-spark's OPTIMIZE does). Committed with
    * `dataChange=false` on both the add and the remove actions — the
    * table's LOGICAL content is untouched, so incremental readers skip
    * the commit and `delta.appendOnly` does not forbid it (appendOnly
    * constrains operations that delete data; rearranging files is
    * allowed, matching delta-spark).
    *
    * This is the small-file compaction a 100 TB table lives or dies by:
    * many small appends (streaming micro-batches, per-task part files)
    * degrade scan planning to O(files) and per-file footer reads dominate —
    * OPTIMIZE restores ~target-sized files. Rewrites cluster one task
    * per partition value (`repartition(partitionCols)`), so compaction
    * parallelizes across partitions; unpartitioned tables split into
    * ceil(bytes/target) tasks. Returns the committed version, or the
    * snapshot's version unchanged when nothing qualifies.
    *
    * Pre-OPTIMIZE versions still time-travel (the replaced files stay on
    * disk) until [[vacuum]] reclaims them.
    */
  def optimize(spark: SparkSession, tablePath: String,
               targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val tableDir = Paths.get(tablePath)
    val snap = DeltaScan.snapshot(spark, tablePath)
    checkProtocolFeatures(snap)
    val selected = snap.files.groupBy(_.partitionValues).values.flatMap { fs =>
      val (withDv, plain) = fs.partition(_.dv.isDefined)
      val small = plain.filter(_.size < targetFileBytes)
      // a lone small plain file would be rewritten into itself — skip;
      // a DV file is always worth rewriting (purges the vector)
      withDv ++ (if (small.size >= 2) small else Nil)
    }.toSeq
    if (selected.isEmpty) return snap.version

    // a sub-snapshot over just the selected files reuses the scan's DV
    // skipping and column-mapping resolution — the rewrite reads exactly
    // the surviving rows of the files being replaced
    val data = DeltaScan.scanSnapshot(spark, snap.copy(files = selected))
    val shaped =
      if (snap.partitionColumns.nonEmpty)
        data.repartition(snap.partitionColumns.map(col): _*)
      else {
        val n = math.max(1L,
          (selected.map(_.size).sum + targetFileBytes - 1) / targetFileBytes)
        data.repartition(n.toInt)
      }
    val adds = stage(toPhysical(shaped, snap), tableDir, physPartitionCols(snap))
    val v = snap.version + 1
    commit(tableDir, v,
      selected.map(f => removeLine(f.path, dataChange = false, dv = f.dv)) ++
        adds.map { case (p, pv, sz) => addLine(p, pv, sz, dataChange = false) },
      operation = "OPTIMIZE")
    maybeCheckpoint(spark, tablePath, snap, v)
    v
  }

  /** VACUUM: physically delete data files no longer referenced by the
    * CURRENT snapshot whose modification time is older than
    * `retentionMillis` (default 7 days, delta-spark's floor). Reclaims
    * OPTIMIZE/MERGE/DELETE-replaced files and OCC losers' orphaned
    * staging output. Returns the number of files deleted.
    *
    * Consequences, same contract as delta-spark: time travel to versions
    * whose files were reclaimed stops working; the retention window is
    * what protects (a) in-flight readers of recent snapshots and (b) a
    * concurrent writer's staged-but-not-yet-committed files — pass 0
    * only in single-writer tests. Only `*.parquet` files outside
    * `_delta_log` are candidates, so DV sidecars (`*.bin`) and the log
    * itself are never touched.
    */
  def vacuum(spark: SparkSession, tablePath: String,
             retentionMillis: Long = 7L * 24 * 60 * 60 * 1000): Int = {
    val tableDir = Paths.get(tablePath).toAbsolutePath.normalize
    val snap = DeltaScan.snapshot(spark, tablePath)
    val logDir = tableDir.resolve("_delta_log")
    val live = snap.files
      .map(f => tableDir.resolve(f.path).normalize.toString).toSet
    // DV sidecars referenced by a live add stay; orphans (each DV-delete
    // writes a fresh merged sidecar, optimize materializes DVs away)
    // reclaim like data files — otherwise a DV-heavy table leaks disk
    val liveDv = snap.files.flatMap(_.dv)
      .flatMap(d => DeletionVectors.sidecarFile(tablePath, d))
      .map(_.toAbsolutePath.normalize.toString).toSet
    val cutoff = System.currentTimeMillis() - retentionMillis
    val walk = Files.walk(tableDir)
    val victims =
      try walk.iterator().asScala.filter { p =>
        val name = p.getFileName.toString
        val reclaimable =
          (name.endsWith(".parquet") &&
            !live.contains(p.toAbsolutePath.normalize.toString)) ||
          (name.startsWith("deletion_vector_") && name.endsWith(".bin") &&
            !liveDv.contains(p.toAbsolutePath.normalize.toString))
        !p.startsWith(logDir) && Files.isRegularFile(p) && reclaimable &&
          Files.getLastModifiedTime(p).toMillis < cutoff
      }.toList
      finally walk.close()
    victims.foreach(Files.deleteIfExists(_))
    // prune partition directories the deletions emptied (deepest first)
    val dirs = Files.walk(tableDir)
    try dirs.sorted(java.util.Comparator.reverseOrder()).iterator().asScala
      .filter(p => p != tableDir && p != logDir && !p.startsWith(logDir) &&
        Files.isDirectory(p))
      .foreach { p =>
        val l = Files.list(p)
        val empty = try !l.iterator().hasNext finally l.close()
        if (empty) Files.deleteIfExists(p)
      }
    finally dirs.close()
    victims.size
  }

  /** Write a single-part parquet checkpoint of the CURRENT snapshot plus
    * `_last_checkpoint`, enabling log truncation ([[DeltaScan]] already
    * reads this form). Checkpoint rows carry one non-null action column
    * each, per the public checkpoint schema.
    *
    * Fidelity is exact: the protocol action is reproduced verbatim
    * (feature lists included — a DV or column-mapped table must not be
    * DOWNGRADED by its own checkpoint), metaData keeps `configuration`
    * (dropping it would erase the column-mapping mode), and add rows
    * keep their `deletionVector` descriptors (dropping one would
    * RESURRECT the deleted rows once the JSON log is truncated).
    */
  def checkpoint(spark: SparkSession, tablePath: String): Long = {
    val tableDir = Paths.get(tablePath)
    val snap = DeltaScan.snapshot(spark, tablePath)
    val logDir = tableDir.resolve("_delta_log")

    val protocolType = StructType(Seq(
      StructField("minReaderVersion", IntegerType), StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))
    val formatType = StructType(Seq(
      StructField("provider", StringType),
      StructField("options", MapType(StringType, StringType))))
    val metaType = StructType(Seq(
      StructField("id", StringType),
      StructField("format", formatType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType))))
    val dvType = StructType(Seq(
      StructField("storageType", StringType),
      StructField("pathOrInlineDv", StringType),
      StructField("offset", LongType),
      StructField("sizeInBytes", LongType),
      StructField("cardinality", LongType)))
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType), StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("deletionVector", dvType)))
    val cpSchema = StructType(Seq(
      StructField("protocol", protocolType), StructField("metaData", metaType),
      StructField("add", addType)))

    val p = snap.protocol
    val rows: Seq[Row] =
      Row(Row(p.minReader, p.minWriter,
        // feature lists exist only in the v3/v7 protocol shape
        if (p.minReader >= 3) p.readerFeatures else null,
        if (p.minWriter >= 7) p.writerFeatures else null), null, null) +:
      Row(null, Row(tableIdOf(snap), Row("parquet", Map.empty[String, String]),
        snap.schema.json, snap.partitionColumns, snap.configuration), null) +:
      // real per-file sizes (carried through Snapshot.AddFile) and encoded
      // paths — external readers plan splits from checkpoint add.size
      // dataChange=false: checkpoint actions reproduce state, they are
      // not new data (incremental readers would re-process otherwise)
      snap.files.map(f =>
        Row(null, null, Row(encodePath(f.path), f.partitionValues, f.size, 0L, false,
          f.dv.map(d => Row(d.storageType, d.pathOrInlineDv,
            d.offset.map(Long.box).orNull, d.sizeInBytes, d.cardinality)).orNull)))

    val tmpRoot = Files.createTempDirectory("graft_delta_cp")
    try {
      val tmp = tmpRoot.resolve("out")
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), cpSchema)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(sys.error(s"no checkpoint parquet written under $tmp"))
        finally listing.close()
      Files.move(part, logDir.resolve(f"${snap.version}%020d.checkpoint.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // _last_checkpoint must appear atomically: a truncate-then-write
      // leaves a window where a concurrent snapshot() reads empty/partial
      // JSON and fails the whole scan instead of falling back to replay
      val lcTmp = logDir.resolve(s".${UUID.randomUUID()}._last_checkpoint.tmp")
      Files.write(lcTmp,
        Seq(JsonMethods.compact(JsonMethods.render(
          ("version" -> snap.version) ~ ("size" -> (rows.size.toLong))))).asJava)
      Files.move(lcTmp, logDir.resolve("_last_checkpoint"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      snap.version
    } finally deleteRecursively(tmpRoot)
  }
}
