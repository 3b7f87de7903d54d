package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}

/** Native read-only Delta Lake scan — the reference's `delta_scan`
  * (/root/reference/extension/delta/src/functions/delta_scan.cpp) without
  * the delta-spark package: the Delta log is public JSON
  * (`_delta_log/<version>.json`, one action object per line) over plain
  * parquet data files, so a reader needs only log replay + parquet reads.
  *
  * Supported (the `delta_scan` read surface):
  *  - snapshot reconstruction: replay add/remove actions in version order;
  *    an `add` puts a file in the active set, a `remove` deletes it
  *  - schema + partition columns from the latest `metaData` action
  *    (`schemaString` is Spark's own StructType JSON format)
  *  - time travel by version (`versionAsOf` ≙ the reference's pin option)
  *  - partition pruning from the LOG's `partitionValues` — files are
  *    pruned before any parquet footer is touched (the log is the index,
  *    same as the reference's use of delta file-skipping metadata)
  *
  * Scale posture: replay is driver-side METADATA work — O(files) tiny
  * structs, the same state-reconstruction shape delta-spark itself uses —
  * and the data path is ordinary distributed parquet scans, so pushdown /
  * column pruning / AQE all apply unchanged. Parquet checkpoints (log
  * truncation) are supported in both single- and multi-part form —
  * state folds from the checkpoint's action rows (a multi-part
  * checkpoint is the same row set split across
  * `<v>.checkpoint.<i>.<n>.parquet` files, read together), later JSON
  * commits replay on top. Protocol v3 tables are readable when their
  * readerFeatures are implemented — today `deletionVectors` (see
  * [[DeletionVectors]]); any other feature (columnMapping, …) throws
  * loudly rather than mis-reading.
  */
object DeltaScan {

  final case class AddFile(path: String, partitionValues: Map[String, String],
                           size: Long = 0L,
                           dv: Option[DeletionVectors.Descriptor] = None)

  /** Reader features this scan implements beyond protocol v1. Protocol
    * v3 tables list required features explicitly; any OTHER feature
    * (v2Checkpoint, timestampNtz, …) still throws loudly.
    * minReaderVersion=2 (legacy column-mapping tables) is accepted: the
    * only v2 reader requirement IS column mapping, which [[scanSnapshot]]
    * implements via physicalName resolution.
    */
  private val SupportedReaderFeatures = Set("deletionVectors", "columnMapping")

  private def checkProtocol(minReader: Int, readerFeatures: Seq[String]): Unit = {
    if (minReader == 3) {
      val unsupported = readerFeatures.toSet -- SupportedReaderFeatures
      if (unsupported.nonEmpty) throw new UnsupportedOperationException(
        s"delta_scan: readerFeatures ${unsupported.mkString(", ")} unsupported " +
          s"(reader supports ${SupportedReaderFeatures.mkString(", ")})")
    } else if (minReader > 3) throw new UnsupportedOperationException(
      s"delta_scan: protocol minReaderVersion=$minReader unsupported " +
        "(reader is v1/v2 + v3 feature tables)")
  }

  /** Inverse of the protocol's percent-encoding of `path` (see
    * [[DeltaWrite.encodePath]]). Percent-free raw paths (this repo's
    * fixtures, simple external writers) decode to themselves; a raw path
    * that CONTAINS literal %XX is indistinguishable from an encoded one
    * and the protocol reading (encoded) wins. Paths the URI parser treats
    * as opaque (':' in the first segment → getPath == null) fall back raw
    * rather than dereferencing null.
    */
  private[sources] def decodePath(raw: String): String =
    try {
      val p = new java.net.URI(raw).getPath
      if (p == null) raw else p
    } catch { case _: Exception => raw }

  /** The table's exact protocol action, preserved so checkpoints rewrite
    * it with full fidelity (feature lists included) instead of
    * downgrading to the writer's own defaults.
    */
  final case class Protocol(minReader: Int, minWriter: Int,
                            readerFeatures: Seq[String] = Nil,
                            writerFeatures: Seq[String] = Nil)

  final case class Snapshot(
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      files: Seq[AddFile],
      tablePath: String,
      configuration: Map[String, String] = Map.empty,
      protocol: Protocol = Protocol(1, 2),
      // metaData.id — the table's STABLE unique identifier (Delta spec):
      // carried through so post-creation commits and checkpoints re-emit
      // it instead of minting a fresh one (external readers treat an id
      // change as a table replacement)
      tableId: String = "") {

    /** `delta.columnMapping.mode` table property: none | name | id. */
    def columnMappingMode: String =
      configuration.getOrElse("delta.columnMapping.mode", "none")

    /** Parquet-side name of a logical field under column mapping (the
      * `delta.columnMapping.physicalName` field metadata the spec
      * requires in both `name` and `id` modes).
      */
    def physicalName(f: org.apache.spark.sql.types.StructField): String =
      if (columnMappingMode == "none") f.name
      else {
        require(f.metadata.contains("delta.columnMapping.physicalName"),
          s"delta_scan: columnMapping.mode=$columnMappingMode but field " +
            s"${f.name} carries no physicalName metadata")
        f.metadata.getString("delta.columnMapping.physicalName")
      }

    /** Recursively rewrite a logical data type to its parquet-side shape:
      * nested struct fields take their physical names. Identity when the
      * table is unmapped.
      */
    def physicalType(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(name = physicalName(f), dataType = physicalType(f.dataType))))
      case a: org.apache.spark.sql.types.ArrayType =>
        a.copy(elementType = physicalType(a.elementType))
      case m: org.apache.spark.sql.types.MapType =>
        m.copy(keyType = physicalType(m.keyType), valueType = physicalType(m.valueType))
      case other => other
    }
  }

  private implicit val formats: Formats = DefaultFormats

  /** Replay the log into the active-file snapshot as of `versionAsOf`
    * (None = latest). Local filesystem paths (bench/test environment);
    * on a cluster the same replay runs over the object store's listing.
    *
    * Checkpoint handling (log truncation — old JSON commits are deleted
    * once compacted into `<v>.checkpoint.parquet`): when `_last_checkpoint`
    * exists and the target version is at or past it, state starts from
    * the checkpoint's action rows and only the JSON commits AFTER it
    * replay; time travel BEFORE the checkpoint still works iff the JSON
    * commits survive, and throws a clear error when they are truncated.
    * Multi-part checkpoints (`"parts"` in `_last_checkpoint`) read all
    * `<v>.checkpoint.<i>.<n>.parquet` part files as one action set.
    */
  def snapshot(spark: SparkSession, tablePath: String,
               versionAsOf: Option[Long] = None,
               timestampAsOf: Option[Long] = None): Snapshot = {
    val logDir = Paths.get(tablePath, "_delta_log")
    require(Files.isDirectory(logDir), s"not a Delta table (no _delta_log): $tablePath")
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "delta_scan: specify versionAsOf OR timestampAsOf, not both")

    // (version, parts): parts = None for a single-file checkpoint.
    // An empty/partial/corrupt _last_checkpoint (non-atomic external
    // writer caught mid-write) must not fail the scan: fall back to
    // discovering the latest complete checkpoint from the log listing —
    // the same recovery delta-spark performs.
    val checkpointInfo: Option[(Long, Option[Int])] = {
      val lc = logDir.resolve("_last_checkpoint")
      val parsed: Option[(Long, Option[Int])] =
        if (!Files.exists(lc)) None
        else scala.util.Try {
          val j = JsonMethods.parse(String.join("\n", Files.readAllLines(lc)))
          ((j \ "version").extract[Long], (j \ "parts").extractOpt[Int])
        }.toOption
      parsed.orElse {
        if (!Files.exists(lc)) None
        else { // corrupt pointer: list for <v>.checkpoint.parquet / complete multi-part sets
          val l = Files.list(logDir)
          val names = try l.iterator().asScala.map(_.getFileName.toString).toSeq finally l.close()
          val single = names.collect {
            case n if n.matches("\\d{20}\\.checkpoint\\.parquet") =>
              (n.take(20).toLong, None: Option[Int])
          }
          val MultiPart = """(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
          val multi = names.collect {
            case MultiPart(v, _, n) => (v.toLong, n.toInt)
          }.groupBy(identity).collect { // keep only COMPLETE part sets
            case ((v, n), parts) if parts.size == n => (v, Some(n): Option[Int])
          }
          (single ++ multi).sortBy(_._1).lastOption
        }
      }
    }
    val checkpointVersion = checkpointInfo.map(_._1)

    def checkpointPaths(cv: Long, parts: Option[Int]): Seq[java.nio.file.Path] = {
      val ps = parts match {
        case None => Seq(logDir.resolve(f"$cv%020d.checkpoint.parquet"))
        case Some(n) =>
          require(n >= 1, s"delta_scan: _last_checkpoint has parts=$n")
          (1 to n).map(i =>
            logDir.resolve(f"$cv%020d.checkpoint.$i%010d.$n%010d.parquet"))
      }
      ps.foreach(p => require(Files.exists(p),
        s"delta_scan: checkpoint part missing: $p"))
      ps
    }

    val versions = {
      val l = Files.list(logDir)
      try l.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.matches("\\d{20}\\.json") => n.stripSuffix(".json").toLong }
        .toSeq.sorted
      finally l.close()
    }
    val known = versions ++ checkpointVersion
    require(known.nonEmpty, s"empty Delta log: $logDir")
    // timestamp pin (delta_scan's TIMESTAMP option): resolve to the LAST
    // version committed at or before the pin. The commit time comes from
    // the version's commitInfo action when present (DeltaWrite records it
    // as the FIRST line, so only one line is read), else the log file's
    // mtime — delta's own fallback order. A truncated log resolves
    // against the checkpoint version too (mtime proxy), since its
    // snapshot is still fully reconstructible.
    val fromTimestamp: Option[Long] = timestampAsOf.map { ts =>
      def commitMillis(v: Long): Long = {
        val f = logDir.resolve(f"$v%020d.json")
        val reader = Files.newBufferedReader(f)
        val first =
          try Option(reader.readLine()).getOrElse("")
          finally reader.close()
        val fromInfo =
          if (first.trim.isEmpty) None
          else scala.util.Try(
            (JsonMethods.parse(first) \ "commitInfo" \ "timestamp").extractOpt[Long]
          ).toOption.flatten // unparseable first line -> mtime fallback
        fromInfo.getOrElse(Files.getLastModifiedTime(f).toMillis)
      }
      val dated = versions.map(v => v -> commitMillis(v)) ++
        checkpointInfo.collect {
          case (cv, parts) if !versions.contains(cv) =>
            cv -> Files.getLastModifiedTime(checkpointPaths(cv, parts).head).toMillis
        }
      val at = dated.filter(_._2 <= ts).map(_._1)
      require(at.nonEmpty,
        s"delta_scan: no commit at or before timestamp $ts — earliest surviving " +
          s"version is ${dated.minByOption(_._2).map(d => s"v${d._1} (committed ${d._2})")
            .getOrElse("<none>")}")
      at.max
    }
    val target = versionAsOf.orElse(fromTimestamp).getOrElse(known.max)
    require(known.contains(target),
      s"version $target not in Delta log (have ${known.min}..${known.max})")

    var schema: StructType = null
    var partitionColumns: Seq[String] = Nil
    var configuration: Map[String, String] = Map.empty
    var protocol: Protocol = Protocol(1, 2)
    var tableId: String = ""
    // insertion-ordered so the scan reads files in commit order. The spec
    // reconciles file actions on (path, deletionVector.uniqueId) — the key
    // delta-spark's InMemoryLogReplay and delta-kernel's FileActionKey use —
    // NOT path alone: a single commit may carry remove(f, dvOld) +
    // add(f, dvNew) in either order, and a path-keyed map would let the
    // remove drop the live add.
    val active = scala.collection.mutable.LinkedHashMap.empty[(String, String), AddFile]
    def dvUid(dv: Option[DeletionVectors.Descriptor]): String =
      dv.map(_.uniqueId).getOrElse("")

    val fromCheckpoint = checkpointInfo.filter(_._1 <= target)
    fromCheckpoint.foreach { case (cv, parts) =>
      // checkpoint rows carry one non-null action column each; removes
      // are tombstones for already-vacuumed files — not active state
      val cpPaths = checkpointPaths(cv, parts).map(_.toString)
      val cp = spark.read.parquet(cpPaths: _*)
      val cols = cp.columns.toSet
      def structHas(c: String, f: String): Boolean = cols.contains(c) &&
        cp.schema(c).dataType.asInstanceOf[StructType].fieldNames.contains(f)
      val rows = cp.select(
        (if (cols.contains("protocol")) col("protocol.minReaderVersion") else lit(null))
          .as("minReader"),
        (if (structHas("protocol", "readerFeatures")) col("protocol.readerFeatures")
          else lit(null)).cast("array<string>").as("readerFeatures"),
        (if (cols.contains("protocol")) col("protocol.minWriterVersion") else lit(null))
          .cast("int").as("minWriter"),
        (if (structHas("protocol", "writerFeatures")) col("protocol.writerFeatures")
          else lit(null)).cast("array<string>").as("writerFeatures"),
        (if (cols.contains("metaData")) col("metaData.schemaString") else lit(null))
          .as("schemaString"),
        (if (cols.contains("metaData")) col("metaData.partitionColumns") else lit(null))
          .cast("array<string>").as("partCols"),
        (if (structHas("metaData", "configuration")) col("metaData.configuration")
          else lit(null)).cast("map<string,string>").as("tblConf"),
        (if (cols.contains("add")) col("add.path") else lit(null)).as("addPath"),
        (if (cols.contains("add")) col("add.partitionValues") else lit(null))
          .cast("map<string,string>").as("addPv"),
        (if (cols.contains("add")) col("add.size") else lit(null))
          .cast("long").as("addSize"),
        (if (structHas("add", "deletionVector")) col("add.deletionVector")
          else lit(null)).as("addDv"),
        (if (structHas("metaData", "id")) col("metaData.id") else lit(null))
          .cast("string").as("metaId")).collect()
      rows.foreach { r =>
        if (!r.isNullAt(0)) {
          val rf = if (r.isNullAt(1)) Nil else r.getSeq[String](1)
          checkProtocol(r.getInt(0), rf)
          protocol = Protocol(r.getInt(0),
            if (r.isNullAt(2)) 2 else r.getInt(2), rf,
            if (r.isNullAt(3)) Nil else r.getSeq[String](3))
        }
        if (!r.isNullAt(4)) {
          schema = DataType.fromJson(r.getString(4)).asInstanceOf[StructType]
          partitionColumns = if (r.isNullAt(5)) Nil else r.getSeq[String](5)
          configuration = if (r.isNullAt(6)) Map.empty
            else r.getMap[String, String](6).toMap
          if (!r.isNullAt(11)) tableId = r.getString(11)
        }
        if (!r.isNullAt(7)) {
          val pv = if (r.isNullAt(8)) Map.empty[String, String]
            else r.getMap[String, String](8).toMap
          val path = decodePath(r.getString(7))
          val size = if (r.isNullAt(9)) 0L else r.getLong(9)
          val dv = if (r.isNullAt(10)) None else {
            val d = r.getStruct(10)
            Some(DeletionVectors.Descriptor(
              d.getAs[String]("storageType"), d.getAs[String]("pathOrInlineDv"),
              Option(d.getAs[Number]("offset")).map(_.longValue),
              d.getAs[Number]("sizeInBytes").longValue,
              d.getAs[Number]("cardinality").longValue))
          }
          active((path, dvUid(dv))) = AddFile(path, pv, size, dv)
        }
      }
    }

    val replayFrom = fromCheckpoint.map(_._1 + 1).getOrElse(0L)
    val toReplay = versions.filter(v => v >= replayFrom && v <= target)
    if (fromCheckpoint.isEmpty && versions.nonEmpty)
      require(versions.min == 0L,
        s"delta_scan: log is truncated before version ${versions.min} and version " +
          s"$target precedes the checkpoint — cannot reconstruct")

    for (v <- toReplay) {
      val lines = Files.readAllLines(logDir.resolve(f"$v%020d.json")).asScala
      for (line <- lines if line.trim.nonEmpty) {
        val j = JsonMethods.parse(line)
        (j \ "protocol") match {
          case JNothing =>
          case p =>
            val minReader = (p \ "minReaderVersion").extractOpt[Int].getOrElse(1)
            val rf = (p \ "readerFeatures").extractOpt[Seq[String]].getOrElse(Nil)
            checkProtocol(minReader, rf)
            protocol = Protocol(minReader,
              (p \ "minWriterVersion").extractOpt[Int].getOrElse(2), rf,
              (p \ "writerFeatures").extractOpt[Seq[String]].getOrElse(Nil))
        }
        (j \ "metaData") match {
          case JNothing =>
          case m =>
            schema = DataType.fromJson((m \ "schemaString").extract[String])
              .asInstanceOf[StructType]
            partitionColumns = (m \ "partitionColumns").extract[Seq[String]]
            configuration = (m \ "configuration")
              .extractOpt[Map[String, String]].getOrElse(Map.empty)
            (m \ "id").extractOpt[String].foreach(tableId = _)
        }
        (j \ "add") match {
          case JNothing =>
          case a =>
            val path = decodePath((a \ "path").extract[String])
            val pv = (a \ "partitionValues").extractOpt[Map[String, String]].getOrElse(Map.empty)
            val size = (a \ "size").extractOpt[Long].getOrElse(0L)
            val dv = (a \ "deletionVector") match {
              case JNothing | JNull => None
              case d => Some(DeletionVectors.Descriptor(
                (d \ "storageType").extract[String],
                (d \ "pathOrInlineDv").extract[String],
                (d \ "offset").extractOpt[Long],
                (d \ "sizeInBytes").extract[Long],
                (d \ "cardinality").extract[Long]))
            }
            active((path, dvUid(dv))) = AddFile(path, pv, size, dv)
        }
        (j \ "remove") match {
          case JNothing =>
          case r =>
            val dv = (r \ "deletionVector") match {
              case JNothing | JNull => None
              case d => Some(DeletionVectors.Descriptor(
                (d \ "storageType").extract[String],
                (d \ "pathOrInlineDv").extract[String],
                (d \ "offset").extractOpt[Long],
                (d \ "sizeInBytes").extract[Long],
                (d \ "cardinality").extract[Long]))
            }
            active.remove((decodePath((r \ "path").extract[String]), dvUid(dv)))
        }
      }
    }
    require(schema != null, s"Delta log has no metaData action up to version $target")
    // two live adds sharing a path would double-read the file's rows — a
    // writer bug (stale (path, dvOld) never tombstoned); fail loudly here
    // rather than return duplicated data
    val dupPaths = active.keys.groupBy(_._1).collect { case (p, ks) if ks.size > 1 => p }
    require(dupPaths.isEmpty,
      s"delta_scan: corrupt log — multiple live add actions for path(s) " +
        s"${dupPaths.take(3).mkString(", ")} (a remove must carry the DV uniqueId " +
        "of the add it tombstones)")
    val cmMode = configuration.getOrElse("delta.columnMapping.mode", "none")
    require(cmMode == "none" || cmMode == "name" || cmMode == "id",
      s"delta_scan: unknown columnMapping.mode $cmMode")
    Snapshot(target, schema, partitionColumns, active.values.toSeq, tablePath,
      configuration, protocol, tableId)
  }

  /** Scan a Delta table as a DataFrame.
    *
    * @param versionAsOf time travel: read the snapshot as of this version
    * @param partitionPruner log-level pruning: keeps only files whose
    *   `partitionValues` satisfy the predicate (applied to the partition
    *   columns BEFORE any data file is opened — the Delta log acting as
    *   the partition index, like the reference's delta file skipping)
    */
  def scan(spark: SparkSession, tablePath: String,
           versionAsOf: Option[Long] = None,
           partitionPruner: Map[String, String] => Boolean = _ => true,
           timestampAsOf: Option[Long] = None): DataFrame =
    scanSnapshot(spark, snapshot(spark, tablePath, versionAsOf, timestampAsOf),
      partitionPruner)

  /** Scan a PREBUILT snapshot — one log replay serves both pruning and
    * reading (scanWhere), and the file set is pinned: no concurrent
    * commit can slip between deriving the pruner and reading.
    */
  def scanSnapshot(spark: SparkSession, snap: Snapshot,
                   partitionPruner: Map[String, String] => Boolean = _ => true): DataFrame = {
    val tablePath = snap.tablePath
    // under columnMapping (mode name/id) the parquet files carry PHYSICAL
    // column names (spec: delta.columnMapping.physicalName, present in
    // both modes): read with the physical schema, rename back to logical
    // after the scan. Nested fields rename recursively; the logical cast
    // below restores inner names positionally.
    val dataFields = snap.schema.fields.filterNot(f =>
      snap.partitionColumns.contains(f.name))
    val dataSchema = snap.physicalType(StructType(dataFields)).asInstanceOf[StructType]
    // the pruner speaks LOGICAL names; log partitionValues are keyed
    // physically under column mapping — translate before pruning
    val physToLogical: Map[String, String] = snap.partitionColumns
      .map(c => snap.physicalName(snap.schema(c)) -> c).toMap
    val kept = snap.files.filter(f => partitionPruner(
      if (snap.columnMappingMode == "none") f.partitionValues
      else f.partitionValues.map { case (k, v) => (physToLogical.getOrElse(k, k), v) }))
    val orderedCols: Seq[Column] = snap.schema.fields.toSeq.map(f => col(f.name))

    def readGroup(files: Seq[AddFile], pv: Map[String, String]): DataFrame = {
      // files carrying a deletion vector read INDIVIDUALLY: the file's
      // physical row positions (`_metadata.row_index`) anti-join the
      // decoded DV indexes (broadcast — a DV is bounded by one file's
      // row count). Plain files read together as before. Matching per
      // file by construction — no path/name suffix heuristics.
      val (withDv, plain) = files.partition(_.dv.isDefined)
      val parts: Seq[DataFrame] =
        (if (plain.nonEmpty)
          Seq(spark.read.schema(dataSchema)
            .parquet(plain.map(f => s"$tablePath/${f.path}"): _*))
        else Nil) ++
        withDv.map { f =>
          val deleted = DeletionVectors.read(tablePath, f.dv.get)
          val dvDf = spark.createDataFrame(
            spark.sparkContext.parallelize(
              deleted.toIndexedSeq.map(org.apache.spark.sql.Row(_)), 1),
            StructType(Seq(org.apache.spark.sql.types.StructField(
              "_graft_del_ri", org.apache.spark.sql.types.LongType, nullable = false))))
          val read = spark.read.schema(dataSchema).parquet(s"$tablePath/${f.path}")
            .withColumn("_graft_ri", col("_metadata.row_index"))
          read.join(org.apache.spark.sql.functions.broadcast(dvDf),
              read("_graft_ri") === dvDf("_graft_del_ri"), "left_anti")
            .drop("_graft_ri")
        }
      val read = parts.reduce(_ unionAll _)
      // physical → logical rename (no-op without column mapping); the
      // cast restores logical NESTED field names positionally
      val base =
        if (snap.columnMappingMode == "none") read
        else read.select(dataFields.toSeq.map(f =>
          col(snap.physicalName(f)).cast(f.dataType).as(f.name)): _*)
      // partition values live in the LOG, not the files, keyed by the
      // PHYSICAL column name: attach them as literals cast to the
      // declared type (Delta serializes them as strings)
      snap.partitionColumns.foldLeft(base) { (df, c) =>
        val f = snap.schema(c)
        val v = pv.get(snap.physicalName(f)).orNull
        df.withColumn(c, (if (v == null) lit(null) else lit(v)).cast(f.dataType))
      }
    }

    if (kept.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    } else if (snap.partitionColumns.isEmpty) {
      readGroup(kept, Map.empty).select(orderedCols: _*)
    } else {
      // one parquet read per distinct partition tuple (a real warehouse
      // layout has few partitions per query after pruning); union them
      kept.groupBy(_.partitionValues).map { case (pv, fs) => readGroup(fs, pv) }
        .map(_.select(orderedCols: _*))
        .reduce(_ unionAll _)
    }
  }

  /** Scan with PREDICATE-driven log-level pruning — the reference's
    * `delta_scan` shape: the caller passes an ordinary filter `Column`;
    * its restriction to the partition columns prunes files from the LOG
    * before any footer is opened, and the full predicate still applies
    * to the surviving rows (residual filters push into the parquet scan
    * as usual).
    *
    * Mechanics (driver-side, O(distinct partition tuples) — metadata):
    * the snapshot's distinct partition tuples become a tiny local
    * DataFrame, the predicate filters it, and only files whose tuple
    * survives are read. A predicate referencing non-partition columns is
    * handled by the conjunct semantics of `Column.filter` on that tiny
    * frame being unevaluable — so only predicates expressible over the
    * partition columns should be passed for pruning; anything else
    * belongs in the normal `.filter` over the scan. The convenience
    * overload below composes both.
    */
  def scanWhere(spark: SparkSession, tablePath: String, predicate: Column,
                versionAsOf: Option[Long] = None,
                timestampAsOf: Option[Long] = None): DataFrame = {
    // ONE snapshot serves pruner derivation AND the read — the file set
    // is pinned against concurrent commits, and the log replays once
    val snap = snapshot(spark, tablePath, versionAsOf, timestampAsOf)
    scanSnapshot(spark, snap, prunerFor(spark, snap, predicate))
      .filter(predicate)
  }

  /** Derive a partition-value pruner from a predicate: keep exactly the
    * partition tuples the predicate can accept. Tuples are evaluated
    * TYPED (the log stores strings; they cast to the declared types
    * first, same as the scan's value attachment). If the predicate
    * references any non-partition column, pruning degrades to keep-all —
    * never to wrong answers.
    */
  private def prunerFor(spark: SparkSession, snap: Snapshot,
                        predicate: Column): Map[String, String] => Boolean = {
    if (snap.partitionColumns.isEmpty) return _ => true
    // the Column is UNRESOLVED here — its referenced names live in
    // UnresolvedAttribute nodes, not in `references` (empty pre-analysis)
    val refs = org.apache.spark.sql.graft.bridge.expression(predicate).collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name
      case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
    }.toSet
    if (refs.isEmpty || !refs.subsetOf(snap.partitionColumns.toSet)) return _ => true

    // carry the RAW log strings through the filter: the predicate sees
    // typed columns, the survivor set keeps the exact strings the log
    // uses, so the membership test below is byte-faithful
    val tuples = snap.files.map(_.partitionValues).distinct
    val pvSchema = StructType(snap.partitionColumns.map(c =>
      org.apache.spark.sql.types.StructField(s"_graft_raw_$c", StringType)).toSeq)
    val asRows = tuples.map(pv =>
      org.apache.spark.sql.Row(snap.partitionColumns.map(c => pv.get(c).orNull): _*))
    val typed = snap.partitionColumns.foldLeft(
      spark.createDataFrame(spark.sparkContext.parallelize(asRows, 1), pvSchema)) {
      (df, c) =>
        df.withColumn(c, col(s"_graft_raw_$c").cast(snap.schema(c).dataType))
    }
    try {
      val surviving = typed.filter(predicate)
        .select(snap.partitionColumns.map(c => col(s"_graft_raw_$c")): _*)
        .collect()
        .map(r => snap.partitionColumns.zipWithIndex
          .map { case (c, i) => c -> (if (r.isNullAt(i)) null else r.getString(i)) }.toMap)
        .toSet
      pv => surviving.contains(
        snap.partitionColumns.map(c => c -> pv.get(c).orNull).toMap)
    } catch {
      // any analysis surprise degrades to keep-all, never to wrong answers
      case _: org.apache.spark.sql.AnalysisException => _ => true
    }
  }

  /** DESCRIBE HISTORY: one row per surviving JSON commit (newest first) —
    * version, commit timestamp, operation — from the leading `commitInfo`
    * action ([[DeltaWrite.commit]] writes it; external writers that omit
    * it fall back to the log file's mtime and operation null, delta's own
    * order). Checkpoint-truncated versions are absent, same as
    * delta-spark's history after log cleanup. Driver-side O(commits)
    * metadata — one line read per version.
    */
  def history(spark: SparkSession, tablePath: String): DataFrame = {
    val logDir = Paths.get(tablePath, "_delta_log")
    require(Files.isDirectory(logDir), s"not a Delta table (no _delta_log): $tablePath")
    val l = Files.list(logDir)
    val versions =
      try l.iterator().asScala.map(_.getFileName.toString)
        .collect { case n if n.matches("\\d{20}\\.json") => n.stripSuffix(".json").toLong }
        .toSeq.sorted
      finally l.close()
    val rows = versions.sorted(Ordering[Long].reverse).map { v =>
      val f = logDir.resolve(f"$v%020d.json")
      val reader = Files.newBufferedReader(f)
      val first = try Option(reader.readLine()).getOrElse("") finally reader.close()
      val info =
        if (first.trim.isEmpty) None
        else scala.util.Try(JsonMethods.parse(first) \ "commitInfo").toOption
          .filter(_ != JNothing)
      val ts = info.flatMap(i => (i \ "timestamp").extractOpt[Long])
        .getOrElse(Files.getLastModifiedTime(f).toMillis)
      val op = info.flatMap(i => (i \ "operation").extractOpt[String]).orNull
      org.apache.spark.sql.Row(v, new java.sql.Timestamp(ts), op)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("timestamp", org.apache.spark.sql.types.TimestampType, nullable = false),
      StructField("operation", StringType, nullable = true))))
  }

  /** Incremental (streaming-source-style) read of the commits in
    * `(fromVersion, toVersion]`: the rows each commit ADDED, tagged with a
    * `_commit_version` column — the shape an incremental 100 TB pipeline
    * consumes (process only the new data since the last run, never rescan
    * the table). Reference analog: the delta extension's snapshot reads
    * (`extension/delta/src/functions/delta_scan.cpp`) compose with DuckDB
    * incremental consumers; here the log IS the change index.
    *
    * Semantics (matching delta-spark's streaming source):
    *  - `add` actions with `dataChange=false` (OPTIMIZE rewrites) are
    *    SKIPPED — the protocol's contract is that they rearrange existing
    *    rows, so an incremental consumer must not see them again. This is
    *    exactly why [[DeltaWrite.optimize]] stamps its actions.
    *  - a `remove` with `dataChange=true` in the window means a commit
    *    rewrote logical content (DELETE/MERGE): throws by default, or with
    *    `ignoreChanges=true` the rewritten files surface as adds — the
    *    consumer may reprocess surviving rows (at-least-once, delta-spark's
    *    documented `ignoreChanges` contract).
    *  - an absent `dataChange` field (pre-OPTIMIZE writers) reads as true.
    *
    * Requires the JSON commits in the window to survive log truncation
    * (same contract as time travel); the schema/column-mapping/protocol
    * context is the end-version snapshot's.
    */
  def scanChanges(spark: SparkSession, tablePath: String,
                  fromVersion: Long, toVersion: Long = Long.MaxValue,
                  ignoreChanges: Boolean = false): DataFrame = {
    val logDir = Paths.get(tablePath, "_delta_log")
    require(Files.isDirectory(logDir), s"not a Delta table (no _delta_log): $tablePath")
    val versions = {
      val l = Files.list(logDir)
      try l.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.matches("\\d{20}\\.json") => n.stripSuffix(".json").toLong }
        .toSeq.sorted
      finally l.close()
    }
    val target = versions.filter(_ <= toVersion).maxOption.getOrElse(
      throw new IllegalArgumentException(
        s"delta_scan: no surviving commit at or below version $toVersion"))
    val window = versions.filter(v => v > fromVersion && v <= target)
    require(window == ((fromVersion + 1) to target),
      s"delta_scan: log truncated inside ($fromVersion, $target] — " +
        "incremental read cannot skip commits")
    val snap = snapshot(spark, tablePath, versionAsOf = Some(target))

    val withVersion = snap.schema.add(StructField("_commit_version", LongType,
      nullable = false))
    val perVersion: Seq[DataFrame] = window.flatMap { v =>
      val adds = scala.collection.mutable.ArrayBuffer.empty[AddFile]
      for (line <- Files.readAllLines(logDir.resolve(f"$v%020d.json")).asScala
           if line.trim.nonEmpty) {
        val j = JsonMethods.parse(line)
        (j \ "add") match {
          case JNothing =>
          case a if (a \ "dataChange").extractOpt[Boolean].getOrElse(true) =>
            val dv = (a \ "deletionVector") match {
              case JNothing | JNull => None
              case d => Some(DeletionVectors.Descriptor(
                (d \ "storageType").extract[String],
                (d \ "pathOrInlineDv").extract[String],
                (d \ "offset").extractOpt[Long],
                (d \ "sizeInBytes").extract[Long],
                (d \ "cardinality").extract[Long]))
            }
            adds += AddFile(decodePath((a \ "path").extract[String]),
              (a \ "partitionValues").extractOpt[Map[String, String]].getOrElse(Map.empty),
              (a \ "size").extractOpt[Long].getOrElse(0L), dv)
          case _ => // dataChange=false: OPTIMIZE-style rearrangement, skip
        }
        (j \ "remove") match {
          case JNothing =>
          case r if (r \ "dataChange").extractOpt[Boolean].getOrElse(true) &&
                    !ignoreChanges =>
            throw new UnsupportedOperationException(
              s"delta_scan: version $v removed data (DELETE/MERGE rewrite); " +
                "pass ignoreChanges=true to read the rewritten files as adds " +
                "(consumers may see reprocessed rows)")
          case _ =>
        }
      }
      if (adds.isEmpty) None
      else Some(scanSnapshot(spark, snap.copy(version = v, files = adds.toSeq))
        .withColumn("_commit_version", lit(v)))
    }
    if (perVersion.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withVersion)
    else perVersion.reduce(_ unionAll _)
  }
}
