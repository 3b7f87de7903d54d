package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV dialect auto-detection — the missing half of `spark.read.csv`,
  * which needs `sep`/`quote`/`escape` stated up front while the
  * reference sniffs them from the data (reference:
  * /root/reference/src/execution/operator/csv_scanner/sniffer/
  * dialect_detection.cpp — candidate delimiters × quote rules scored by
  * per-row field-count consistency over a sample, then header/type
  * detection phases; Spark's own schema inference covers the latter two
  * phases, so only dialect detection is rebuilt here).
  *
  * Protocol (phase 1 of the reference sniffer): take the first
  * `sampleBytes` of ONE file, parse it under every (delimiter, quote,
  * escape) candidate with a quote-aware field counter, and score each
  * dialect by (consistent-rows, field-count) — a dialect that yields the
  * same >1 field count on every sampled row beats one that wobbles;
  * ties break toward the candidate order (',' first, '"' first), as the
  * reference does.
  *
  * Scale posture: sniffing is a driver-side O(sampleBytes) read of one
  * file — the same sample-and-decide the reference performs — and the
  * resulting options feed a fully distributed `spark.read.csv`.
  */
object CsvSniffer {

  final case class Dialect(delimiter: Char, quote: Char, escape: Char) {
    /** Datasource options for `spark.read`. */
    def options: Map[String, String] = Map(
      "sep" -> delimiter.toString,
      "quote" -> quote.toString,
      "escape" -> escape.toString)
  }

  // the reference's default search space (dialect_detection.cpp:
  // GetDefaultDelimiter/Quote/Escape), minus the comment-prefix pass
  private val delimiterCandidates = Seq(',', '|', ';', '\t')
  // (quote, escape) rules: doubled-quote (escape == quote), backslash
  private val quoteRules = Seq(('"', '"'), ('"', '\\'), ('\'', '\''))

  /** Count fields per row under a candidate dialect. Returns the list of
    * per-row field counts, or None when the sample is malformed under
    * this dialect (unterminated quote at a row boundary aside — the
    * sample may cut mid-row, so the final partial row is dropped).
    */
  private[graft] def fieldCounts(
      sample: String, d: Dialect): Seq[Int] = {
    val counts = Seq.newBuilder[Int]
    var fields = 1
    var inQuote = false
    var i = 0
    val n = sample.length
    var rowHadData = false
    while (i < n) {
      val c = sample.charAt(i)
      if (inQuote) {
        if (c == d.escape && d.escape != d.quote && i + 1 < n) i += 1
        else if (c == d.quote) {
          // doubled-quote escape inside a quoted field
          if (d.escape == d.quote && i + 1 < n && sample.charAt(i + 1) == d.quote) i += 1
          else inQuote = false
        }
      } else c match {
        case d.quote => inQuote = true; rowHadData = true
        case d.delimiter => fields += 1; rowHadData = true
        case '\n' =>
          if (rowHadData || fields > 1) counts += fields
          fields = 1; rowHadData = false
        case '\r' =>
          // \r\n: swallow, the \n ends the row; a BARE \r (classic-Mac
          // line ending) must itself terminate the row or the whole
          // sample collapses into one row and dialect scoring degrades
          if (!(i + 1 < n && sample.charAt(i + 1) == '\n')) {
            if (rowHadData || fields > 1) counts += fields
            fields = 1; rowHadData = false
          }
        case _ => rowHadData = true
      }
      i += 1
    }
    // the sample may end mid-row: drop the trailing partial row unless
    // the sample is the whole file (ends with a complete line)
    if ((rowHadData || fields > 1) && !inQuote) counts += fields
    counts.result()
  }

  /** Score = (all rows agree on a >1 field count, field count, parsed
    * rows); higher wins. Candidate order breaks ties.
    */
  private def score(counts: Seq[Int]): (Int, Int, Int) = {
    if (counts.isEmpty) (0, 0, 0)
    else {
      val body = if (counts.length > 1) counts.init else counts // tolerate cut tail
      val consistent = body.nonEmpty && body.forall(_ == body.head) && body.head > 1
      (if (consistent) 1 else 0, if (consistent) body.head else 0, body.length)
    }
  }

  /** Read the first `sampleBytes` of `path` (driver-side; one small IO). */
  private def readSample(spark: SparkSession, path: String, sampleBytes: Int): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath)
          .find(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .getOrElse(throw new java.io.FileNotFoundException(s"no data file under $path"))
      else p
    val in = fs.open(target)
    try {
      val buf = new Array[Byte](sampleBytes)
      var off = 0
      var read = 0
      while (off < sampleBytes && read >= 0) {
        read = in.read(buf, off, sampleBytes - off)
        if (read > 0) off += read
      }
      new String(buf, 0, off, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  def sniff(spark: SparkSession, path: String, sampleBytes: Int = 64 * 1024): Dialect = {
    val sample = readSample(spark, path, sampleBytes)
    val candidates = for {
      delim <- delimiterCandidates
      (quote, escape) <- quoteRules
    } yield Dialect(delim, quote, escape)
    // stable max: earlier candidates win ties (the reference's preference
    // order — ',' over '|' over ';' over tab, '"' doubled first)
    var best = candidates.head
    var bestScore = score(fieldCounts(sample, best))
    for (d <- candidates.tail) {
      val s = score(fieldCounts(sample, d))
      if (Ordering[(Int, Int, Int)].compare(s, bestScore) > 0) { best = d; bestScore = s }
    }
    best
  }

  /** Sniff, then read with Spark's header/schema inference — the full
    * auto-CSV path (`read_csv_auto` analog).
    */
  def read(spark: SparkSession, path: String, header: Boolean = true,
      inferSchema: Boolean = true): DataFrame = {
    val d = sniff(spark, path)
    spark.read
      .options(d.options)
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path)
  }

  /** Full sniffer verdict — the reference's `sniff_csv()` table function
    * (/root/reference/src/function/table/sniff_csv.cpp) surfaces the
    * sniffed configuration as a one-row result. Phases 2-4 of the
    * reference sniffer (header detection, per-column type detection,
    * newline detection) run here over the same driver-side sample phase 1
    * (dialect) used.
    */
  final case class SniffResult(
      dialect: Dialect, newline: String, skipRows: Int, hasHeader: Boolean,
      columns: Seq[(String, String)], dateFormat: Option[String],
      timestampFormat: Option[String])

  /** Quote-aware row/field splitter under a sniffed dialect — the tiny
    * driver-side parser used only on the sample (distributed reads go
    * through `spark.read.csv`).
    */
  private[graft] def parseRows(sample: String, d: Dialect): Seq[Seq[String]] = {
    val rows = Seq.newBuilder[Seq[String]]
    var fields = Vector.newBuilder[String]
    val cur = new StringBuilder
    var nFields = 0
    var inQuote = false
    var rowHadData = false
    var i = 0
    val n = sample.length
    def endField(): Unit = { fields += cur.result(); cur.clear(); nFields += 1 }
    def endRow(): Unit = {
      if (rowHadData || nFields > 0) { endField(); rows += fields.result() }
      fields = Vector.newBuilder[String]; nFields = 0; rowHadData = false
    }
    while (i < n) {
      val c = sample.charAt(i)
      if (inQuote) {
        if (c == d.escape && d.escape != d.quote && i + 1 < n) {
          cur.append(sample.charAt(i + 1)); i += 1
        } else if (c == d.quote) {
          if (d.escape == d.quote && i + 1 < n && sample.charAt(i + 1) == d.quote) {
            cur.append(d.quote); i += 1
          } else inQuote = false
        } else cur.append(c)
      } else c match {
        case q if q == d.quote => inQuote = true; rowHadData = true
        case s if s == d.delimiter => endField(); rowHadData = true
        case '\n' => endRow()
        case '\r' =>
          if (!(i + 1 < n && sample.charAt(i + 1) == '\n')) endRow()
        case other => cur.append(other); rowHadData = true
      }
      i += 1
    }
    if ((rowHadData || nFields > 0) && !inQuote) endRow()
    rows.result()
  }

  // type-detection ladder, most to least specific (reference sniffer
  // phase 3, type_detection.cpp: BOOLEAN < BIGINT < DOUBLE < DATE <
  // TIMESTAMP < VARCHAR); names rendered DuckDB-style
  private val dateRe = """\d{4}-\d{2}-\d{2}""".r
  private val tsRe = """\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d+)?""".r
  private def cellIs(tpe: String, v: String): Boolean = tpe match {
    case "BOOLEAN" => v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false")
    case "BIGINT" => v.nonEmpty && v.toLongOption.isDefined
    case "DOUBLE" => v.nonEmpty && v.toDoubleOption.isDefined
    case "DATE" => dateRe.matches(v)
    case "TIMESTAMP" => tsRe.matches(v)
    case _ => true // VARCHAR
  }
  private val typeLadder = Seq("BOOLEAN", "BIGINT", "DOUBLE", "DATE", "TIMESTAMP")
  private def inferType(values: Seq[String]): String = {
    val nonNull = values.filter(_.nonEmpty)
    if (nonNull.isEmpty) "VARCHAR"
    else typeLadder.find(t => nonNull.forall(cellIs(t, _))).getOrElse("VARCHAR")
  }

  def sniffAll(spark: SparkSession, path: String,
      sampleBytes: Int = 64 * 1024): SniffResult = {
    val sample = readSample(spark, path, sampleBytes)
    val d = sniff(spark, path, sampleBytes)
    val newline =
      if (sample.contains("\r\n")) "\\r\\n"
      else if (sample.contains("\r")) "\\r"
      else "\\n"
    val rowsAll = parseRows(sample, d)
    // a sample may cut mid-row: drop the possibly-partial tail unless the
    // sample holds the whole file
    val rows = if (sample.length == sampleBytes && rowsAll.length > 1)
      rowsAll.init else rowsAll
    val width = if (rows.isEmpty) 0 else rows.map(_.length).max
    val pad = rows.map(r => r.padTo(width, ""))
    // header detection (reference phase 2): the first row is a header when
    // some column's body-inferred type is non-VARCHAR and the first-row
    // cell does NOT parse as it; all-VARCHAR tables fall back to
    // "distinct, non-empty, non-numeric first row"
    val body = if (pad.length > 1) pad.tail else pad
    val bodyTypes = (0 until width).map(c => inferType(body.map(_(c))))
    val hasHeader = pad.length > 1 && {
      val first = pad.head
      val mismatch = (0 until width).exists(c =>
        bodyTypes(c) != "VARCHAR" && !cellIs(bodyTypes(c), first(c)))
      mismatch || (bodyTypes.forall(_ == "VARCHAR") &&
        first.forall(_.nonEmpty) && first.distinct.length == first.length &&
        first.forall(v => !cellIs("DOUBLE", v)))
    }
    val names =
      if (hasHeader) pad.head.zipWithIndex.map { case (h, i) =>
        if (h.nonEmpty) h else s"column${"%02d".format(i)}" }
      else (0 until width).map(i => s"column${"%02d".format(i)}")
    val types = if (hasHeader) bodyTypes
      else (0 until width).map(c => inferType(pad.map(_(c))))
    val cols = names.zip(types).toSeq
    SniffResult(d, newline, 0, hasHeader, cols,
      dateFormat = if (types.contains("DATE")) Some("%Y-%m-%d") else None,
      timestampFormat = None)
  }

  /** The sniff verdict as a one-row DataFrame with the reference's
    * sniff_csv column set (sniff_csv.cpp CSVSniffBind): Delimiter, Quote,
    * Escape, NewLineDelimiter, Comment, SkipRows, HasHeader, Columns,
    * DateFormat, TimestampFormat, UserArguments, Prompt.
    *
    * `Columns` keeps the reference's list<struct<name,type>> shape —
    * this is the default API, matching sniff_csv's output schema; the
    * hash harness uses [[sniffRowsHashable]].
    */
  def sniffRows(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val r = sniffAll(spark, path)
    def fmt(c: Char): String = if (c == '\'') "''" else c.toString
    val sep = ", "
    val colsSql = r.columns
      .map { case (n, t) => s"'$n': '$t'" }.mkString("{", sep, "}")
    val prompt = s"FROM read_csv('$path'${sep}auto_detect=false$sep" +
      s"delim='${fmt(r.dialect.delimiter)}'${sep}quote='${fmt(r.dialect.quote)}'$sep" +
      s"escape='${fmt(r.dialect.escape)}'${sep}new_line='${r.newline}'$sep" +
      s"skip=${r.skipRows}${sep}header=${r.hasHeader}${sep}columns=$colsSql);"
    val one = spark.range(1)
    one.select(
      lit(r.dialect.delimiter.toString).as("Delimiter"),
      lit(r.dialect.quote.toString).as("Quote"),
      lit(r.dialect.escape.toString).as("Escape"),
      lit(r.newline).as("NewLineDelimiter"),
      lit("").as("Comment"),
      lit(r.skipRows).as("SkipRows"),
      lit(r.hasHeader).as("HasHeader"),
      array(r.columns.map { case (n, t) =>
        struct(lit(n).as("name"), lit(t).as("type")) }: _*).as("Columns"),
      r.dateFormat.map(lit(_)).getOrElse(lit(null)).cast("string").as("DateFormat"),
      r.timestampFormat.map(lit(_)).getOrElse(lit(null)).cast("string")
        .as("TimestampFormat"),
      lit(null).cast("string").as("UserArguments"),
      lit(prompt).as("Prompt"))
  }

  /** Gate-friendly variant: identical rows but `Columns` serialized to a
    * deterministic JSON string. The correctness harness hashes parquet
    * cells through a pandas sort, which cannot order list-typed cells —
    * the reference-shaped default stays [[sniffRows]] and is pinned by
    * CsvSnifferSpec.
    */
  def sniffRowsHashable(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    sniffRows(spark, path)
      .withColumn("Columns", to_json(col("Columns")))
  }
}
