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
}
