package graft.queries

import java.nio.file.Files

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Source/sink coverage — SURVEY.md §2.1: CSV (sniffer ≙ inferSchema),
  * JSON read/write, COPY TO ... PARTITION_BY ≙ write.partitionBy with
  * partition discovery + pruning on read, and series generation
  * (reference: src/function/table/range.cpp).
  *
  * Round-trip queries write to a session temp dir, read back through the
  * target format's reader (schema inference on), and aggregate — the
  * oracle runs the equivalent aggregation on the original table, so a
  * value match proves the write+read path is lossless.
  */
object Sources {

  private lazy val tmpRoot: String =
    Files.createTempDirectory("graft_sources").toString

  private def roundtripDir(name: String): String = s"$tmpRoot/$name"

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }

  /** Malformed-CSV fixture at a FIXED path so the DuckDB oracle can read
    * the same bytes. 7 good rows; 3 malformed in ways BOTH engines
    * reject: non-numeric int, non-numeric double, extra column. (Short
    * rows are deliberately absent — Spark null-pads them while DuckDB
    * without null_padding rejects them, a documented dialect divergence.)
    * No quotes and no '|' anywhere: the oracle's raw-line count reads
    * the file with delim='|', quote disabled.
    */
  /** Per-JVM unique fixture path: `oracleSql` is rendered by the same
    * process that runs the query, so interpolating this value keeps the
    * two sides pointed at one file while concurrent runs (or leftovers
    * from an older revision) can't collide on a fixed name.
    */
  private[queries] val csvRejectsPath: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_csv_rejects_${
      java.util.UUID.randomUUID().toString.take(8)}.csv"

  /** One scratch CSV fixture per (name, content), at a per-JVM unique
    * path the oracle SQL interpolates — the reference's test/sql/copy/csv
    * option-edge files re-expressed as write-then-both-engines-read.
    */
  private val csvFixturePaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Stable per-JVM path for a named fixture (the oracle SQL interpolates
    * this at map-build time; the query writes the bytes at run time,
    * which precedes the driver's oracle pass).
    */
  private[queries] def csvFixturePath(name: String): String =
    csvFixturePaths.getOrElseUpdate(name,
      s"${System.getProperty("java.io.tmpdir")}/graft_csv_${name}_${
        java.util.UUID.randomUUID().toString.take(8)}.csv")

  private[queries] def csvFixture(name: String, content: String): String = {
    val path = csvFixturePath(name)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    path
  }

  /** As csvFixture but with caller-encoded bytes — the non-UTF8 encoding
    * pins need exact on-disk byte control.
    */
  private[queries] def csvFixtureBytes(name: String, bytes: Array[Byte]): String = {
    val path = csvFixturePath(name)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    path
  }

  /** RFC-quoted pipe-delimited fixture: embedded delimiter, embedded
    * doubled quote, embedded newline inside one quoted field
    * (test/sql/copy/csv/test_quote_default.test + csv dialect sniffing).
    */
  private[queries] val csvQuotedContent =
    "k|name|v\n" +
    "1|\"a|pha\"|1.5\n" +
    "2|\"say \"\"hi\"\"\"|2.5\n" +
    "3|\"two\nlines\"|3.5\n" +
    "4|plain|4.5\n"

  /** Sniffer fixture: ';' dialect with embedded delimiters and doubled
    * quotes — the query side passes NO dialect options
    * (csv_scanner/sniffer/dialect_detection.cpp). */
  private[queries] val csvSniffedContent =
    "k;name;v\n" +
    "1;\"al;pha\";1.5\n" +
    "2;\"say \"\"hi\"\"\";2.25\n" +
    "3;gamma;3.5\n" +
    "4;\"delta\";4.75\n" +
    "5;eps;5.0\n"

  /** Mixed-type columns for the all_varchar / dtypes-override reads
    * (test/sql/copy/csv/csv_dtypes.test): k LOOKS numeric — forcing it
    * to string flips max() to lexicographic ('9' > '100'). */
  private[queries] val csvTypedContent =
    "k,v\n10,1.5\n9,2.5\n100,3.5\n2,4.5\n"

  /** Windows line endings incl. a quoted field
    * (test/sql/copy/csv/csv_windows_mixed_separators.test shape). */
  private[queries] val csvCrlfContent =
    "k,name,v\r\n1,\"al,pha\",1.5\r\n2,beta,2.5\r\n3,gamma,3.5\r\n"

  /** Custom NULL-string fixture (test/sql/copy/csv/csv_nullstr_list.test). */
  private[queries] val csvNullstrContent =
    "k,s,v\n1,alpha,10\n2,NA,20\n3,gamma,NA\n4,NA,NA\n"

  /** Headerless fixture read with caller-supplied names+types
    * (test/sql/copy/csv/csv_names.test).
    */
  private[queries] val csvNoHeaderContent =
    "1,alpha,1.5\n2,beta,2.5\n3,gamma,3.5\n"

  /** Non-ISO date format needing an explicit format string
    * (test/sql/copy/csv/test_date.test / dateformat option).
    */
  private[queries] val csvDateContent =
    "k,d\n1,2024/03/14\n2,1999/12/31\n3,2000/01/01\n"

  /** Short-row fixture for NULL padding
    * (test/sql/copy/csv/csv_null_padding.test): rows 2 and 4 are missing
    * trailing columns.
    */
  private[queries] val csvNullPadContent =
    "k,a,b\n1,x,y\n2,x\n3,p,q\n4\n5,m,n\n"

  /** Quoted-empty vs bare-empty fixture
    * (test/sql/copy/csv/empty_string_quote.test).
    */
  private[queries] val csvEmptyNullContent =
    "k,a\n1,alpha\n2,\"\"\n3,\n4,beta\n"

  /** Single-quote quote char + backslash escape
    * (test/sql/copy/csv/test_quote_escape shapes).
    */
  private[queries] val csvQuoteEscContent =
    "k,s\n1,'al,pha'\n2,'it\\'s'\n3,plain\n"

  /** Rows malformed for an INT,INT schema — the DROPMALFORMED ≙
    * ignore_errors pairing (test/sql/copy/csv/test_ignore_errors.test).
    */
  private[queries] val csvMalformedContent =
    "k,v\n1,10\njunkrow\n3,30\nx,oops\n5,50\n"

  /** Non-ISO timestamp format needing an explicit format string
    * (test/sql/copy/csv/timestampformat shapes).
    */
  private[queries] val csvTsFmtContent =
    "k,t\n1,14/03/2024 05:06:07\n2,31/12/1999 23:59:59\n3,01/01/2000 00:00:00\n"

  /** Header-only file: zero rows, schema preserved
    * (test/sql/copy/csv/empty_first_line / header-only shapes).
    */
  private[queries] val csvHeaderOnlyContent = "k,v\n"

  /** Tab-delimited (test/sql/copy/csv delim option). */
  private[queries] val csvTabContent =
    "k\tv\n1\t1.5\n2\t2.5\n3\t4.0\n"

  /** Boolean column for type inference (csv_dtypes.test bool arm). */
  private[queries] val csvBoolContent =
    "k,b\n1,true\n2,false\n3,true\n4,false\n5,true\n"

  /** JSON document that is one ARRAY (not newline-delimited) —
    * Spark multiLine=true ≙ DuckDB format='array'
    * (test/sql/json read shapes).
    */
  private[queries] val jsonArrayContent =
    """[{"k":1,"v":"alpha","x":1.5},
      | {"k":2,"v":"beta","x":2.5},
      | {"k":3,"v":"gamma","x":3.5}]""".stripMargin

  /** Newline-delimited JSON with missing and explicit-null fields —
    * both read as NULL under an explicit schema.
    */
  private[queries] val jsonMissingContent =
    "{\"k\":1,\"a\":\"x\",\"b\":1.5}\n{\"k\":2}\n" +
    "{\"k\":3,\"a\":null,\"b\":2.5}\n{\"k\":4,\"b\":3.5}\n"

  /** Prefix-garbage lines dropped via skip=N
    * (test/sql/copy/csv/test_skip_parameter.test shape).
    */
  private[queries] val csvSkipContent =
    "report generated 2024-03-14\nsource: warehouse 7\nk,v\n1,10\n2,20\n3,30\n"

  /** Classic-Mac bare-\r line endings read under an EXPLICIT new_line
    * (csv_scanner new_line option; reference state machine's CR arm).
    */
  private[queries] val csvCrContent = "k,v\r1,10\r2,20\r3,30\r"

  /** European decimal separator (read_csv decimal_separator=',').
    * Spark has no such option — the mapping normalizes the separator
    * with a codegen'd translate before the double cast.
    */
  private[queries] val csvDecSepContent = "k;v\n1;2,5\n2;3,25\n3;10,0\n"

  /** Comment-prefixed lines (csv comment option). DuckDB 1.0's read_csv
    * predates the comment parameter, so the oracle is the expected
    * VALUES — the pin checks Spark's comment handling against known
    * bytes rather than differentially.
    */
  private[queries] val csvCommentContent =
    "# heading comment\nk,v\n1,10\n# mid-file comment\n2,20\n3,30\n"

  /** Accented latin-1 text; written as ISO-8859-1 BYTES (not UTF-8) and
    * read back with an explicit charset (reference
    * csv_scanner/encode/csv_encoder.cpp latin-1 arm). VALUES oracle:
    * DuckDB 1.0 read_csv has no encoding parameter.
    */
  private[queries] val csvLatin1Content =
    "k,s\n1,café\n2,naïve\n3,über\n"

  /** Same logical rows as a UTF-16 (BOM) file (csv_encoder.cpp UTF-16
    * arm); Spark reads it via multiLine+encoding. VALUES oracle.
    */
  private[queries] val csvUtf16Content =
    "k,s\n1,alpha✓\n2,betaé\n3,gamma\n"

  /** UTF-16BE without BOM (csv_encoder.cpp distinguishes the BE arm
    * from the BOM-led default); VALUES oracle.
    */
  private[queries] val csvUtf16beContent =
    "k,s\n1,nordé\n2,søster\n3,plain\n"

  /** UTF-16LE without BOM — the third UTF-16 byte-order arm (Spark's
    * CSV charset allowlist: iso-8859-1, us-ascii, utf-16, utf-16be,
    * utf-16le, utf-32, utf-8); VALUES oracle.
    */
  private[queries] val csvUtf16leContent =
    "k,s\n1,léft\n2,façade\n3,plain\n"

  private[queries] def csvRejectsFixture(): String = {
    val path = java.nio.file.Paths.get(csvRejectsPath)
    val content =
      """k,name,v
        |1,alpha,1.5
        |2,beta,2.25
        |x,gamma,3.5
        |4,delta,oops
        |5,epsilon,5.5,extra
        |6,zeta,6.75
        |7,eta,7.5
        |8,theta,8.25
        |9,iota,9.5
        |10,kappa,10.75
        |""".stripMargin
    java.nio.file.Files.write(path,
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    path.toString
  }

  val queries: Map[String, Q.Fn] = Map[String, Q.Fn](
    // CSV write → auto-sniffed read (dialect/header/type inference ≙
    // reference csv_scanner sniffer) → aggregate
    "src_csv_roundtrip" -> { (s, d) =>
      val dir = roundtripDir("csv")
      Tables(s, d, "supplier")
        .write.mode("overwrite").option("header", "true").csv(dir)
      s.read.option("header", "true").option("inferSchema", "true").csv(dir)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("s_acctbal")), 2).as("bal"))
        .orderBy(col("s_nationkey"))
    },

    // JSON-lines write → schema-inferred read → aggregate
    "src_json_roundtrip" -> { (s, d) =>
      val dir = roundtripDir("json")
      Tables(s, d, "part").select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .write.mode("overwrite").json(dir)
      s.read.json(dir)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), round(sum(col("p_retailprice")), 2).as("price"))
        .orderBy(col("p_brand")).limit(100)
    },

    // COPY TO ... PARTITION_BY ≙ partitionBy write; the read-back filter
    // prunes to a single hive partition (verified in SourcesSpec)
    "src_partitioned_write" -> { (s, d) =>
      val dir = roundtripDir("part_by")
      Tables(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
      s.read.parquet(dir)
        .filter(col("l_returnflag") === "R")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"),
          round(sum(col("l_extendedprice")), 2).as("price"))
    },

    // COPY ... (ROW_GROUPS_PER_FILE / FILE_SIZE_BYTES) analog
    // (reference: test/sql/copy/row_groups_per_file.test,
    // file_size_bytes.test): bounded output files via maxRecordsPerFile,
    // read back losslessly across the multi-file layout
    "src_parquet_max_records" -> { (s, d) =>
      val dir = roundtripDir("max_records")
      Tables(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .write.mode("overwrite").option("maxRecordsPerFile", 128).parquet(dir)
      val files = new java.io.File(dir).listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      // the layout really is multi-file — fold the file count into the
      // oracle-checked row so the property is value-gated, not spec-only
      s.read.parquet(dir)
        .agg(count(lit(1)).as("n"), round(sum(col("p_retailprice")), 2).as("retail"),
          lit(files >= 10).as("multi_file"))
    },

    // Parquet modular encryption roundtrip (reference: parquet_crypto
    // .cpp + the `encryption_config` scan option, parquet_extension
    // .cpp:376): footer key + a separate column key for the measures,
    // read back decrypted and aggregated — the oracle runs the same
    // aggregation on the plain table, so a value match proves the
    // encrypt/decrypt roundtrip is lossless (sources/ParquetCrypto.scala)
    "src_parquet_encrypted" -> { (s, d) =>
      val dir = roundtripDir("pme")
      graft.sources.ParquetCrypto.writeEncrypted(
        Tables(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag")),
        dir, "kf", Map("kc" -> Seq("l_extendedprice", "l_quantity")))
      graft.sources.ParquetCrypto.readEncrypted(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"),
          round(sum(col("l_extendedprice")), 2).as("price"))
        .orderBy(col("l_returnflag"))
    },

    // generate_series over timestamps (reference: range.cpp:316)
    "fn_generate_series" -> { (s, d) =>
      s.range(1).select(explode(sequence(
          lit("1995-01-01").cast("timestamp"),
          lit("1995-03-01").cast("timestamp"),
          expr("INTERVAL 1 DAY"))).as("ts"))
        .select(col("ts"), dayofmonth(col("ts")).cast("long").as("dom"))
        .orderBy(col("ts"))
    },

    // custom DataSource V2 table function (reference TableFunction
    // protocol, SURVEY §2.9) with range-filter pushdown into the scan
    "src_dsv2_series" -> { (s, d) =>
      s.read.format("graft.sources.SeriesSource")
        .option("start", 1).option("end", 100000)
        .option("step", 1).option("numPartitions", 8).load()
        .filter(col("value") >= 500 && col("value") <= 99500)
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
    },

    // read_text + glob paths (reference: src/function/table/read_file.cpp,
    // glob.cpp): line-oriented whole-file ingestion. Writes the documents
    // corpus as text files, reads back through a glob over the part files,
    // and aggregates — the oracle aggregates the original table, so a
    // match proves the text write+glob-read path is lossless.
    "src_read_text" -> { (s, d) =>
      val dir = roundtripDir("text")
      Tables(s, d, "documents").select(col("text"))
        .write.mode("overwrite").text(dir)
      s.read.option("pathGlobFilter", "part-*.txt").text(dir) // glob over the parts
        .agg(count(lit(1)).as("n_lines"),
          sum(length(col("value"))).as("n_chars"),
          round(avg(length(col("value"))), 6).as("avg_len"))
    },

    // read_blob ≙ binaryFile source (whole files as binary + metadata);
    // pathGlobFilter exercises the source-level glob option. Total bytes
    // = sum(octet_length(text) + newline) proves content-length fidelity.
    "src_read_blob" -> { (s, d) =>
      val dir = roundtripDir("blob")
      Tables(s, d, "documents").select(col("text"))
        .write.mode("overwrite").text(dir)
      s.read.format("binaryFile").option("pathGlobFilter", "*.txt").load(dir)
        .agg(sum(col("length")).as("total_bytes"),
          sum(length(col("content"))).as("content_bytes"))
    },

    // glob() as a file-LISTING relation (reference:
    // src/function/table/glob.cpp — matched paths as rows, not a read).
    // The corpus is written as exactly 4 text part-files; the listing's
    // (count, total size) must equal the corpus's (4, chars+newlines) —
    // proving the matcher enumerates precisely the part files (no
    // _SUCCESS, no misses) with true sizes.
    "src_glob_list" -> { (s, d) =>
      val dir = roundtripDir("glob_list")
      Tables(s, d, "documents").select(col("text"))
        .repartition(4).write.mode("overwrite").text(dir)
      graft.sources.GlobList.files(s, s"$dir/part-*.txt")
        .agg(count(lit(1)).as("n_files"), sum(col("size")).as("total_bytes"))
    },

    // CSV rejects-table parity (reference: csv_scanner sniffer's rejects
    // table, src/execution/operator/csv_scanner/**): a deliberately
    // malformed fixture read under PERMISSIVE with
    // columnNameOfCorruptRecord ≙ store_rejects. Good rows aggregate;
    // corrupt rows are counted — the DuckDB oracle recomputes both sides
    // from the SAME file (ignore_errors read vs raw line count), so the
    // two engines must agree on WHICH rows are malformed.
    "src_csv_rejects" -> { (s, d) =>
      val path = csvRejectsFixture()
      val schema = "k INT, name STRING, v DOUBLE, _corrupt STRING"
      val rows = s.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        .cache() // Spark disallows filtering on the corrupt column of an un-materialized CSV scan
      rows.agg(
        count(when(col("_corrupt").isNull, 1)).as("n_good"),
        count(col("_corrupt")).as("n_rejects"),
        sum(when(col("_corrupt").isNull, col("k"))).cast("long").as("sum_k"),
        round(sum(when(col("_corrupt").isNull, col("v"))), 2).as("sum_v"))
    },

    // RFC-quoted CSV dialect: '|' delimiter inside quotes, doubled
    // embedded quotes, a quoted embedded newline (Spark needs
    // multiLine=true for in-field newlines; escape='"' selects RFC
    // doubling over its backslash default — the same dialect DuckDB's
    // sniffer lands on)
    "src_csv_quoted_dialect" -> { (s, d) =>
      val path = csvFixture("quoted", csvQuotedContent)
      s.read
        .option("header", "true").option("sep", "|")
        .option("quote", "\"").option("escape", "\"")
        .option("multiLine", "true")
        .option("inferSchema", "true")
        .csv(path)
        .agg(count(lit(1)).as("n"),
          sum(length(col("name"))).cast("long").as("name_chars"),
          round(sum(col("v")), 2).as("sum_v"))
    },

    // dialect AUTO-detection (reference csv_scanner/sniffer/
    // dialect_detection.cpp): ';' delimiter, embedded delimiters and
    // doubled quotes inside quoted fields — read with NO explicit sep/
    // quote/escape; sources/CsvSniffer scores the candidate dialects on
    // a sample and feeds the winner to spark.read
    "src_csv_sniffed" -> { (s, d) =>
      val path = csvFixture("sniffed", csvSniffedContent)
      graft.sources.CsvSniffer.read(s, path)
        .agg(count(lit(1)).as("n"),
          sum(length(col("name"))).cast("long").as("name_chars"),
          round(sum(col("v")), 2).as("sum_v"))
    },

    // ALL_VARCHAR ≙ inferSchema=false: every column reads as string, so
    // max() on the numeric-looking key goes lexicographic
    // (test/sql/copy/csv/csv_dtypes.test's all-varchar arm)
    "src_csv_all_varchar" -> { (s, d) =>
      val path = csvFixture("typed", csvTypedContent)
      s.read.option("header", "true").option("inferSchema", "false").csv(path)
        .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"),
          min(col("v")).as("min_v"))
    },

    // explicit per-column type override beats inference: k pinned to
    // VARCHAR while v stays numeric (csv_dtypes.test)
    "src_csv_dtypes" -> { (s, d) =>
      val path = csvFixture("typed", csvTypedContent)
      s.read.option("header", "true").schema("k STRING, v DOUBLE").csv(path)
        .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"),
          round(sum(col("v")), 2).as("sum_v"))
    },

    // Windows \r\n line endings with a quoted embedded comma
    "src_csv_crlf" -> { (s, d) =>
      val path = csvFixture("crlf", csvCrlfContent)
      s.read.option("header", "true").option("inferSchema", "true").csv(path)
        .agg(count(lit(1)).as("n"),
          sum(length(col("name"))).cast("long").as("name_chars"),
          round(sum(col("v")), 2).as("sum_v"))
    },

    // filename column ≙ read_csv(filename=true): group by the file's
    // basename (full paths are engine-prefixed, the basename is shared)
    "src_csv_filename" -> { (s, d) =>
      val path = csvFixture("typed", csvTypedContent)
      s.read.option("header", "true").option("inferSchema", "true").csv(path)
        .select(element_at(split(col("_metadata").getField("file_path"), "/"), -1)
          .as("fname"))
        .groupBy(col("fname")).agg(count(lit(1)).as("n"))
        .orderBy(col("fname"))
    },

    // custom NULL marker: 'NA' in any column reads as NULL, in both the
    // string and the numeric column
    "src_csv_nullstr" -> { (s, d) =>
      val path = csvFixture("nullstr", csvNullstrContent)
      s.read
        .option("header", "true").option("nullValue", "NA")
        .schema("k INT, s STRING, v INT")
        .csv(path)
        .agg(count(lit(1)).as("n"), count(col("s")).as("n_s"),
          count(col("v")).as("n_v"),
          sum(col("v")).cast("long").as("sum_v"))
    },

    // headerless file + caller-supplied column names and types
    "src_csv_no_header_names" -> { (s, d) =>
      val path = csvFixture("noheader", csvNoHeaderContent)
      s.read
        .option("header", "false")
        .schema("k BIGINT, name STRING, v DOUBLE")
        .csv(path)
        .select(col("k"), col("name"), col("v"))
        .orderBy(col("k"))
    },

    // non-ISO dateformat: the format string drives parsing on both sides
    "src_csv_dateformat" -> { (s, d) =>
      val path = csvFixture("datefmt", csvDateContent)
      s.read
        .option("header", "true").option("dateFormat", "yyyy/MM/dd")
        .schema("k INT, d DATE")
        .csv(path)
        .select(col("k"), col("d"), year(col("d")).cast("int").as("y"))
        .orderBy(col("k"))
    },

    // hive-partitioned CSV tree: COPY TO ... PARTITION_BY over csv, read
    // back with partition discovery; the partition column lives in the
    // DIRECTORY NAMES, not the files, on both engines
    "src_csv_hive_partitions" -> { (s, d) =>
      val dir = roundtripDir("csv_hive")
      Tables(s, d, "supplier")
        .select(col("s_suppkey"), col("s_acctbal"), col("s_nationkey"))
        .write.mode("overwrite").option("header", "true")
        .partitionBy("s_nationkey").csv(dir)
      s.read.option("header", "true").option("inferSchema", "true").csv(dir)
        .filter(col("s_nationkey") < 10)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("s_acctbal")), 2).as("bal"))
        .orderBy(col("s_nationkey"))
    },

    // COPY TO with compression (test/sql/copy/csv/csv_write_gz.test_slow):
    // gzip'd CSV write, codec-transparent read-back
    "src_csv_gzip_roundtrip" -> { (s, d) =>
      val dir = roundtripDir("csv_gz")
      Tables(s, d, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .write.mode("overwrite").option("header", "true")
        .option("compression", "gzip").csv(dir)
      s.read.option("header", "true")
        .schema("s_suppkey BIGINT, s_name STRING, s_acctbal DOUBLE").csv(dir)
        .agg(count(lit(1)).as("n"),
          sum(length(col("s_name"))).cast("long").as("name_chars"),
          round(sum(col("s_acctbal")), 2).as("bal"))
    },

    // PER_THREAD_OUTPUT ≙ one file per partition
    // (test/sql/copy/per_thread_output.test): a 4-way repartitioned
    // write must land 4 data files whose union is exactly the input
    "src_csv_per_thread_output" -> { (s, d) =>
      val dir = roundtripDir("csv_threads")
      Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
        .repartition(4)
        .write.mode("overwrite").option("header", "true").csv(dir)
      val files = s.read.option("header", "true")
        .schema("c_custkey BIGINT, c_acctbal DOUBLE").csv(dir)
        .select(input_file_name().as("f"), col("c_custkey"), col("c_acctbal"))
      files.agg(
        countDistinct(col("f")).as("n_files"),
        count(lit(1)).as("n"),
        round(sum(col("c_acctbal")), 2).as("bal"))
    },

    // ROW_GROUPS_PER_FILE ≙ maxRecordsPerFile
    // (test/sql/copy/row_groups_per_file.test): bounded-size parquet
    // files, loss-free union on read-back
    "src_parquet_row_groups" -> { (s, d) =>
      val dir = roundtripDir("pq_rowgroups")
      Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .coalesce(1)
        .write.mode("overwrite").option("maxRecordsPerFile", 500).parquet(dir)
      s.read.parquet(dir)
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
    },

    // parquet codec option (test/sql/copy/parquet round-trips): zstd
    // write, transparent read
    "src_parquet_codec_zstd" -> { (s, d) =>
      val dir = roundtripDir("pq_zstd")
      Tables(s, d, "part")
        .select(col("p_partkey"), col("p_type"), col("p_retailprice"))
        .write.mode("overwrite").option("compression", "zstd").parquet(dir)
      s.read.parquet(dir)
        .groupBy(substring(col("p_type"), 1, 5).as("ty"))
        .agg(count(lit(1)).as("n"), round(sum(col("p_retailprice")), 2).as("price"))
        .orderBy(col("ty")).limit(50)
    },

    // gzip + snappy codecs in one pass: each codec dir holds one full
    // copy, the union read doubles every count (reference: parquet COPY
    // COMPRESSION option, test/sql/copy/parquet/*)
    "src_parquet_codec_gzip_snappy" -> { (s, d) =>
      val base = Tables(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
      val dirG = roundtripDir("pq_gzip")
      val dirS = roundtripDir("pq_snappy")
      base.write.mode("overwrite").option("compression", "gzip").parquet(dirG)
      base.write.mode("overwrite").option("compression", "snappy").parquet(dirS)
      s.read.parquet(dirG, dirS)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), round(sum(col("p_retailprice")), 2).as("price"))
        .orderBy(col("p_brand")).limit(50)
    },

    // DECIMAL column round-trip + predicate over the decimal stats
    // (reference: test/sql/copy/parquet/decimal_filter.test)
    "src_parquet_decimal_filter" -> { (s, d) =>
      val dir = roundtripDir("pq_decimal")
      Tables(s, d, "part")
        .select(col("p_partkey"),
          col("p_retailprice").cast("decimal(12,2)").as("price_dec"))
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .filter(col("price_dec") > lit(new java.math.BigDecimal("1500.00")))
        .agg(count(lit(1)).as("n"),
          round(sum(col("price_dec")).cast("double"), 2).as("total"))
    },

    // nested STRUCT + LIST columns round-trip (reference: parquet nested
    // type tests, test/sql/copy/parquet/writer/): field access and list
    // length survive the format
    "src_parquet_nested_roundtrip" -> { (s, d) =>
      val dir = roundtripDir("pq_nested")
      Tables(s, d, "part")
        .select(col("p_partkey"),
          struct(col("p_brand").as("brand"), col("p_retailprice").as("price")).as("info"),
          split(col("p_name"), " ").as("words"))
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .groupBy(col("info").getField("brand").as("brand"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("info").getField("price")), 2).as("price"),
          sum(size(col("words"))).cast("long").as("n_words"))
        .orderBy(col("brand")).limit(50)
    },

    // all-NULL typed column + TIMESTAMP column round-trip (storage-type
    // coverage: test/sql/storage/ read shapes): null count and the
    // date-cast extremes survive
    "src_parquet_allnull_ts" -> { (s, d) =>
      val dir = roundtripDir("pq_nullts")
      Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          lit(null).cast("int").as("hole"))
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .agg(count(lit(1)).as("n"), count(col("hole")).as("n_hole"),
          min(col("o_orderdate").cast("date")).cast("string").as("d_min"),
          max(col("o_orderdate").cast("date")).cast("string").as("d_max"))
    },

    // nested-object JSON lines: schema inference recovers the struct,
    // field access aggregates match the flat source
    "src_json_nested" -> { (s, d) =>
      val dir = roundtripDir("json_nested")
      Tables(s, d, "part")
        .select(col("p_partkey"),
          struct(col("p_brand").as("brand"), col("p_retailprice").as("price")).as("info"))
        .write.mode("overwrite").json(dir)
      s.read.json(dir)
        .groupBy(col("info").getField("brand").as("brand"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("info").getField("price")), 2).as("price"))
        .orderBy(col("brand")).limit(50)
    },

    // COPY TO ... OVERWRITE (test/sql/copy/csv/copy_to_overwrite.test):
    // the second write fully replaces the first — stale files must not
    // leak into the read-back
    "src_copy_overwrite" -> { (s, d) =>
      val dir = roundtripDir("pq_overwrite")
      val nation = Tables(s, d, "nation")
      nation.filter(col("n_regionkey") <= 1)
        .write.mode("overwrite").parquet(dir)
      nation.filter(col("n_regionkey") >= 2)
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))
    },

    // NULL_PADDING (test/sql/copy/csv/csv_null_padding.test): short rows
    // fill missing trailing columns with NULL instead of erroring
    "src_csv_null_padding" -> { (s, d) =>
      val path = csvFixture("nullpad", csvNullPadContent)
      s.read
        .option("header", "true").option("mode", "PERMISSIVE")
        .schema("k INT, a STRING, b STRING")
        .csv(path)
        .agg(count(lit(1)).as("n"), count(col("a")).as("n_a"),
          count(col("b")).as("n_b"),
          sum(col("k")).cast("long").as("sum_k"))
    },

    // quoted-empty vs unquoted-empty (test/sql/copy/csv/
    // empty_string_quote.test): under BOTH engines' default null
    // dialects (Spark nullValue='', DuckDB allow_quoted_nulls=true) a
    // quoted "" reads as NULL exactly like a bare empty field — the pin
    // is that the two dialects agree, not that they preserve ""
    "src_csv_empty_vs_null" -> { (s, d) =>
      val path = csvFixture("emptynull", csvEmptyNullContent)
      s.read
        .option("header", "true")
        .schema("k INT, a STRING")
        .csv(path)
        .select(col("k"), col("a"), col("a").isNull.as("is_null"),
          (col("a") === lit("")).as("is_empty"))
        .orderBy(col("k"))
    },

    // projection pushdown into the CSV scan (test/sql/copy/csv/
    // csv_projection_pushdown.test): reading 1 of 3 declared columns
    "src_csv_projection" -> { (s, d) =>
      val path = csvFixture("noheader", csvNoHeaderContent)
      s.read
        .option("header", "false")
        .schema("k BIGINT, name STRING, v DOUBLE")
        .csv(path)
        .select(col("v"))
        .agg(round(sum(col("v")), 2).as("sum_v"), count(lit(1)).as("n"))
    },

    // format conversion chain (test/sql/copy/parquet/json_parquet.test):
    // table -> JSON lines -> parquet -> aggregate, loss-free
    "src_json_to_parquet" -> { (s, d) =>
      val jsonDir = roundtripDir("conv_json")
      val pqDir = roundtripDir("conv_pq")
      Tables(s, d, "region").write.mode("overwrite").json(jsonDir)
      s.read.json(jsonDir)
        .select(col("r_regionkey").cast("int"), col("r_name"))
        .write.mode("overwrite").parquet(pqDir)
      s.read.parquet(pqDir)
        .orderBy(col("r_regionkey"))
        .select(col("r_regionkey"), col("r_name"))
    },

    // parquet bloom filters (test/sql/copy/parquet/bloom_filters.test):
    // written per-column, equality scan over the filtered key stays exact
    "src_parquet_bloom_filter" -> { (s, d) =>
      val dir = roundtripDir("pq_bloom")
      Tables(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_quantity"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#l_suppkey", "true")
        .parquet(dir)
      s.read.parquet(dir)
        .filter(col("l_suppkey") === 7)
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
    },

    // prepared-statement surface (reference §3.2) — named parameter
    // binding via spark.sql(text, args)
    "sql_parameterized" -> { (s, d) =>
      Tables(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
          |FROM orders WHERE o_totalprice > :threshold
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
        Map("threshold" -> 300000))
    },

    // json_serialize_sql family: the statement round-trips through its
    // JSON envelope (real Catalyst AST + canonical text — see SqlSerde
    // scaladoc for the execution-replays-text divergence) and the
    // EXECUTED RESULT is what the oracle gates
    "sql_serialize_roundtrip" -> { (s, d) =>
      Tables(s, d, "orders").createOrReplaceTempView("orders")
      val doc = graft.functions.SqlSerde.serialize(s,
        """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
          |FROM orders WHERE o_totalprice > 300000
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      graft.functions.SqlSerde.executeSerialized(s, doc)
    },

    // MERGE semantics (reference: INSERT ... ON CONFLICT,
    // physical_insert.cpp) via the format-agnostic snapshot operator:
    // WHEN MATCHED THEN UPDATE SET * (update wins, incl. NULLs) / WHEN
    // NOT MATCHED THEN INSERT *. Oracle reconstructs the same semantics
    // with a FULL OUTER JOIN.
    "merge_upsert" -> { (s, d) =>
      import graft.operators.MergeInto
      val base = Tables(s, d, "orders").filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val updates = Tables(s, d, "orders")
        .filter(col("o_orderkey") >= 500 && col("o_orderkey") < 1500)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 2.0).as("o_totalprice"))  // *2: exact in binary, no half-ulp rounding skew
      MergeInto.upsert(base, updates, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // WHEN MATCHED THEN DELETE ≙ left-anti join on the delete-set keys
    "merge_delete" -> { (s, d) =>
      import graft.operators.MergeInto
      val base = Tables(s, d, "orders").filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      val deletes = base.filter(col("o_custkey") % 7 === 0)
      MergeInto.delete(base, deletes, Seq("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_cust"))
    },

    // CTAS (reference: CREATE TABLE AS, physical_create_table_as) — an
    // external parquet table at a session-scoped location, then queried
    // back. Location is cleared first: a dropped table's files otherwise
    // survive the catalog entry across JVMs and block re-creation.
    "sql_ctas" -> { (s, d) =>
      Tables(s, d, "nation").createOrReplaceTempView("nation_src")
      s.sql("DROP TABLE IF EXISTS graft_ctas")
      val loc = roundtripDir("ctas")
      deleteRecursively(new java.io.File(loc))
      s.sql(s"CREATE TABLE graft_ctas USING PARQUET LOCATION '$loc' AS " +
        "SELECT n_nationkey, n_name, n_regionkey FROM nation_src")
      s.sql("""SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
              |FROM graft_ctas GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    },

    // registered scalar UDF surface (SURVEY §2.9) — the engine prefers
    // native expressions everywhere; this exercises the registration API
    "fn_udf" -> { (s, d) =>
      s.udf.register("graft_taxed", (p: Double, t: Double) => p * (1.0 + t))
      Tables(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT l_returnflag, round(sum(graft_taxed(l_extendedprice, l_tax)), 2) AS taxed
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // SQL macro (reference: CREATE MACRO, macro_function.cpp) ≙ SQL UDF
    "sql_macro_udf" -> { (s, d) =>
      Tables(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(p DOUBLE, d DOUBLE) " +
        "RETURNS DOUBLE RETURN p * (1 - d)")
      s.sql(
        """SELECT l_returnflag, round(sum(graft_disc_price(l_extendedprice, l_discount)), 2) AS rev
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // table macro (reference: CREATE MACRO ... AS TABLE,
    // src/function/table_macro_function.cpp) ≙ Spark SQL table function:
    // a named, parameterized relation expanded at plan time — the
    // consumer aggregates over the macro's output
    "sql_table_macro" -> { (s, d) =>
      Tables(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION graft_orders_above(threshold DOUBLE)
          |RETURNS TABLE (o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE)
          |RETURN SELECT o_orderkey, o_orderpriority, o_totalprice
          |FROM orders WHERE o_totalprice > threshold""".stripMargin)
      s.sql(
        """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
          |FROM graft_orders_above(400000.0D)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // PARTITIONED_AGGREGATE surface: a bucketed+sorted warehouse table
    // (the persisted form of the warm layer's clustering) aggregated on
    // its bucket key — Catalyst plans the agg exchange-free off the
    // bucketing (BucketedJoinSpec pins the plan shape); the oracle gates
    // the VALUES through the bucketed write+read+agg path
    "src_bucketed_agg" -> { (s, d) =>
      s.sql("DROP TABLE IF EXISTS graft_bucketed")
      // a managed table's directory survives the (per-JVM, in-memory)
      // catalog entry: clear the location too, as sql_ctas does
      locally {
        val wh = s.conf.get("spark.sql.warehouse.dir")
        val whPath = try new java.io.File(new java.net.URI(wh)).getPath
          catch { case _: Exception => wh }
        deleteRecursively(new java.io.File(whPath, "graft_bucketed"))
      }
      Tables(s, d, "orders")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("graft_bucketed")
      s.table("graft_bucketed")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_custkey")).limit(200)
    },

    // native Delta-log scan (reference: delta_scan.cpp) — a three-version
    // table built from the sfDir nation (adds + a compacting remove);
    // latest snapshot must equal the plain nation table per DuckDB
    "src_delta_scan" -> { (s, d) =>
      val path = graft.sources.DeltaFixture.nationTable(s, d)
      graft.sources.DeltaScan.scan(s, path)
        .orderBy(col("n_nationkey"))
    },

    // time travel (delta_scan's version pin): v0 holds only the first
    // commit's rows, so the snapshot is oracle-expressible as a filter
    "src_delta_time_travel" -> { (s, d) =>
      val path = graft.sources.DeltaFixture.nationTable(s, d)
      graft.sources.DeltaScan.scan(s, path, versionAsOf = Some(0L))
        .orderBy(col("n_nationkey"))
    },

    // partitioned Delta table: the partition column exists only in the
    // LOG (partitionValues), not the data files — the scan re-attaches
    // it typed, and the PREDICATE itself drives log-level pruning
    // (scanWhere, the reference's delta_scan shape — r4; the lambda
    // pruner remains as the lower-level API)
    "src_delta_partitioned" -> { (s, d) =>
      val path = graft.sources.DeltaFixture.nationByRegion(s, d)
      graft.sources.DeltaScan.scanWhere(s, path, col("n_regionkey").isin(1, 3))
        .orderBy(col("n_nationkey"))
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    },

    // native transactional Delta WRITE, MERGE leg: create a table from
    // the low order keys, MERGE the doubled-price update set (file-pruned
    // copy-on-write commit), read the committed snapshot back. Oracle =
    // the same FULL OUTER reconstruction that gates merge_upsert — the
    // commit protocol must not change the semantics layer's answer.
    "src_delta_merge" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_delta_merge").toString + "/t"
      val orders = s.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      graft.sources.DeltaWrite.create(s,
        orders.filter(col("o_orderkey") < 1000), dir)
      val updates = orders
        .filter(col("o_orderkey") >= 500 && col("o_orderkey") < 1500)
        .withColumn("o_totalprice", col("o_totalprice") * 2.0)
      graft.sources.DeltaWrite.merge(s, dir, updates, Seq("o_orderkey"))
      graft.sources.DeltaScan.scan(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // protocol v3 deletionVectors read (reference: delta-kernel DV scan
    // in extension/delta delta_scan.cpp): rows marked deleted by the
    // sidecar (storageType u) and inline (i) roaring bitmaps must be
    // skipped; the oracle re-expresses the DVs as NOT IN over the keys
    "src_delta_dv" -> { (s, d) =>
      val path = graft.sources.DeltaFixture.nationWithDv(s, d)
      graft.sources.DeltaScan.scan(s, path)
        .orderBy(col("n_nationkey"))
    },

    // column-mapping (protocol 2/5, mode name) read: parquet files carry
    // physical names, the log's schemaString maps them to logical ones
    // (reference reads these via delta-kernel in extension/delta's
    // delta_scan.cpp); the scan must surface LOGICAL names and pull the
    // physically-keyed partition values from the log
    "src_delta_column_mapping" -> { (s, d) =>
      val path = graft.sources.DeltaFixture.nationWithColumnMapping(s, d)
      graft.sources.DeltaScan.scan(s, path)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"))
    },

    // the WRITE side of column mapping: merge + delete stage data files
    // under PHYSICAL names with physically-keyed partitionValues, then a
    // full-fidelity checkpoint (configuration + protocol preserved) and
    // the scan reads the result back through the mapping
    "src_delta_cm_merge" -> { (s, d) =>
      val path = graft.sources.DeltaFixture.nationWithColumnMapping(s, d)
      val plain = s.read.parquet(s"$d/nation.parquet")
      val updates = plain
        .filter(col("n_nationkey") >= 10 && col("n_nationkey") < 20)
        .withColumn("n_name", upper(col("n_name")))
      graft.sources.DeltaWrite.merge(s, path, updates, Seq("n_nationkey"))
      graft.sources.DeltaWrite.deleteWhere(s, path, col("n_nationkey") % 3 === 0)
      graft.sources.DeltaWrite.checkpoint(s, path)
      graft.sources.DeltaScan.scan(s, path)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"))
    },

    // OPTIMIZE + VACUUM leg: a DV-carrying table is bin-packed (the DVs
    // materialize away), then vacuum(0) reclaims every replaced file —
    // the surviving scan must still equal the DV oracle, proving the
    // compaction changed layout only and vacuum spared every live file
    "src_delta_optimize" -> { (s, d) =>
      val path = graft.sources.DeltaFixture.nationWithDv(s, d)
      graft.sources.DeltaWrite.optimize(s, path)
      graft.sources.DeltaWrite.vacuum(s, path, retentionMillis = 0L)
      graft.sources.DeltaScan.scan(s, path)
        .orderBy(col("n_nationkey"))
    },

    // incremental change scan: the commits after v0 replay as appended
    // rows tagged _commit_version; the OPTIMIZE commit in the middle
    // (dataChange=false) must be SKIPPED — without the skip its rewrite
    // would re-emit v0/v1's rows and the oracle would catch duplicates.
    // nation is 25 rows in one part file per append, so the version
    // numbering (v1 append, v2 optimize, v3 append) is deterministic.
    "src_delta_changes" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_delta_cdf").toString + "/t"
      val n = s.read.parquet(s"$d/nation.parquet")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      graft.sources.DeltaWrite.create(s, n.filter(col("n_nationkey") < 10), dir)
      graft.sources.DeltaWrite.append(s,
        n.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 18), dir)
      graft.sources.DeltaWrite.optimize(s, dir)
      graft.sources.DeltaWrite.append(s, n.filter(col("n_nationkey") >= 18), dir)
      graft.sources.DeltaScan.scanChanges(s, dir, fromVersion = 0L)
        .orderBy(col("n_nationkey"))
    },

    // DESCRIBE HISTORY (rows-only: commit timestamps are wall-clock):
    // version + operation per commit, newest first
    "src_delta_history" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_delta_hist").toString + "/t"
      val n = s.read.parquet(s"$d/nation.parquet")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      graft.sources.DeltaWrite.create(s, n.filter(col("n_nationkey") < 10), dir)
      graft.sources.DeltaWrite.append(s, n.filter(col("n_nationkey") >= 10), dir)
      graft.sources.DeltaWrite.deleteWhere(s, dir, col("n_nationkey") % 5 === 0)
      graft.sources.DeltaScan.history(s, dir)
        .select(col("version"), col("operation"))
    },

    // MERGE via DELETION VECTORS: same upsert semantics and oracle as
    // src_delta_merge, but matched base rows are DV-deleted in place and
    // update rows append — zero base-file rewrites
    "src_delta_merge_dv" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_delta_mergedv").toString + "/t"
      val orders = s.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      graft.sources.DeltaWrite.create(s,
        orders.filter(col("o_orderkey") < 1000), dir)
      val updates = orders
        .filter(col("o_orderkey") >= 500 && col("o_orderkey") < 1500)
        .withColumn("o_totalprice", col("o_totalprice") * 2.0)
      graft.sources.DeltaWrite.mergeDv(s, dir, updates, Seq("o_orderkey"))
      graft.sources.DeltaScan.scan(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // SCHEMA EVOLUTION: v0 declares 3 columns; a mergeSchema append adds
    // a 4th (nullable — pre-evolution files read back null for it, via
    // the explicit-schema parquet scan); ALTER TABLE ADD COLUMN then
    // appends a 5th with no data files at all. The full read surfaces
    // the evolved 5-column schema; the oracle reconstructs which rows
    // can carry values for each column generation.
    "src_delta_schema_evolution" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_delta_evo").toString + "/t"
      val n = s.read.parquet(s"$d/nation.parquet")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      graft.sources.DeltaWrite.create(s, n.filter(col("n_nationkey") < 15), dir)
      graft.sources.DeltaWrite.append(s,
        n.filter(col("n_nationkey") >= 15)
          .withColumn("n_big", upper(col("n_name"))),
        dir, mergeSchema = true)
      graft.sources.DeltaWrite.addColumn(s, dir, "n_extra",
        org.apache.spark.sql.types.LongType)
      graft.sources.DeltaScan.scan(s, dir)
        .orderBy(col("n_nationkey"))
    },

    // time travel BELOW the evolution: v0's metaData replay must surface
    // the ORIGINAL 3-column schema (per-version schemas, delta-kernel
    // semantics), not the evolved one
    "src_delta_schema_evolution_v0" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_delta_evo0").toString + "/t"
      val n = s.read.parquet(s"$d/nation.parquet")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      graft.sources.DeltaWrite.create(s, n.filter(col("n_nationkey") < 15), dir)
      graft.sources.DeltaWrite.append(s,
        n.filter(col("n_nationkey") >= 15)
          .withColumn("n_big", upper(col("n_name"))),
        dir, mergeSchema = true)
      graft.sources.DeltaScan.scan(s, dir, versionAsOf = Some(0L))
        .orderBy(col("n_nationkey"))
    },

    // native UPDATE ... SET ... WHERE: copy-on-write rewrite of only the
    // files holding matched rows; oracle = the CASE WHEN reconstruction
    "src_delta_update" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_delta_upd").toString + "/t"
      val orders = s.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .filter(col("o_orderkey") < 2000)
      graft.sources.DeltaWrite.create(s, orders, dir)
      graft.sources.DeltaWrite.update(s, dir,
        Map("o_totalprice" -> (col("o_totalprice") * 2.0)),
        col("o_custkey") % 5 === 0)
      graft.sources.DeltaScan.scan(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // DELETE via DELETION VECTORS: same logical result as
    // src_delta_delete but NO data file is rewritten — matched positions
    // go to roaring-bitmap sidecars and the scan's DV anti-join skips
    // them; the oracle proves sidecar-deleted == copy-on-write-deleted
    "src_delta_delete_dv" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_delta_dvdel").toString + "/t"
      val orders = s.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
        .filter(col("o_orderkey") < 2000)
      graft.sources.DeltaWrite.create(s, orders, dir)
      graft.sources.DeltaWrite.deleteWhereDv(s, dir, col("o_custkey") % 7 === 0)
      graft.sources.DeltaScan.scan(s, dir)
        .agg(count(lit(1)).as("n"),
          sum(col("o_custkey")).cast("long").as("sum_cust"))
    },

    // DELETE WHERE leg: copy-on-write delete commit, aggregate the
    // surviving snapshot (mirrors merge_delete's oracle)
    "src_delta_delete" -> { (s, d) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_delta_del").toString + "/t"
      val orders = s.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
        .filter(col("o_orderkey") < 2000)
      graft.sources.DeltaWrite.create(s, orders, dir)
      graft.sources.DeltaWrite.deleteWhere(s, dir, col("o_custkey") % 7 === 0)
      graft.sources.DeltaScan.scan(s, dir)
        .agg(count(lit(1)).as("n"),
          sum(col("o_custkey")).cast("long").as("sum_cust"))
    },

    // Parquet file_row_number parity (reference:
    // extension/parquet/parquet_extension.cpp:362-376 scan option) —
    // Spark's `_metadata.row_index` hidden column is the same per-file
    // ordinal. One sorted single-file fixture so both engines see
    // identical row placement.
    "src_parquet_row_number" -> { (s, d) =>
      val dir = roundtripDir("rownum")
      Tables(s, d, "nation")
        .repartition(1).sortWithinPartitions("n_nationkey")
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .select(col("n_nationkey"), col("n_name"),
          col("_metadata.row_index").as("rn"))
        .orderBy("rn")
    },

    // ------------------------- round-11 copy/ option-matrix widening
    // (test/sql/copy/csv is the reference's heaviest test dir — 504
    // files vs ~14 gates before this block; each pin is one option
    // combination both engines read off the same bytes)

    // non-default quote char (') + backslash escape
    "src_csv_quote_escape" -> { (s, d) =>
      val path = csvFixture("qesc", csvQuoteEscContent)
      s.read.option("header", "true")
        .option("quote", "'").option("escape", "\\")
        .schema("k INT, s STRING").csv(path)
        .orderBy("k")
    },

    // DROPMALFORMED ≙ ignore_errors=true: malformed rows vanish, the
    // good rows aggregate identically
    "src_csv_drop_malformed" -> { (s, d) =>
      val path = csvFixture("malformed", csvMalformedContent)
      s.read.option("header", "true").option("mode", "DROPMALFORMED")
        .schema("k INT, v INT").csv(path)
        .agg(count(lit(1)).as("n"), sum(col("v")).cast("long").as("sum_v"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    },

    // explicit timestampformat drives parsing on both sides
    "src_csv_timestampformat" -> { (s, d) =>
      val path = csvFixture("tsfmt", csvTsFmtContent)
      s.read.option("header", "true")
        .option("timestampFormat", "dd/MM/yyyy HH:mm:ss")
        .schema("k INT, t TIMESTAMP").csv(path)
        .select(col("k"), col("t")).orderBy("k")
    },

    // glob over two files unions their rows (multi-file read list)
    "src_csv_glob_union" -> { (s, d) =>
      val dir = roundtripDir("csv_glob")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.csv"),
        "k,v\n1,10\n2,20\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.csv"),
        "k,v\n3,30\n4,40\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      s.read.option("header", "true").schema("k INT, v INT").csv(s"$dir/*.csv")
        .agg(count(lit(1)).as("n"), sum(col("v")).cast("long").as("sum_v"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    },

    // header-only file: zero rows, typed NULL aggregate (schema holds)
    "src_csv_header_only" -> { (s, d) =>
      val path = csvFixture("headeronly", csvHeaderOnlyContent)
      s.read.option("header", "true").schema("k INT, v INT").csv(path)
        .agg(count(lit(1)).as("n"), sum(col("v")).cast("long").as("sum_v"))
    },

    // tab delimiter
    "src_csv_tab_delim" -> { (s, d) =>
      val path = csvFixture("tabbed", csvTabContent)
      s.read.option("header", "true").option("sep", "\t")
        .schema("k INT, v DOUBLE").csv(path)
        .agg(count(lit(1)).as("n"), round(sum(col("v")), 2).as("sum_v"))
    },

    // boolean column through schema INFERENCE (not an explicit schema)
    "src_csv_bool_infer" -> { (s, d) =>
      val path = csvFixture("boolcol", csvBoolContent)
      s.read.option("header", "true").option("inferSchema", "true").csv(path)
        .select(col("k").cast("int").as("k"), col("b")).orderBy("k")
    },

    // COPY TO option matrix on the WRITE side: quoteAll (FORCE_QUOTE *),
    // ';' delimiter, custom NULL marker — written by Spark, read back by
    // both engines
    "src_csv_write_quote_all" -> { (s, d) =>
      val dir = roundtripDir("csv_qa")
      Tables(s, d, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          when(pmod(col("s_suppkey"), lit(7)) === 0, lit(null))
            .otherwise(col("s_name")).as("maybe"))
        .write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true")
        .option("sep", ";").option("nullValue", "NA")
        .csv(dir)
      s.read.option("header", "true").option("sep", ";")
        .option("nullValue", "NA")
        .schema("s_suppkey INT, s_name STRING, s_acctbal DOUBLE, maybe STRING")
        .csv(dir)
        .agg(count(lit(1)).as("n"), count(col("maybe")).as("n_maybe"),
          sum(length(col("s_name"))).cast("long").as("name_chars"),
          round(sum(col("s_acctbal")), 2).as("bal"))
    },

    // one JSON ARRAY document (multiLine=true ≙ format='array')
    "src_json_array_doc" -> { (s, d) =>
      val path = csvFixture("json_array", jsonArrayContent)
      s.read.option("multiLine", "true")
        .schema("k INT, v STRING, x DOUBLE").json(path)
        .select(col("k"), col("v"), col("x")).orderBy("k")
    },

    // missing vs explicit-null JSON fields both read as NULL
    "src_json_missing_fields" -> { (s, d) =>
      val path = csvFixture("json_missing", jsonMissingContent)
      s.read.schema("k INT, a STRING, b DOUBLE").json(path)
        .agg(count(lit(1)).as("n"), count(col("a")).as("n_a"),
          count(col("b")).as("n_b"), round(sum(col("b")), 2).as("sum_b"))
    },

    // parquet physical-type matrix round-trip: byte/short/int/long/
    // float/double/bool/binary/string/date/timestamp
    "src_parquet_type_matrix" -> { (s, d) =>
      val dir = roundtripDir("pq_types")
      Tables(s, d, "nation").select(
        col("n_nationkey").cast("byte").as("b"),
        col("n_nationkey").cast("short").as("sh"),
        col("n_nationkey").cast("int").as("i"),
        col("n_nationkey").cast("long").as("l"),
        (col("n_nationkey") * 1.5).cast("float").as("f"),
        (col("n_nationkey") * 2.5).as("dd"),
        (pmod(col("n_nationkey"), lit(2)) === 0).as("flag"),
        encode(col("n_name"), "UTF-8").as("bin"),
        col("n_name").as("s0"),
        to_date(lit("2024-01-01")).as("dt"),
        to_timestamp(lit("2024-01-02 03:04:05")).as("ts"))
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir).agg(
        sum(col("b")).cast("long").as("sum_b"),
        sum(col("sh")).cast("long").as("sum_sh"),
        sum(col("i")).cast("long").as("sum_i"),
        sum(col("l")).cast("long").as("sum_l"),
        round(sum(col("f")), 2).as("sum_f"),
        round(sum(col("dd")), 2).as("sum_dd"),
        sum(when(col("flag"), 1).otherwise(0)).cast("long").as("n_true"),
        sum(length(col("bin"))).cast("long").as("bin_bytes"),
        max(col("s0")).as("max_s"),
        min(col("dt")).as("min_dt"),
        max(col("ts")).as("max_ts"))
    },

    // MAP column round-trip: entry counts + per-key extraction group
    "src_parquet_map_roundtrip" -> { (s, d) =>
      val dir = roundtripDir("pq_map")
      Tables(s, d, "part")
        .select(col("p_partkey"),
          map(lit("brand"), col("p_brand"),
            lit("kind"), col("p_type")).as("m"))
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .select(col("m")("brand").as("brand"), col("m")("kind").as("cont"))
        .groupBy("brand")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("cont")).as("nc"))
        .orderBy("brand")
    },

    // two-level hive partitioning: COPY TO ... PARTITION_BY(a, b) over
    // parquet; partition values live in directory names on both engines
    "src_parquet_partition_two_keys" -> { (s, d) =>
      val dir = roundtripDir("pq_part2")
      Tables(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite")
        .partitionBy("l_returnflag", "l_linestatus").parquet(dir)
      s.read.parquet(dir).filter(col("l_returnflag") === "R")
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("l_linestatus"))
    },

    // ------------------------- round-12 copy/ option-matrix widening

    // skip=N drops the first N physical lines before parsing — a
    // file-prefix concept, so the mapping runs on the line stream
    // (zipWithIndex preserves single-file line order) and hands the
    // remainder to the distributed CSV parser
    "src_csv_skip_rows" -> { (s, d) =>
      val path = csvFixture("skiprows", csvSkipContent)
      val lines = s.createDataset(
        s.read.textFile(path).rdd.zipWithIndex()
          .filter(_._2 >= 2).map(_._1))(
        org.apache.spark.sql.Encoders.STRING)
      s.read.option("header", "true").schema("k INT, v INT").csv(lines)
        .orderBy("k")
    },

    // explicit new_line='\r' (classic-Mac endings) stated, not sniffed
    "src_csv_new_line_cr" -> { (s, d) =>
      val path = csvFixture("crnl", csvCrContent)
      s.read.option("header", "true").option("lineSep", "\r")
        .schema("k INT, v INT").csv(path).orderBy("k")
    },

    // decimal_separator=',': Spark reads the column raw and normalizes
    // with a codegen'd translate before the cast
    "src_csv_decimal_sep" -> { (s, d) =>
      val path = csvFixture("decsep", csvDecSepContent)
      s.read.option("header", "true").option("sep", ";")
        .schema("k INT, v STRING").csv(path)
        .select(col("k"), translate(col("v"), ",", ".").cast("double").as("v"))
        .orderBy("k")
    },

    // union_by_name over files with different column order AND set —
    // per-file reads + unionByName(allowMissingColumns) ≙ read_csv(...,
    // union_by_name=true)
    "src_csv_union_by_name" -> { (s, d) =>
      val dir = roundtripDir("csv_ubn")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.csv"),
        "a,b\n1,x\n3,z\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.csv"),
        "b,a,c\ny,2,9\nw,4,7\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val f1 = s.read.option("header", "true").schema("a INT, b STRING")
        .csv(s"$dir/a.csv")
      val f2 = s.read.option("header", "true").schema("b STRING, a INT, c INT")
        .csv(s"$dir/b.csv")
      f1.unionByName(f2, allowMissingColumns = true)
        .select(col("a"), col("b"), col("c")).orderBy("a")
    },

    // comment='#' lines vanish before parsing (Spark csv comment option;
    // VALUES oracle — DuckDB 1.0 predates the parameter)
    "src_csv_comment" -> { (s, d) =>
      val path = csvFixture("comment", csvCommentContent)
      s.read.option("header", "true").option("comment", "#")
        .schema("k INT, v INT").csv(path).orderBy("k")
    },

    // latin-1 bytes on disk, explicit charset on read (csv_encoder.cpp
    // latin-1 arm; VALUES oracle — no encoding param in DuckDB 1.0)
    "src_csv_encoding_latin1" -> { (s, d) =>
      val path = csvFixtureBytes("latin1",
        csvLatin1Content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      s.read.option("header", "true").option("encoding", "ISO-8859-1")
        .schema("k INT, s STRING").csv(path)
        .select(col("k"), col("s"), length(col("s")).as("chars"))
        .orderBy("k")
    },

    // UTF-16 with BOM: multiLine routes the whole file through the
    // charset decoder (Hadoop's byte-oriented line reader would split
    // 2-byte code units) — csv_encoder.cpp UTF-16 arm; VALUES oracle
    "src_csv_encoding_utf16" -> { (s, d) =>
      val path = csvFixtureBytes("utf16",
        csvUtf16Content.getBytes(java.nio.charset.StandardCharsets.UTF_16))
      s.read.option("header", "true").option("encoding", "UTF-16")
        .option("multiLine", "true")
        .schema("k INT, s STRING").csv(path)
        .select(col("k"), col("s"), length(col("s")).as("chars"))
        .orderBy("k")
    },

    // gzip-compressed newline-delimited JSON read (reference reads
    // .json.gz transparently; Spark writes/reads the codec by extension)
    "src_json_gzip" -> { (s, d) =>
      val dir = roundtripDir("json_gz")
      Tables(s, d, "nation")
        .select(col("n_nationkey").cast("int").as("k"), col("n_name").as("s"))
        .coalesce(1)
        .write.mode("overwrite").option("compression", "gzip").json(dir)
      s.read.schema("k INT, s STRING").json(dir)
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(length(col("s"))).cast("long").as("s_chars"))
    },

    // names= overriding an existing header (csv_names.test: names
    // replace the header labels, header row still skipped)
    "src_csv_names_with_header" -> { (s, d) =>
      val path = csvFixture("nameshdr", "a,b,c\n1,x,2.5\n2,y,3.5\n3,z,4.5\n")
      s.read.option("header", "true")
        .schema("k INT, s STRING, v DOUBLE").csv(path)
        .orderBy("k")
    },

    // per-column type override BY NAME (read_csv types={'b': 'VARCHAR'}):
    // the numeric-looking column is read as text, the rest stay inferred
    "src_csv_types_by_name" -> { (s, d) =>
      val path = csvFixture("typesby", "a,b,c\n1,007,2.5\n2,042,3.5\n")
      s.read.option("header", "true")
        .schema("a INT, b STRING, c DOUBLE").csv(path)
        .select(col("a"), col("b"), length(col("b")).as("b_len"), col("c"))
        .orderBy("a")
    },

    // multi-character delimiter (reference csv_scanner supports
    // multi-byte delim strings; Spark `sep` accepts them too)
    "src_csv_multichar_delim" -> { (s, d) =>
      val path = csvFixture("multidelim", "k||s||v\n1||aa||2.5\n2||b|b||3.5\n")
      s.read.option("header", "true").option("sep", "||")
        .schema("k INT, s STRING, v DOUBLE").csv(path)
        .orderBy("k")
    },

    // deflate-compressed CSV roundtrip (codec matrix beyond gzip —
    // zstd is unavailable in this Hadoop build, deflate is the next
    // reference-relevant codec); VALUES oracle since DuckDB reads only
    // gzip/zstd CSV
    "src_csv_deflate" -> { (s, d) =>
      val dir = roundtripDir("csv_deflate")
      Tables(s, d, "region")
        .select(col("r_regionkey").cast("int").as("k"), col("r_name").as("s"))
        .coalesce(1).write.mode("overwrite").option("header", "true")
        .option("compression", "deflate").csv(dir)
      s.read.option("header", "true").schema("k INT, s STRING").csv(dir)
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(length(col("s"))).cast("long").as("s_chars"))
    },

    // a file that STARTS with an empty line before the header
    // (empty_first_line.test): both engines skip it
    "src_csv_empty_first_line" -> { (s, d) =>
      val path = csvFixture("emptyfirst", "\nk,s\n1,a\n2,b\n")
      s.read.option("header", "true").schema("k INT, s STRING").csv(path)
        .orderBy("k")
    },

    // hive-partitioned CSV WRITE (COPY TO ... PARTITION_BY over csv —
    // the parquet twin is src_partitioned_write): partition column is
    // recovered from the directory layout on read
    "src_csv_partitioned_write" -> { (s, d) =>
      val dir = roundtripDir("csv_partby")
      Tables(s, d, "nation")
        .select(col("n_nationkey").cast("int").as("k"),
          col("n_name").as("s"), col("n_regionkey").cast("int").as("r"))
        .write.mode("overwrite").partitionBy("r")
        .option("header", "true").csv(dir)
      s.read.option("header", "true").schema("k INT, s STRING").csv(dir)
        .withColumn("r", regexp_extract(input_file_name(), "r=(\\d+)", 1)
          .cast("int"))
        .groupBy("r").agg(count(lit(1)).as("n"), min(col("k")).as("min_k"))
        .orderBy("r")
    },

    // parquet writer format version v2 (DATA_PAGE_V2 — the reference's
    // parquet_version option, parquet_extension.cpp); DuckDB reads v2
    // pages so the oracle is a full-value gate
    "src_parquet_v2_pages" -> { (s, d) =>
      val dir = roundtripDir("pq_v2")
      Tables(s, d, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .write.mode("overwrite")
        .option("parquet.writer.version", "v2").parquet(dir)
      s.read.parquet(dir)
        .agg(count(lit(1)).as("n"),
          sum(length(col("s_name"))).cast("long").as("name_chars"),
          round(sum(col("s_acctbal")), 2).as("bal"))
    },

    // dictionary encoding disabled + small pages (writer option matrix:
    // parquet.enable.dictionary / parquet.page.size); values must
    // survive the plain-encoding path exactly
    "src_parquet_no_dictionary" -> { (s, d) =>
      val dir = roundtripDir("pq_nodict")
      Tables(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .write.mode("overwrite")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.page.size", (16 * 1024).toString).parquet(dir)
      s.read.parquet(dir)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), round(sum(col("p_retailprice")), 2).as("price"))
        .orderBy("p_brand")
    },

    // UTF-16BE WITHOUT a BOM (the byte order the charset name pins —
    // csv_encoder.cpp's non-default UTF-16 arm); VALUES oracle
    "src_csv_encoding_utf16be" -> { (s, d) =>
      val path = csvFixtureBytes("utf16be",
        csvUtf16beContent.getBytes(java.nio.charset.StandardCharsets.UTF_16BE))
      s.read.option("header", "true").option("encoding", "UTF-16BE")
        .option("multiLine", "true")
        .schema("k INT, s STRING").csv(path)
        .select(col("k"), col("s"), length(col("s")).as("chars"))
        .orderBy("k")
    },

    // UTF-16LE without BOM (the explicit little-endian arm; the BOM-led
    // default and BE twins are pinned above); VALUES oracle
    "src_csv_encoding_utf16le" -> { (s, d) =>
      val path = csvFixtureBytes("utf16le",
        csvUtf16leContent.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
      s.read.option("header", "true").option("encoding", "UTF-16LE")
        .option("multiLine", "true")
        .schema("k INT, s STRING").csv(path)
        .select(col("k"), col("s"), length(col("s")).as("chars"))
        .orderBy("k")
    },

    // bzip2-compressed CSV roundtrip (splittable codec — the one class
    // where a 100 TB CSV lake still scans in parallel); source-table
    // oracle since DuckDB reads only gzip/zstd CSV
    "src_csv_bzip2" -> { (s, d) =>
      val dir = roundtripDir("csv_bzip2")
      Tables(s, d, "nation")
        .select(col("n_nationkey").cast("int").as("k"), col("n_name").as("s"))
        .coalesce(1).write.mode("overwrite").option("header", "true")
        .option("compression", "bzip2").csv(dir)
      s.read.option("header", "true").schema("k INT, s STRING").csv(dir)
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(length(col("s"))).cast("long").as("s_chars"))
    },

    // writer-side custom quote + escape (COPY TO ... QUOTE '' ESCAPE:
    // csv_writer options): values containing the delimiter, the quote
    // char and newlines must survive the roundtrip exactly
    "src_csv_write_quote_escape" -> { (s, d) =>
      val dir = roundtripDir("csv_wq")
      val src = s.sql(
        """SELECT * FROM VALUES
          |  (1, 'plain'), (2, 'comma,inside'), (3, 'quote''inside'),
          |  (4, 'both'',and'), (5, 'line\nbreak') AS t(k, s)""".stripMargin)
      src.coalesce(1).write.mode("overwrite")
        .option("header", "true").option("quote", "'").option("escape", "'")
        .csv(dir)
      s.read.option("header", "true").option("quote", "'").option("escape", "'")
        .option("multiLine", "true")
        .schema("k INT, s STRING").csv(dir)
        .select(col("k"), col("s"), length(col("s")).as("chars"))
        .orderBy("k")
    },

    // writer NULL literal (COPY TO ... NULL 'NULLX') — the null marker
    // must roundtrip as SQL NULL, not as the literal string
    "src_csv_write_null_literal" -> { (s, d) =>
      val dir = roundtripDir("csv_wnull")
      val src = s.sql(
        """SELECT * FROM VALUES
          |  (1, 'a'), (2, CAST(NULL AS STRING)), (3, 'NULL-ish'), (4, 'z')
          |  AS t(k, s)""".stripMargin)
      src.coalesce(1).write.mode("overwrite")
        .option("header", "true").option("nullValue", "NULLX").csv(dir)
      s.read.option("header", "true").option("nullValue", "NULLX")
        .schema("k INT, s STRING").csv(dir)
        .select(col("k"), col("s").isNull.as("is_null"),
          coalesce(col("s"), lit("-")).as("s"))
        .orderBy("k")
    },

    // parquet writer page-row limit (reference parquet_extension.cpp
    // ROW_GROUP_SIZE/page knobs): tiny pages force many page headers —
    // values must survive unchanged
    "src_parquet_page_row_limit" -> { (s, d) =>
      val dir = roundtripDir("pq_pagerows")
      Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", "100")
        .option("parquet.page.size", (4 * 1024).toString).parquet(dir)
      s.read.parquet(dir)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("bal"))
        .orderBy("c_mktsegment")
    },

    // parquet writer row-group size matrix (64 KB vs 8 MB block size →
    // many vs one row group); both variants must agree with the source
    "src_parquet_block_size_matrix" -> { (s, d) =>
      val small = roundtripDir("pq_blk_small")
      val large = roundtripDir("pq_blk_large")
      val src = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      src.write.mode("overwrite")
        .option("parquet.block.size", (64 * 1024).toString).parquet(small)
      src.write.mode("overwrite")
        .option("parquet.block.size", (8 * 1024 * 1024).toString).parquet(large)
      s.read.parquet(small).unionAll(s.read.parquet(large))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
    },

    // parquet per-partition output files (the reference's COPY TO ...
    // PER_THREAD_OUTPUT: one file per writer thread; Spark's native
    // layout is one file per task — same mechanism, CSV twin above)
    "src_parquet_per_thread_output" -> { (s, d) =>
      val dir = roundtripDir("pq_pto")
      Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
        .repartition(4).write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        // input_file_name() is nondeterministic — it must live in a
        // projection BELOW the aggregate (Spark rejects it as an
        // aggregate argument)
        .select(input_file_name().as("f"), col("c_acctbal"))
        .agg(countDistinct(col("f")).cast("long").as("n_files"),
          count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("bal"))
    },

    // COPY ... (DATEFORMAT / TIMESTAMPFORMAT) ≙ dateFormat/
    // timestampFormat writer+reader options: custom render must
    // round-trip exactly (reference: test/sql/copy/csv/
    // test_date_format.test)
    "src_csv_write_dateformat" -> { (s, d) =>
      val dir = roundtripDir("csv_datefmt")
      Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"),
          col("o_orderdate").cast("timestamp").as("ots"))
        .filter(col("o_orderkey") < 500)
        .coalesce(1).write.mode("overwrite")
        .option("header", "true")
        .option("dateFormat", "dd/MM/yyyy")
        .option("timestampFormat", "yyyy.MM.dd HH:mm:ss")
        .csv(dir)
      s.read.option("header", "true")
        .option("dateFormat", "dd/MM/yyyy")
        .option("timestampFormat", "yyyy.MM.dd HH:mm:ss")
        .schema("o_orderkey BIGINT, od DATE, ots TIMESTAMP").csv(dir)
        .select(col("o_orderkey"), col("od"), col("ots").cast("date").as("ots_d"))
        .orderBy("o_orderkey")
    },

    // COPY ... (COMPRESSION gzip) on the WRITE side (the read side is
    // pinned by src_csv_bzip2): gzip-compressed csv out, schema-inferred
    // read back
    "src_csv_write_gzip" -> { (s, d) =>
      val dir = roundtripDir("csv_wgz")
      Tables(s, d, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
        .coalesce(1).write.mode("overwrite")
        .option("header", "true").option("compression", "gzip").csv(dir)
      val gz = new java.io.File(dir).listFiles()
        .exists(_.getName.endsWith(".csv.gz"))
      s.read.option("header", "true").option("inferSchema", "true").csv(dir)
        .agg(count(lit(1)).as("n"), round(sum(col("s_acctbal")), 2).as("bal"),
          lit(gz).as("gzipped"))
    },

    // the sniffer verdict AS ROWS — the reference's sniff_csv() table
    // function (src/function/table/sniff_csv.cpp); engine-specific
    // introspection output → rows-only
    "util_sniff_csv" -> { (s, d) =>
      val path = csvFixture("sniffed", csvSniffedContent)
      graft.sources.CsvSniffer.sniffRowsHashable(s, path)
    },

    // ------------------------------------------------------------------
    // r15 copy/ drip: parquet writer metadata options + partitioned-write
    // edge semantics (reference: extension/parquet/parquet_extension.cpp
    // FIELD_IDS:1227 / KV_METADATA:1244 / COMPRESSION_LEVEL:1287,
    // test/sql/copy/parquet/writer/, test/sql/copy/partitioned/).
    // The cross-engine footer pins are the strongest in the file: DuckDB
    // introspects the SPARK-WRITTEN file (parquet_schema /
    // parquet_kv_metadata / file_row_number / binary_as_string), so a
    // value match proves the two engines agree on the physical format,
    // not merely on the data values.
    // ------------------------------------------------------------------

    // COPY ... (FIELD_IDS {..}) ≙ schema metadata `parquet.field.id` +
    // spark.sql.parquet.fieldId.write.enabled; oracle reads the ids back
    // with DuckDB parquet_schema()
    "src_parquet_field_ids" -> { (s, d) =>
      val dir = roundtripDir("pq_field_ids")
      // harmless when no metadata is present; pinned on for the write
      s.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
      def fid(i: Int) = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", i.toLong).build()
      Tables(s, d, "nation")
        .select(col("n_nationkey").as("nk", fid(42)),
          col("n_name").as("nname", fid(7)))
        .coalesce(1).write.mode("overwrite").parquet(dir)
      import s.implicits._
      footerSchemaFields(dir)
        .map { case (n, id) => (n, id) }.toDF("name", "field_id")
        .orderBy("name")
    },

    // COPY ... (KV_METADATA {..}) analog: the writer's file-level
    // key-value metadata — DuckDB's parquet_kv_metadata() must see the
    // exact keys the Spark writer stamps
    "src_parquet_kv_metadata" -> { (s, d) =>
      val dir = roundtripDir("pq_kv_meta")
      Tables(s, d, "region").select(col("r_regionkey"), col("r_name"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
      import s.implicits._
      footerKvKeys(dir).toDF("key").orderBy("key")
    },

    // read_parquet(file_row_number=true) ≙ the parquet _metadata
    // .row_index constant column — position-in-file must agree between
    // the engines on the same single-file layout
    "src_parquet_file_row_number" -> { (s, d) =>
      val dir = roundtripDir("pq_frn")
      Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .filter(col("o_orderkey") < 1000)
        // deterministic file order: the warm cache serves a clustered
        // layout, and row_index is a position-in-file property — without
        // the sort the warm and cold runs write different files
        .coalesce(1).sortWithinPartitions("o_orderkey")
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .select(col("o_orderkey"), col("_metadata.row_index").as("frn"))
        .orderBy("o_orderkey")
    },

    // COPY ... (COMPRESSION zstd, COMPRESSION_LEVEL n): level is a
    // hadoop writer conf; both extremes must read back losslessly and
    // the footer must really carry ZSTD column chunks
    "src_parquet_compression_level" -> { (s, d) =>
      val lo = roundtripDir("pq_zstd_lo")
      val hi = roundtripDir("pq_zstd_hi")
      val src = Tables(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
      src.write.mode("overwrite").option("compression", "zstd")
        .option("parquet.compression.codec.zstd.level", "1").parquet(lo)
      src.write.mode("overwrite").option("compression", "zstd")
        .option("parquet.compression.codec.zstd.level", "19").parquet(hi)
      val zstd = footerCodecs(lo) == Set("ZSTD") && footerCodecs(hi) == Set("ZSTD")
      s.read.parquet(lo).unionAll(s.read.parquet(hi))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"),
          lit(zstd).as("zstd_chunks"))
    },

    // read_parquet(binary_as_string=true): unannotated BINARY columns
    // surfaced as strings — Spark writes the raw binary, the oracle
    // reads it back AS VARCHAR through the option
    "src_parquet_binary_as_string" -> { (s, d) =>
      val dir = roundtripDir("pq_bas")
      Tables(s, d, "part")
        .select(col("p_partkey"), encode(col("p_name"), "UTF-8").as("bn"))
        .filter(col("p_partkey") < 500)
        .coalesce(1).write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .select(col("p_partkey"), decode(col("bn"), "UTF-8").as("nm"))
        .orderBy("p_partkey")
    },

    // COPY TO ... (OVERWRITE_OR_IGNORE / hive overwrite semantics):
    // dynamic partition overwrite replaces ONLY the partitions present
    // in the incoming frame; untouched partitions survive
    "src_partitioned_overwrite_dynamic" -> { (s, d) =>
      val dir = roundtripDir("part_dyn_ow")
      val base = Tables(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"))
      base.write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
      base.filter(col("l_returnflag") === "R")
        .withColumn("l_quantity", col("l_quantity") + 1000)
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("l_returnflag").parquet(dir)
      s.read.parquet(dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy("l_returnflag")
    },

    // COPY TO ... (APPEND): new files land NEXT TO the existing
    // partition layout; one partition appended twice doubles exactly
    "src_partitioned_append" -> { (s, d) =>
      val dir = roundtripDir("part_append")
      val base = Tables(s, d, "orders")
        .select(col("o_orderstatus"), col("o_totalprice"))
      base.write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
      base.filter(col("o_orderstatus") === "F")
        .write.mode("append").partitionBy("o_orderstatus").parquet(dir)
      s.read.parquet(dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("o_orderstatus")
    },

    // COPY TO ... (FILENAME_PATTERN '{uuid}') analog: Spark's task files
    // are always part-NNNNN-<uuid>; pin the layout so a writer change
    // can't silently break collision-free multi-writer output
    "src_parquet_filename_uuid" -> { (s, d) =>
      val dir = roundtripDir("pq_fname")
      Tables(s, d, "customer").select(col("c_custkey"), col("c_acctbal"))
        .repartition(3).write.mode("overwrite").parquet(dir)
      val pat = "part-\\d{5}-[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}.*\\.parquet".r
      val names = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.endsWith(".parquet")).toSeq
      val ok = names.nonEmpty && names.forall(n => pat.pattern.matcher(n).matches())
      s.read.parquet(dir)
        .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("bal"),
          lit(ok).as("uuid_named"))
    }
  )

  /** (name, field_id) of every leaf in the (single) parquet footer under
    * `dir` — parquet-hadoop, driver-side, metadata-sized. */
  private def footerFooter(dir: String): org.apache.parquet.hadoop.metadata.ParquetMetadata = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter finally r.close()
  }

  private def footerSchemaFields(dir: String): Seq[(String, Int)] = {
    import scala.jdk.CollectionConverters._
    footerFooter(dir).getFileMetaData.getSchema.getFields.asScala.toSeq
      .map(f => (f.getName, f.getId.intValue()))
  }

  private def footerKvKeys(dir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    footerFooter(dir).getFileMetaData.getKeyValueMetaData.asScala.keys.toSeq.sorted
  }

  private def footerCodecs(dir: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    footerFooter(dir).getBlocks.asScala
      .flatMap(_.getColumns.asScala.map(_.getCodec.name())).toSet
  }

  val oracle: Map[String, String] = Map(
    "src_bucketed_agg" ->
      """SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey LIMIT 200""".stripMargin,

    "src_delta_scan" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "src_delta_time_travel" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation WHERE n_nationkey < 20 ORDER BY n_nationkey""".stripMargin,

    "src_delta_partitioned" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation WHERE n_regionkey IN (1, 3) ORDER BY n_nationkey""".stripMargin,

    "src_delta_column_mapping" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "src_delta_cm_merge" ->
      """SELECT n_nationkey,
        | CASE WHEN n_nationkey >= 10 AND n_nationkey < 20
        |   THEN upper(n_name) ELSE n_name END AS n_name,
        | n_regionkey
        |FROM nation
        |WHERE n_nationkey % 3 <> 0
        |ORDER BY n_nationkey""".stripMargin,

    "src_delta_merge" ->
      """SELECT o_orderkey,
        | CASE WHEN u.uk IS NOT NULL THEN u.o_custkey ELSE b.o_custkey END AS o_custkey,
        | round(CASE WHEN u.uk IS NOT NULL THEN u.o_totalprice ELSE b.o_totalprice END, 2)
        |   AS o_totalprice
        |FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey < 1000) b
        |FULL OUTER JOIN (
        |  SELECT o_orderkey, o_orderkey AS uk, o_custkey, o_totalprice * 2.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 1500) u
        |USING (o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "src_delta_merge_dv" ->
      """SELECT o_orderkey,
        | CASE WHEN u.uk IS NOT NULL THEN u.o_custkey ELSE b.o_custkey END AS o_custkey,
        | round(CASE WHEN u.uk IS NOT NULL THEN u.o_totalprice ELSE b.o_totalprice END, 2)
        |   AS o_totalprice
        |FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey < 1000) b
        |FULL OUTER JOIN (
        |  SELECT o_orderkey, o_orderkey AS uk, o_custkey, o_totalprice * 2.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 1500) u
        |USING (o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "src_delta_delete" ->
      """SELECT count(*) AS n, CAST(sum(o_custkey) AS BIGINT) AS sum_cust
        |FROM orders WHERE o_orderkey < 2000 AND o_custkey % 7 <> 0""".stripMargin,

    "src_delta_delete_dv" ->
      """SELECT count(*) AS n, CAST(sum(o_custkey) AS BIGINT) AS sum_cust
        |FROM orders WHERE o_orderkey < 2000 AND o_custkey % 7 <> 0""".stripMargin,

    "src_delta_schema_evolution" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        | CASE WHEN n_nationkey >= 15 THEN upper(n_name) END AS n_big,
        | CAST(NULL AS BIGINT) AS n_extra
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "src_delta_schema_evolution_v0" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation WHERE n_nationkey < 15 ORDER BY n_nationkey""".stripMargin,

    "src_delta_update" ->
      """SELECT o_orderkey, o_custkey,
        | round(CASE WHEN o_custkey % 5 = 0 THEN o_totalprice * 2.0
        |            ELSE o_totalprice END, 2) AS o_totalprice
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin,

    "src_delta_dv" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation WHERE n_nationkey NOT IN (1, 5, 9, 14, 20)
        |ORDER BY n_nationkey""".stripMargin,

    "src_delta_optimize" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation WHERE n_nationkey NOT IN (1, 5, 9, 14, 20)
        |ORDER BY n_nationkey""".stripMargin,

    "src_delta_changes" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        | CAST(CASE WHEN n_nationkey < 18 THEN 1 ELSE 3 END AS BIGINT)
        |   AS _commit_version
        |FROM nation WHERE n_nationkey >= 10
        |ORDER BY n_nationkey""".stripMargin,

    "src_csv_roundtrip" ->
      """SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "src_json_roundtrip" ->
      """SELECT p_brand, count(*) AS n, round(sum(p_retailprice), 2) AS price
        |FROM part GROUP BY p_brand ORDER BY p_brand LIMIT 100""".stripMargin,

    "src_partitioned_write" ->
      """SELECT count(*) AS n, round(sum(l_quantity), 2) AS qty,
        | round(sum(l_extendedprice), 2) AS price
        |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin,

    "src_parquet_encrypted" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty,
        | round(sum(l_extendedprice), 2) AS price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "src_parquet_max_records" ->
      """SELECT count(*) AS n, round(sum(p_retailprice), 2) AS retail,
        | true AS multi_file
        |FROM part""".stripMargin,

    "fn_generate_series" ->
      """SELECT ts, CAST(day(ts) AS BIGINT) AS dom
        |FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '1995-03-01',
        |                     INTERVAL 1 DAY) t(ts)
        |ORDER BY ts""".stripMargin,

    "src_dsv2_series" ->
      """SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS s,
        | min(v) AS lo, max(v) AS hi
        |FROM generate_series(1, 100000) t(v)
        |WHERE v >= 500 AND v <= 99500""".stripMargin,

    "src_glob_list" ->
      """SELECT CAST(4 AS BIGINT) AS n_files,
        | CAST(sum(length(text) + 1) AS BIGINT) AS total_bytes
        |FROM documents""".stripMargin,

    "src_csv_rejects" ->
      s"""WITH good AS (
        |  SELECT * FROM read_csv('$csvRejectsPath', header=true,
        |    columns={'k': 'INTEGER', 'name': 'VARCHAR', 'v': 'DOUBLE'},
        |    ignore_errors=true)
        |), raw AS (
        |  SELECT * FROM read_csv('$csvRejectsPath', header=false,
        |    columns={'line': 'VARCHAR'}, delim='|', quote='')
        |)
        |-- one SELECT over `good` aggregating EVERY typed column: DuckDB's
        |-- projection pushdown only surfaces cast errors for columns the
        |-- scan actually reads, so a count(*)-only probe would miss them
        |SELECT count(*) AS n_good,
        |       (SELECT count(*) FROM raw) - 1 - count(*) AS n_rejects,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       round(sum(v), 2) AS sum_v
        |FROM good""".stripMargin,

    "src_csv_quoted_dialect" ->
      s"""SELECT count(*) AS n,
        | CAST(sum(length(name)) AS BIGINT) AS name_chars,
        | round(sum(v), 2) AS sum_v
        |FROM read_csv('${csvFixturePath("quoted")}', header=true, delim='|',
        |  quote='"', escape='"',
        |  columns={'k': 'INTEGER', 'name': 'VARCHAR', 'v': 'DOUBLE'})""".stripMargin,

    "src_csv_sniffed" ->
      s"""SELECT count(*) AS n,
        | CAST(sum(length(name)) AS BIGINT) AS name_chars,
        | round(sum(v), 2) AS sum_v
        |FROM read_csv('${csvFixturePath("sniffed")}', header=true, delim=';',
        |  quote='"', escape='"',
        |  columns={'k': 'INTEGER', 'name': 'VARCHAR', 'v': 'DOUBLE'})""".stripMargin,

    "src_csv_nullstr" ->
      s"""SELECT count(*) AS n, count(s) AS n_s, count(v) AS n_v,
        | CAST(sum(v) AS BIGINT) AS sum_v
        |FROM read_csv('${csvFixturePath("nullstr")}', header=true, nullstr='NA',
        |  columns={'k': 'INTEGER', 's': 'VARCHAR', 'v': 'INTEGER'})""".stripMargin,

    "src_csv_no_header_names" ->
      s"""SELECT k, name, v
        |FROM read_csv('${csvFixturePath("noheader")}', header=false,
        |  columns={'k': 'BIGINT', 'name': 'VARCHAR', 'v': 'DOUBLE'})
        |ORDER BY k""".stripMargin,

    "src_csv_dateformat" ->
      s"""SELECT k, d, CAST(year(d) AS INTEGER) AS y
        |FROM read_csv('${csvFixturePath("datefmt")}', header=true,
        |  dateformat='%Y/%m/%d', columns={'k': 'INTEGER', 'd': 'DATE'})
        |ORDER BY k""".stripMargin,

    "src_csv_hive_partitions" ->
      """SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS bal
        |FROM supplier WHERE s_nationkey < 10
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "src_csv_gzip_roundtrip" ->
      """SELECT count(*) AS n,
        | CAST(sum(length(s_name)) AS BIGINT) AS name_chars,
        | round(sum(s_acctbal), 2) AS bal
        |FROM supplier""".stripMargin,

    "src_csv_names_with_header" ->
      s"""SELECT k, s, v
        |FROM read_csv('${csvFixturePath("nameshdr")}', header=true,
        |  names=['k', 's', 'v'],
        |  columns={'k': 'INTEGER', 's': 'VARCHAR', 'v': 'DOUBLE'})
        |ORDER BY k""".stripMargin,

    "src_csv_types_by_name" ->
      s"""SELECT a, b, CAST(length(b) AS INT) AS b_len, c
        |FROM read_csv('${csvFixturePath("typesby")}', header=true,
        |  types={'b': 'VARCHAR'},
        |  columns={'a': 'INTEGER', 'b': 'VARCHAR', 'c': 'DOUBLE'})
        |ORDER BY a""".stripMargin,

    // VALUES oracle: this DuckDB build caps delim at 1 byte, so the
    // multi-byte-delimiter read is reconstructed literally
    "src_csv_multichar_delim" ->
      """SELECT * FROM (VALUES (1, 'aa', 2.5), (2, 'b|b', 3.5)) t(k, s, v)
        |ORDER BY k""".stripMargin,

    "src_csv_deflate" ->
      """SELECT count(*) AS n, CAST(min(r_regionkey) AS INT) AS min_k,
        | CAST(max(r_regionkey) AS INT) AS max_k,
        | CAST(sum(length(r_name)) AS BIGINT) AS s_chars
        |FROM region""".stripMargin,

    "src_csv_empty_first_line" ->
      s"""SELECT k, s
        |FROM read_csv('${csvFixturePath("emptyfirst")}', header=true,
        |  columns={'k': 'INTEGER', 's': 'VARCHAR'})
        |ORDER BY k""".stripMargin,

    "src_csv_partitioned_write" ->
      """SELECT CAST(n_regionkey AS INT) AS r, count(*) AS n,
        | CAST(min(n_nationkey) AS INT) AS min_k
        |FROM nation GROUP BY n_regionkey ORDER BY r""".stripMargin,

    "src_parquet_v2_pages" ->
      """SELECT count(*) AS n,
        | CAST(sum(length(s_name)) AS BIGINT) AS name_chars,
        | round(sum(s_acctbal), 2) AS bal
        |FROM supplier""".stripMargin,

    "src_parquet_no_dictionary" ->
      """SELECT p_brand, count(*) AS n, round(sum(p_retailprice), 2) AS price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "src_csv_per_thread_output" ->
      """SELECT CAST(4 AS BIGINT) AS n_files, count(*) AS n,
        | round(sum(c_acctbal), 2) AS bal
        |FROM customer""".stripMargin,

    "src_parquet_row_groups" ->
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders""".stripMargin,

    "src_parquet_codec_zstd" ->
      """SELECT substr(p_type, 1, 5) AS ty, count(*) AS n,
        | round(sum(p_retailprice), 2) AS price
        |FROM part GROUP BY substr(p_type, 1, 5) ORDER BY ty LIMIT 50""".stripMargin,

    "src_parquet_codec_gzip_snappy" ->
      """SELECT p_brand, count(*) AS n, round(sum(p_retailprice), 2) AS price
        |FROM (SELECT * FROM part UNION ALL SELECT * FROM part) t
        |GROUP BY p_brand ORDER BY p_brand LIMIT 50""".stripMargin,

    "src_parquet_decimal_filter" ->
      """SELECT count(*) AS n,
        | round(CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total
        |FROM part WHERE CAST(p_retailprice AS DECIMAL(12,2)) > 1500.00""".stripMargin,

    "src_parquet_nested_roundtrip" ->
      """SELECT p_brand AS brand, count(*) AS n,
        | round(sum(p_retailprice), 2) AS price,
        | CAST(sum(len(string_split(p_name, ' '))) AS BIGINT) AS n_words
        |FROM part GROUP BY p_brand ORDER BY brand LIMIT 50""".stripMargin,

    "src_parquet_allnull_ts" ->
      """SELECT count(*) AS n, CAST(0 AS BIGINT) AS n_hole,
        | CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS d_min,
        | CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) AS d_max
        |FROM orders""".stripMargin,

    "src_json_nested" ->
      """SELECT p_brand AS brand, count(*) AS n, round(sum(p_retailprice), 2) AS price
        |FROM part GROUP BY p_brand ORDER BY brand LIMIT 50""".stripMargin,

    "src_csv_all_varchar" ->
      s"""SELECT count(*) AS n, max(k) AS max_k, min(v) AS min_v
        |FROM read_csv('${csvFixturePath("typed")}', header=true, all_varchar=true)""".stripMargin,

    "src_csv_dtypes" ->
      s"""SELECT count(*) AS n, max(k) AS max_k, round(sum(v), 2) AS sum_v
        |FROM read_csv('${csvFixturePath("typed")}', header=true,
        |  columns={'k': 'VARCHAR', 'v': 'DOUBLE'})""".stripMargin,

    "src_csv_crlf" ->
      s"""SELECT count(*) AS n,
        | CAST(sum(length(name)) AS BIGINT) AS name_chars,
        | round(sum(v), 2) AS sum_v
        |FROM read_csv('${csvFixturePath("crlf")}', header=true)""".stripMargin,

    "src_csv_filename" ->
      s"""SELECT fname, count(*) AS n FROM (
        |  SELECT (string_split(filename, '/'))[-1] AS fname
        |  FROM read_csv('${csvFixturePath("typed")}', header=true, filename=true)) t
        |GROUP BY fname ORDER BY fname""".stripMargin,

    "src_copy_overwrite" ->
      """SELECT n_regionkey, count(*) AS n FROM nation
        |WHERE n_regionkey >= 2 GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "src_csv_null_padding" ->
      s"""SELECT count(*) AS n, count(a) AS n_a, count(b) AS n_b,
        | CAST(sum(k) AS BIGINT) AS sum_k
        |FROM read_csv('${csvFixturePath("nullpad")}', header=true,
        |  null_padding=true, auto_detect=false,
        |  columns={'k': 'INTEGER', 'a': 'VARCHAR', 'b': 'VARCHAR'})""".stripMargin,

    "src_csv_empty_vs_null" ->
      s"""SELECT k, a, a IS NULL AS is_null, a = '' AS is_empty
        |FROM read_csv('${csvFixturePath("emptynull")}', header=true,
        |  columns={'k': 'INTEGER', 'a': 'VARCHAR'})
        |ORDER BY k""".stripMargin,

    "src_csv_projection" ->
      s"""SELECT round(sum(v), 2) AS sum_v, count(*) AS n
        |FROM read_csv('${csvFixturePath("noheader")}', header=false,
        |  columns={'k': 'BIGINT', 'name': 'VARCHAR', 'v': 'DOUBLE'})""".stripMargin,

    "src_json_to_parquet" ->
      """SELECT CAST(r_regionkey AS INTEGER) AS r_regionkey, r_name
        |FROM region ORDER BY r_regionkey""".stripMargin,

    "src_parquet_bloom_filter" ->
      """SELECT count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem WHERE l_suppkey = 7""".stripMargin,

    "src_read_text" ->
      """SELECT count(*) AS n_lines, CAST(sum(length(text)) AS BIGINT) AS n_chars,
        | round(avg(length(text)), 6) AS avg_len
        |FROM documents""".stripMargin,

    "src_read_blob" ->
      """SELECT CAST(sum(length(text) + 1) AS BIGINT) AS total_bytes,
        | CAST(sum(length(text) + 1) AS BIGINT) AS content_bytes
        |FROM documents""".stripMargin,

    "merge_upsert" ->
      """SELECT o_orderkey,
        | CASE WHEN u.uk IS NOT NULL THEN u.o_custkey ELSE b.o_custkey END AS o_custkey,
        | round(CASE WHEN u.uk IS NOT NULL THEN u.o_totalprice ELSE b.o_totalprice END, 2)
        |   AS o_totalprice
        |FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey < 1000) b
        |FULL OUTER JOIN (
        |  SELECT o_orderkey, o_orderkey AS uk, o_custkey, o_totalprice * 2.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 1500) u
        |USING (o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "merge_delete" ->
      """SELECT count(*) AS n, CAST(sum(o_custkey) AS BIGINT) AS sum_cust
        |FROM orders WHERE o_orderkey < 2000 AND o_custkey % 7 <> 0""".stripMargin,

    "sql_ctas" ->
      """SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "fn_udf" ->
      """SELECT l_returnflag, round(sum(l_extendedprice * (1 + l_tax)), 2) AS taxed
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "sql_parameterized" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_totalprice > 300000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "sql_serialize_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_totalprice > 300000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "sql_macro_udf" ->
      """SELECT l_returnflag, round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the macro's textual expansion — table macros are pure substitution,
    // so the expanded SELECT is the macro's defining equivalence
    "sql_table_macro" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM (SELECT o_orderkey, o_orderpriority, o_totalprice
        |      FROM orders WHERE o_totalprice > 400000.0) t
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // ------------------------- round-11 copy/ option-matrix widening

    "src_csv_quote_escape" ->
      s"""SELECT k, s
        |FROM read_csv('${csvFixturePath("qesc")}', header=true,
        |  quote='''', escape='\\', columns={'k': 'INTEGER', 's': 'VARCHAR'})
        |ORDER BY k""".stripMargin,

    "src_csv_drop_malformed" ->
      s"""SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v,
        | min(k) AS min_k, max(k) AS max_k
        |FROM read_csv('${csvFixturePath("malformed")}', header=true,
        |  ignore_errors=true, columns={'k': 'INTEGER', 'v': 'INTEGER'})""".stripMargin,

    "src_csv_timestampformat" ->
      s"""SELECT k, t
        |FROM read_csv('${csvFixturePath("tsfmt")}', header=true,
        |  timestampformat='%d/%m/%Y %H:%M:%S',
        |  columns={'k': 'INTEGER', 't': 'TIMESTAMP'})
        |ORDER BY k""".stripMargin,

    "src_csv_glob_union" ->
      s"""SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v,
        | min(k) AS min_k, max(k) AS max_k
        |FROM read_csv('${roundtripDir("csv_glob")}/*.csv', header=true,
        |  columns={'k': 'INTEGER', 'v': 'INTEGER'})""".stripMargin,

    "src_csv_header_only" ->
      s"""SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v
        |FROM read_csv('${csvFixturePath("headeronly")}', header=true,
        |  columns={'k': 'INTEGER', 'v': 'INTEGER'})""".stripMargin,

    "src_csv_tab_delim" ->
      s"""SELECT count(*) AS n, round(sum(v), 2) AS sum_v
        |FROM read_csv('${csvFixturePath("tabbed")}', header=true, delim='${"\t"}',
        |  columns={'k': 'INTEGER', 'v': 'DOUBLE'})""".stripMargin,

    "src_csv_bool_infer" ->
      s"""SELECT k, b
        |FROM read_csv('${csvFixturePath("boolcol")}', header=true,
        |  columns={'k': 'INTEGER', 'b': 'BOOLEAN'})
        |ORDER BY k""".stripMargin,

    "src_csv_write_quote_all" ->
      s"""SELECT count(*) AS n, count(maybe) AS n_maybe,
        | CAST(sum(length(s_name)) AS BIGINT) AS name_chars,
        | round(sum(s_acctbal), 2) AS bal
        |FROM read_csv('${roundtripDir("csv_qa")}/*.csv', header=true, delim=';',
        |  quote='"', nullstr='NA',
        |  columns={'s_suppkey': 'INTEGER', 's_name': 'VARCHAR',
        |           's_acctbal': 'DOUBLE', 'maybe': 'VARCHAR'})""".stripMargin,

    "src_json_array_doc" ->
      s"""SELECT k, v, x
        |FROM read_json('${csvFixturePath("json_array")}', format='array',
        |  columns={'k': 'INTEGER', 'v': 'VARCHAR', 'x': 'DOUBLE'})
        |ORDER BY k""".stripMargin,

    "src_json_missing_fields" ->
      s"""SELECT count(*) AS n, count(a) AS n_a, count(b) AS n_b,
        | round(sum(b), 2) AS sum_b
        |FROM read_json('${csvFixturePath("json_missing")}',
        |  format='newline_delimited',
        |  columns={'k': 'INTEGER', 'a': 'VARCHAR', 'b': 'DOUBLE'})""".stripMargin,

    "src_parquet_type_matrix" ->
      s"""SELECT CAST(sum(b) AS BIGINT) AS sum_b, CAST(sum(sh) AS BIGINT) AS sum_sh,
        | CAST(sum(i) AS BIGINT) AS sum_i, CAST(sum(l) AS BIGINT) AS sum_l,
        | round(sum(f), 2) AS sum_f, round(sum(dd), 2) AS sum_dd,
        | CAST(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        | CAST(sum(octet_length(bin)) AS BIGINT) AS bin_bytes,
        | max(s0) AS max_s, min(dt) AS min_dt,
        | CAST(max(ts) AS TIMESTAMP) AS max_ts
        |FROM read_parquet('${roundtripDir("pq_types")}/*.parquet')""".stripMargin,

    "src_parquet_map_roundtrip" ->
      s"""SELECT m['brand'][1] AS brand, count(*) AS n,
        | count(DISTINCT m['kind'][1]) AS nc
        |FROM read_parquet('${roundtripDir("pq_map")}/*.parquet')
        |GROUP BY brand ORDER BY brand""".stripMargin,

    "src_parquet_partition_two_keys" ->
      s"""SELECT l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM read_parquet('${roundtripDir("pq_part2")}/*/*/*.parquet',
        |  hive_partitioning=1)
        |WHERE l_returnflag = 'R'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    // ------------------------- round-12 copy/ option-matrix widening

    "src_csv_skip_rows" ->
      s"""SELECT k, v
        |FROM read_csv('${csvFixturePath("skiprows")}', header=true, skip=2,
        |  columns={'k': 'INTEGER', 'v': 'INTEGER'})
        |ORDER BY k""".stripMargin,

    "src_csv_new_line_cr" ->
      s"""SELECT k, v
        |FROM read_csv('${csvFixturePath("crnl")}', header=true,
        |  new_line='\\r', columns={'k': 'INTEGER', 'v': 'INTEGER'})
        |ORDER BY k""".stripMargin,

    "src_csv_decimal_sep" ->
      s"""SELECT k, v
        |FROM read_csv('${csvFixturePath("decsep")}', header=true, delim=';',
        |  decimal_separator=',', columns={'k': 'INTEGER', 'v': 'DOUBLE'})
        |ORDER BY k""".stripMargin,

    // casts: DuckDB's sniffer infers BIGINT for integer columns while the
    // Spark side states INT — the hash compare is type-sensitive
    "src_csv_union_by_name" ->
      s"""SELECT CAST(a AS INTEGER) AS a, b, CAST(c AS INTEGER) AS c
        |FROM read_csv(['${roundtripDir("csv_ubn")}/a.csv',
        |  '${roundtripDir("csv_ubn")}/b.csv'], header=true,
        |  union_by_name=true)
        |ORDER BY a""".stripMargin,

    // DuckDB 1.0 read_csv predates comment= — expected VALUES instead
    // (the fixture bytes are the constant csvCommentContent)
    "src_csv_comment" ->
      """SELECT * FROM (VALUES (1, 10), (2, 20), (3, 30)) t(k, v)
        |ORDER BY k""".stripMargin,

    // DuckDB 1.0 read_csv has no encoding= — expected VALUES
    "src_csv_encoding_latin1" ->
      """SELECT * FROM (VALUES
        |  (1, 'café', 4), (2, 'naïve', 5), (3, 'über', 4)) t(k, s, chars)
        |ORDER BY k""".stripMargin,

    "src_csv_encoding_utf16" ->
      """SELECT * FROM (VALUES
        |  (1, 'alpha✓', 6), (2, 'betaé', 5), (3, 'gamma', 5)) t(k, s, chars)
        |ORDER BY k""".stripMargin,

    "src_json_gzip" ->
      s"""SELECT count(*) AS n, min(k) AS min_k, max(k) AS max_k,
        | CAST(sum(length(s)) AS BIGINT) AS s_chars
        |FROM read_json('${roundtripDir("json_gz")}/*.json.gz',
        |  format='newline_delimited',
        |  columns={'k': 'INTEGER', 's': 'VARCHAR'})""".stripMargin,

    "src_csv_encoding_utf16be" ->
      """SELECT * FROM (VALUES
        |  (1, 'nordé', 5), (2, 'søster', 6), (3, 'plain', 5)) t(k, s, chars)
        |ORDER BY k""".stripMargin,

    "src_csv_encoding_utf16le" ->
      """SELECT * FROM (VALUES
        |  (1, 'léft', 4), (2, 'façade', 6), (3, 'plain', 5)) t(k, s, chars)
        |ORDER BY k""".stripMargin,

    "src_csv_bzip2" ->
      """SELECT count(*) AS n, CAST(min(n_nationkey) AS INT) AS min_k,
        | CAST(max(n_nationkey) AS INT) AS max_k,
        | CAST(sum(length(n_name)) AS BIGINT) AS s_chars
        |FROM nation""".stripMargin,

    "src_csv_write_quote_escape" ->
      """SELECT * FROM (VALUES
        |  (1, 'plain', 5), (2, 'comma,inside', 12), (3, 'quote''inside', 12),
        |  (4, 'both'',and', 9), (5, 'line' || chr(10) || 'break', 10))
        |  t(k, s, chars)
        |ORDER BY k""".stripMargin,

    "src_csv_write_null_literal" ->
      """SELECT * FROM (VALUES
        |  (1, false, 'a'), (2, true, '-'), (3, false, 'NULL-ish'),
        |  (4, false, 'z')) t(k, is_null, s)
        |ORDER BY k""".stripMargin,

    "src_parquet_page_row_limit" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "src_parquet_block_size_matrix" ->
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM (SELECT * FROM orders UNION ALL SELECT * FROM orders) t""".stripMargin,

    "src_parquet_per_thread_output" ->
      """SELECT CAST(4 AS BIGINT) AS n_files, count(*) AS n,
        | round(sum(c_acctbal), 2) AS bal
        |FROM customer""".stripMargin,

    // r15 drip — the footer pins read the SPARK-WRITTEN files
    "src_parquet_field_ids" ->
      s"""SELECT name, CAST(field_id AS INT) AS field_id
         |FROM parquet_schema('$tmpRoot/pq_field_ids/*.parquet')
         |WHERE field_id IS NOT NULL ORDER BY name""".stripMargin,

    "src_parquet_kv_metadata" ->
      s"""SELECT CAST(key AS VARCHAR) AS key
         |FROM parquet_kv_metadata('$tmpRoot/pq_kv_meta/*.parquet')
         |ORDER BY key""".stripMargin,

    "src_parquet_file_row_number" ->
      s"""SELECT o_orderkey, CAST(file_row_number AS BIGINT) AS frn
         |FROM read_parquet('$tmpRoot/pq_frn/*.parquet', file_row_number=true)
         |ORDER BY o_orderkey""".stripMargin,

    "src_parquet_compression_level" ->
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total,
        | true AS zstd_chunks
        |FROM (SELECT * FROM orders UNION ALL SELECT * FROM orders) t""".stripMargin,

    "src_parquet_binary_as_string" ->
      s"""SELECT p_partkey, bn AS nm
         |FROM read_parquet('$tmpRoot/pq_bas/*.parquet', binary_as_string=true)
         |ORDER BY p_partkey""".stripMargin,

    "src_partitioned_overwrite_dynamic" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(sum(l_quantity + CASE WHEN l_returnflag = 'R' THEN 1000 ELSE 0 END), 2) AS qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "src_partitioned_append" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM (SELECT o_orderstatus, o_totalprice FROM orders
        |      UNION ALL
        |      SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F') t
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "src_parquet_filename_uuid" ->
      """SELECT count(*) AS n, round(sum(c_acctbal), 2) AS bal,
        | true AS uuid_named
        |FROM customer""".stripMargin,

    "src_csv_write_dateformat" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
        | CAST(o_orderdate AS DATE) AS ots_d
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,

    "src_csv_write_gzip" ->
      """SELECT count(*) AS n, round(sum(s_acctbal), 2) AS bal,
        | true AS gzipped
        |FROM supplier""".stripMargin
  )
}
