package graft

import graft.sources.CsvSniffer
import graft.sources.CsvSniffer.Dialect
import org.scalatest.funsuite.AnyFunSuite

/** sources/CsvSniffer: dialect detection lands on the generating dialect
  * across the candidate space (delimiters, quote rules, embedded
  * delimiters/quotes), and the end-to-end read needs no explicit options.
  */
class CsvSnifferSpec extends AnyFunSuite {
  import SparkTestSession._

  private def write(content: String): String = {
    val p = java.nio.file.Files.createTempFile("sniff", ".csv")
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("detects each candidate delimiter from consistent samples") {
    for (delim <- Seq(',', '|', ';', '\t')) {
      val d = delim.toString
      val path = write(
        s"a${d}b${d}c\n1${d}x${d}2.5\n2${d}y${d}3.5\n3${d}z${d}4.5\n")
      val got = CsvSniffer.sniff(spark, path)
      assert(got.delimiter == delim, s"delim=<$delim> got $got")
    }
  }

  test("embedded delimiters inside quotes do not fool the field counter") {
    // under the wrong dialect (no quote awareness) rows would disagree
    // on field counts; the right dialect scores consistent
    val path = write(
      "k;name;v\n1;\"a;b;c\";1.5\n2;\"d;e\";2.5\n3;plain;3.5\n")
    val got = CsvSniffer.sniff(spark, path)
    assert(got.delimiter == ';' && got.quote == '"', got.toString)
  }

  test("single-quote dialect detected") {
    val path = write(
      "k|name|v\n1|'a|pha'|1.5\n2|'be|ta'|2.5\n3|'ga|mma'|3.5\n")
    val got = CsvSniffer.sniff(spark, path)
    assert(got.delimiter == '|' && got.quote == '\'', got.toString)
  }

  test("field counter handles doubled quotes and partial tail rows") {
    val counts = CsvSniffer.fieldCounts(
      "a,b\n\"x\"\"y\",2\n\"q,q\",3\npartial", Dialect(',', '"', '"'))
    assert(counts == Seq(2, 2, 2, 1))
  }

  test("bare-\\r (classic-Mac) line endings terminate rows for scoring") {
    // without the bare-\r terminator the whole sample collapses into one
    // row and the delimiter can't be scored by per-row consistency
    val path = write("a|b|c\r1|x|2.5\r2|y|3.5\r3|z|4.5\r")
    val got = CsvSniffer.sniff(spark, path)
    assert(got.delimiter == '|', got.toString)
    // \r\n must still count each row ONCE (the \n ends it)
    val crlf = write("a|b|c\r\n1|x|2.5\r\n2|y|3.5\r\n")
    assert(CsvSniffer.sniff(spark, crlf).delimiter == '|')
  }

  test("end-to-end read with no explicit options matches the data") {
    val path = write("k\tname\tv\n1\talpha\t1.5\n2\tbeta\t2.5\n")
    val rows = CsvSniffer.read(spark, path).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("name")).toSet == Set("alpha", "beta"))
    assert(rows.map(_.getAs[Double]("v")).sum == 4.0)
  }

  test("parseRows unquotes doubled quotes, embedded delimiters and newlines") {
    val d = Dialect('|', '"', '"')
    val rows = CsvSniffer.parseRows(
      "k|s\n1|\"a|b\"\n2|\"say \"\"hi\"\"\"\n3|\"two\nlines\"\n", d)
    assert(rows == Seq(Seq("k", "s"), Seq("1", "a|b"),
      Seq("2", "say \"hi\""), Seq("3", "two\nlines")))
  }

  test("sniffAll: header + type ladder (bool/bigint/double/date/ts/varchar)") {
    val path = write(
      "k,flag,price,d,t,s\n" +
      "1,true,1.5,2024-01-02,2024-01-02 03:04:05,alpha\n" +
      "2,false,2.5,2024-02-03,2024-02-03 04:05:06,beta\n" +
      "3,true,7,2024-03-04,2024-03-04 05:06:07,gamma\n")
    val r = CsvSniffer.sniffAll(spark, path)
    assert(r.hasHeader)
    assert(r.columns == Seq("k" -> "BIGINT", "flag" -> "BOOLEAN",
      "price" -> "DOUBLE", "d" -> "DATE", "t" -> "TIMESTAMP", "s" -> "VARCHAR"))
    assert(r.dateFormat.contains("%Y-%m-%d"))
    assert(r.newline == "\\n")
  }

  test("sniffAll: headerless numeric file gets generated names, no header") {
    val r = CsvSniffer.sniffAll(spark, write("1,10\n2,20\n3,30\n"))
    assert(!r.hasHeader)
    assert(r.columns == Seq("column00" -> "BIGINT", "column01" -> "BIGINT"))
  }

  test("sniffAll: all-varchar table still detects a distinct header row") {
    val r = CsvSniffer.sniffAll(spark, write("name,city\nann,oslo\nbob,rome\n"))
    assert(r.hasHeader)
    assert(r.columns.map(_._1) == Seq("name", "city"))
    assert(r.columns.forall(_._2 == "VARCHAR"))
  }

  test("sniffRowsHashable: one row, reference sniff_csv column set") {
    val df = CsvSniffer.sniffRowsHashable(spark, write("k;v\n1;2,0\n2;3,5\n"))
    assert(df.columns.toSeq == Seq("Delimiter", "Quote", "Escape",
      "NewLineDelimiter", "Comment", "SkipRows", "HasHeader", "Columns",
      "DateFormat", "TimestampFormat", "UserArguments", "Prompt"))
    val row = df.collect().head
    assert(row.getAs[String]("Delimiter") == ";")
    assert(row.getAs[Boolean]("HasHeader"))
    assert(row.getAs[String]("Prompt").startsWith("FROM read_csv("))
    // gated variant serializes Columns for the hash harness
    assert(row.getAs[String]("Columns").startsWith("""[{"name":"""))
  }

  test("sniffRows (default API): Columns keeps the reference list<struct> shape") {
    val df = CsvSniffer.sniffRows(spark, write("k;v\n1;2,0\n2;3,5\n"))
    val colsField = df.schema("Columns").dataType
    import org.apache.spark.sql.types._
    colsField match {
      case ArrayType(s: StructType, _) =>
        assert(s.fieldNames.toSeq == Seq("name", "type"))
      case other => fail(s"Columns should be array<struct>, got $other")
    }
    val cols = df.collect().head.getSeq[org.apache.spark.sql.Row](7)
    assert(cols.map(_.getString(0)) == Seq("k", "v"))
  }
}
