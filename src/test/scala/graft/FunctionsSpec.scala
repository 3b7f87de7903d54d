package graft

import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("vector expressions compute correct values (float path)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.inner_product($"a", $"b").as("ip"),
      VectorFunctions.cosine_similarity($"a", $"b").as("cos"),
      VectorFunctions.l2_distance($"a", $"b").as("l2")).head()
    assert(r.getFloat(0) == 32.0f)
    assert(math.abs(r.getFloat(1) - 0.9746318f) < 1e-6)
    assert(math.abs(r.getFloat(2) - math.sqrt(27.0)) < 1e-5)
  }

  test("vector expressions survive whole-stage codegen over many rows") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (Array.fill(16)(i.toFloat), Array.fill(16)(1.0f))).toDF("a", "b")
    val s = df.select(sum(VectorFunctions.inner_product($"a", $"b"))).head().getDouble(0)
    assert(s == (1 to 1000).map(_ * 16.0).sum)
  }

  test("length-mismatched vectors yield null") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.inner_product($"a", $"b")).head().isNullAt(0))
  }

  test("string similarity matches reference semantics") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("red anvil", "standard"))
      .toDF("a", "b")
    val got = df.select(StringFunctions.jaro_winkler($"a", $"b")).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(got(1) - 0.8133333333333332) < 1e-12)
    assert(math.abs(got(2) - 0.4583333333333333) < 1e-12) // odd transposition count floors
    val dl = Seq(("CA", "ABC"), ("abcd", "acbd")).toDF("a", "b")
      .select(StringFunctions.damerau_levenshtein($"a", $"b")).collect().map(_.getLong(0))
    assert(dl.toSeq == Seq(2L, 1L)) // true DL, not OSA (OSA would give 3)
    val j = Seq(("abc", "abd")).toDF("a", "b")
      .select(StringFunctions.jaccard_sim($"a", $"b"),
        StringFunctions.hamming($"a", $"b")).head()
    assert(j.getDouble(0) == 0.5 && j.getLong(1) == 1L)
  }

  test("json_merge_patch matches the oracle's probed edge semantics") {
    def m(t: String, p: String): Any =
      spark.sql(s"SELECT json_merge_patch($t, $p)").head().get(0)
    // probes run against DuckDB 1.0 (see JsonExtra scaladoc)
    assert(m("'{\"a\":1,\"b\":{\"c\":2,\"d\":3}}'", "'{\"b\":{\"c\":null,\"e\":9},\"f\":[1,2]}'")
      == """{"a":1,"b":{"d":3,"e":9},"f":[1,2]}""")
    assert(m("'{\"a\":1}'", "'2'") == "2")
    assert(m("'{\"a\":1}'", "'null'") == "null")
    assert(m("'{\"a\":1}'", "'{\"a\":null}'") == "{}")
    assert(m("'[1,2]'", "'{\"a\":1}'") == """{"a":1}""")
    assert(m("NULL", "'{\"a\":null,\"b\":1}'") == """{"a":null,"b":1}""") // verbatim
    assert(m("'{\"a\":1}'", "NULL") == null)
    assert(m("'{}'", "'{\"a\":{\"b\":null,\"c\":1}}'") == """{"a":{"c":1}}""")
    assert(m("'{\"a\":1}'", "'{\"b\":[1,null,2]}'") == """{"a":1,"b":[1,null,2]}""")
  }

  test("json_pretty renders the reference's 4-space layout") {
    def p(j: String): Any = spark.sql(s"SELECT json_pretty('$j')").head().get(0)
    assert(p("""{"a":1,"b":[1,{"x":null}]}""") ==
      "{\n    \"a\": 1,\n    \"b\": [\n        1,\n        {\n            \"x\": null\n        }\n    ]\n}")
    assert(p("{}") == "{}")
    assert(p("[]") == "[]")
    assert(p("""{"a":{}}""") == "{\n    \"a\": {}\n}")
    assert(p(""""s"""") == "\"s\"")
  }

  test("functions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) c, " +
        "jaro_winkler('MARTHA', 'MARHTA') j, product_agg(x) p FROM VALUES (2.0), (3.0) t(x)")
      .head()
    assert(r.getDouble(0) == 1.0)
    assert(math.abs(r.getDouble(1) - 0.9611111111111111) < 1e-12)
    assert(r.getDouble(2) == 6.0)
  }

  test("bar matches the oracle's rendering, clamps, and byte padding") {
    import spark.implicits._
    import UnicodeBar.bar
    def b(x: Double, mn: Double, mx: Double, w: Double): String =
      Seq(x).toDF("x").select(bar($"x", lit(mn), lit(mx), lit(w))).head().getString(0)
    // values pinned against DuckDB 1.0 (the driver's oracle)
    assert(b(0.4, 0, 10, 8) == "▎" + " " * 5)           // 2 eighths, 3-byte pad
    assert(b(1.24, 0, 10, 80) == "█" * 9 + "▉" + " " * 50)
    assert(b(0.390625, 0, 10, 8) == "▎" + " " * 5)      // 2.5 eighths truncates
    assert(b(10, 0, 10, 8) == "█" * 8)                  // full: no padding fits
    assert(b(-1, 0, 10, 8) == " " * 8)                       // x <= min
    assert(b(11, 0, 10, 8) == "█" * 8)                  // x >= max
    assert(b(5, 10, 0, 8) == " " * 8)                        // min >= max -> empty
    assert(b(5, 5, 5, 8) == " " * 8)
    assert(b(Double.NaN, 0, 10, 8) == " " * 8)
    assert(b(5, 0, 10, 7.5) == "█" * 3 + "▊")      // fractional width
    assert(b(5, 0, 10, 7.9) == "█" * 3 + "▉")
    intercept[Exception](b(5, 0, 10, 0))
    intercept[Exception](b(5, 0, 10, 1001))
    // null propagation + SQL registration with default width 80
    assert(Seq(Option.empty[java.lang.Double]).toDF("x")
      .select(bar($"x", lit(0.0), lit(10.0), lit(8.0))).head().isNullAt(0))
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT bar(0.0, 0, 10)").head().getString(0) == " " * 80)
    assert(spark.sql("SELECT bar(2.5, 0, 10, 8)").head().getString(0) == "██  ")
  }

  test("bar reference layout pads to width characters") {
    import spark.implicits._
    import UnicodeBar.barReference
    def b(x: Double, mn: Double, mx: Double, w: Double): String =
      Seq(x).toDF("x").select(barReference($"x", lit(mn), lit(mx), lit(w)))
        .head().getString(0)
    assert(b(0.4, 0, 10, 8) == "▎" + " " * 7)   // 1 block char + 7 columns
    assert(b(1.24, 0, 10, 80) == "█" * 9 + "▉" + " " * 70)
    assert(b(10, 0, 10, 8) == "█" * 8)          // full bar: no padding
    assert(b(-1, 0, 10, 8) == " " * 8)          // empty bar: width spaces
    assert(b(5, 0, 10, 8) == "█" * 4 + " " * 4)
  }

  test("bar survives whole-stage codegen over many rows") {
    import spark.implicits._
    import UnicodeBar.bar
    val n = spark.range(1000).toDF("i")
      .select(length(bar($"i".cast("double"), lit(0.0), lit(1000.0), lit(10.0))).as("l"))
      .agg(sum($"l")).head().getLong(0)
    assert(n > 0) // every row rendered; exact per-row values pinned above
  }

  test("SqlSerde: envelope carries the real AST; execute validates and replays") {
    import graft.functions.SqlSerde
    val doc = SqlSerde.serialize(spark,
      "SELECT x, count(*) AS n FROM t GROUP BY x ORDER BY x")
    // real Catalyst AST: the serialized plan names the parser's nodes
    assert(doc.contains("UnresolvedRelation"), doc.take(200))
    assert(doc.contains("Aggregate") && doc.contains("Sort"), doc.take(200))
    // valid JSON with both fields
    val j = org.json4s.jackson.JsonMethods.parse(doc)
    assert((j \ "sql") != org.json4s.JNothing && (j \ "ast") != org.json4s.JNothing)
    // round-trip executes
    import spark.implicits._
    Seq((1, "a"), (1, "b"), (2, "c")).toDF("x", "y").createOrReplaceTempView("t")
    val got = SqlSerde.executeSerialized(spark, doc).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((1, 2L), (2, 1L)))
    // invalid SQL fails at serialize; a non-envelope fails at execute
    intercept[Exception] { SqlSerde.serialize(spark, "SELEKT broken FROM") }
    intercept[IllegalArgumentException] {
      SqlSerde.executeSerialized(spark, """{"not":"an envelope"}""")
    }
  }
}
