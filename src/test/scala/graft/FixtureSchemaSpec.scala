package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema drift guard (r14 verdict finding #3): the h2o join
  * lane ran THREE ROUNDS with v1/v2 silently typed DECIMAL(27,6) —
  * an untyped `/64.0` literal — which disabled the columnar cache on
  * the whole lane and mis-shaped the DuckDB comparison. Every fixture
  * table's Spark schema is pinned here, column by column, against the
  * reference's declared types (h2oai CSV spec: group id1-3 varchar /
  * id4-6,v1,v2 int32 / v3 float8, join v-columns float8; IMDB
  * imdb_plan_cost/init/schema.sql integer/varchar — ALSO cross-checked
  * by parsing that file; TPC-H/DS dbgen types under the repo's
  * documented money-as-integer-valued-DOUBLE convention, TpchFixture
  * scaladoc). Any untyped literal that re-types a column fails here in
  * CI, not three rounds later in a pairing.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  import SparkTestSession._

  private def schemaOf(dir: String, table: String): Seq[String] =
    spark.read.parquet(s"$dir/$table.parquet").schema.fields.toSeq
      .map(f => s"${f.name}:${f.dataType.simpleString}")

  private def assertSchema(dir: String, table: String, expect: String): Unit = {
    val got = schemaOf(dir, table).mkString(", ")
    assert(got == expect, s"\n$table schema drift:\n  got    $got\n  expect $expect")
  }

  test("h2o fixture: reference csv types (the DECIMAL regression pin)") {
    graft.sources.H2oFixture.ensureGate(spark)
    val d = graft.sources.H2oFixture.gateDir
    assertSchema(d, "x_group",
      "id1:string, id2:string, id3:string, id4:int, id5:int, id6:int, " +
        "v1:int, v2:int, v3:double")
    assertSchema(d, "x",
      "id1:int, id2:int, id3:int, id4:string, id5:string, id6:string, v1:double")
    assertSchema(d, "small", "id1:int, id4:string, v2:double")
    assertSchema(d, "medium", "id1:int, id2:int, id4:string, id5:string, v2:double")
    assertSchema(d, "big",
      "id1:int, id2:int, id3:int, id4:string, id5:string, id6:string, v2:double")
  }

  test("tpch fixture: dbgen types (int keys, double money, date dates)") {
    graft.sources.TpchFixture.ensure(spark)
    val d = graft.sources.TpchFixture.dir
    assertSchema(d, "region", "r_regionkey:int, r_name:string, r_comment:string")
    assertSchema(d, "nation",
      "n_nationkey:int, n_name:string, n_regionkey:int, n_comment:string")
    assertSchema(d, "supplier",
      "s_suppkey:int, s_name:string, s_address:string, s_nationkey:int, " +
        "s_phone:string, s_acctbal:double, s_comment:string")
    assertSchema(d, "part",
      "p_partkey:int, p_name:string, p_mfgr:string, p_brand:string, " +
        "p_type:string, p_size:int, p_container:string, p_retailprice:double, " +
        "p_comment:string")
    assertSchema(d, "partsupp",
      "ps_partkey:int, ps_suppkey:int, ps_availqty:int, ps_supplycost:double, " +
        "ps_comment:string")
    assertSchema(d, "customer",
      "c_custkey:int, c_name:string, c_address:string, c_nationkey:int, " +
        "c_phone:string, c_acctbal:double, c_mktsegment:string, c_comment:string")
    assertSchema(d, "orders",
      "o_orderkey:int, o_custkey:int, o_orderstatus:string, o_totalprice:double, " +
        "o_orderdate:date, o_orderpriority:string, o_clerk:string, " +
        "o_shippriority:int, o_comment:string")
    assertSchema(d, "lineitem",
      "l_orderkey:int, l_partkey:int, l_suppkey:int, l_linenumber:int, " +
        "l_quantity:double, l_extendedprice:double, l_discount:double, " +
        "l_tax:double, l_returnflag:string, l_linestatus:string, " +
        "l_shipdate:date, l_commitdate:date, l_receiptdate:date, " +
        "l_shipinstruct:string, l_shipmode:string, l_comment:string")
  }

  test("imdb fixture: every carried column matches the reference schema.sql type") {
    graft.sources.ImdbFixture.ensureGate(spark)
    val d = graft.sources.ImdbFixture.gateDir
    // parse the reference's typed DDL: integer -> int, varchar/text -> string
    val ddl = scala.io.Source.fromFile(
      "/root/reference/benchmark/imdb_plan_cost/init/schema.sql").mkString
    val tableRe = "(?s)CREATE TABLE (\\w+) \\((.*?)\\);".r
    val colRe = "^\\s*(\\w+)\\s+(integer|character varying\\(\\d+\\)|text)".r
    val refTypes: Map[String, Map[String, String]] = tableRe.findAllMatchIn(ddl).map { m =>
      val cols = m.group(2).split("\n").flatMap {
        colRe.findFirstMatchIn(_).map { c =>
          c.group(1) -> (if (c.group(2) == "integer") "int" else "string")
        }
      }.toMap
      m.group(1) -> cols
    }.toMap
    assert(refTypes.size == 21, s"schema.sql parse found ${refTypes.size} tables")
    graft.sources.ImdbFixture.tables.foreach { t =>
      val ref = refTypes(t)
      schemaOf(d, t).foreach { col =>
        val Array(name, tpe) = col.split(":")
        assert(ref.get(name).contains(tpe),
          s"$t.$name is $tpe, reference schema.sql says ${ref.get(name)}")
      }
    }
  }

  test("tpcds fixture: dbgen types (int sk, bigint order/ticket numbers, double money)") {
    graft.sources.TpcdsFixture.ensure(spark)
    val d = graft.sources.TpcdsFixture.dir
    // spot-pin the fact tables' identity/money columns (full widths are
    // query-derived; the drift classes that matter are key + money types)
    def types(t: String): Map[String, String] =
      schemaOf(d, t).map { c => val Array(n, tp) = c.split(":"); n -> tp }.toMap
    val ss = types("store_sales")
    assert(ss("ss_ticket_number") == "bigint" && ss("ss_item_sk") == "int" &&
      ss("ss_net_paid") == "double" && ss("ss_quantity") == "int", ss.toString)
    val cs = types("catalog_sales")
    assert(cs("cs_order_number") == "bigint" && cs("cs_net_profit") == "double", cs.toString)
    val ws = types("web_sales")
    assert(ws("ws_order_number") == "bigint" && ws("ws_sales_price") == "double", ws.toString)
    val dd = types("date_dim")
    assert(dd("d_date_sk") == "int" && dd("d_date") == "date" &&
      dd("d_year") == "int", dd.toString)
    val it = types("item")
    assert(it("i_item_sk") == "int" && it("i_current_price") == "double", it.toString)
    val inv = types("inventory")
    assert(inv("inv_date_sk") == "int" && inv("inv_quantity_on_hand") == "double",
      inv.toString)
  }
}
