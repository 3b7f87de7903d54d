package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver testdata (dev/bench evidence only;
  * never a test input): replicates each table K times with key-space
  * offsets that preserve every foreign-key relationship, so the headline
  * queries run the same logical work on K× the rows. Used to measure the
  * engine at sf≈1 against a DuckDB baseline on the SAME files
  * (tools/rebaseline.py <outDir>) — the scale-factor evidence for the
  * per-query dispatch-floor amortization argument in PERF.md.
  *
  * Copy i maps: key' = key + i*stride(table) with stride = max(key)+1,
  * applied consistently on both sides of every FK (custkey, orderkey,
  * partkey, suppkey, user_id). nation/region stay fixed (as in TPC-H);
  * dates/values are untouched so filter selectivities are scale-invariant.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.tune(SparkSession.builder()
        .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def read(name: String): DataFrame = {
      val raw = spark.read.parquet(s"$src/$name.parquet")
      if (name == "events") Tables.normalizeEventsTs(raw) else raw
    }

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    def replicate(df: DataFrame, offsets: Map[String, Long]): DataFrame =
      (0 until k).map { i =>
        offsets.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(i * s))
        }
      }.reduce(_ unionAll _)

    val cust = read("customer"); val ord = read("orders"); val li = read("lineitem")
    val supp = read("supplier"); val part = read("part"); val ev = read("events")
    val cStride = stride(cust, "c_custkey")
    val oStride = stride(ord, "o_orderkey")
    val pStride = stride(part, "p_partkey")
    val sStride = stride(supp, "s_suppkey")
    val uStride = stride(ev, "user_id")
    val eStride = stride(ev, "event_id")

    val plan: Seq[(String, DataFrame)] = Seq(
      "region" -> read("region"),
      "nation" -> read("nation"),
      "customer" -> replicate(cust, Map("c_custkey" -> cStride)),
      "supplier" -> replicate(supp, Map("s_suppkey" -> sStride)),
      "part" -> replicate(part, Map("p_partkey" -> pStride)),
      "orders" -> replicate(ord, Map("o_orderkey" -> oStride, "o_custkey" -> cStride)),
      "lineitem" -> replicate(li, Map(
        "l_orderkey" -> oStride, "l_partkey" -> pStride, "l_suppkey" -> sStride)),
      "events" -> replicate(ev, Map("event_id" -> eStride, "user_id" -> uStride)),
      "documents" -> {
        val docs = read("documents")
        replicate(docs, Map("doc_id" -> stride(docs, "doc_id")))
      },
      "embeddings" -> {
        val emb = read("embeddings")
        replicate(emb, Map("vec_id" -> stride(emb, "vec_id")))
      })

    plan.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"wrote $out/$name.parquet")
    }
    spark.stop()
  }
}
