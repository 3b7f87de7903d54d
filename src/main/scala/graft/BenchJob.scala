package graft

import org.apache.spark.sql.SparkSession

/** JOB slice as a PERFORMANCE suite — the 12 verbatim join-order shapes
  * (queries/JobSlice.scala) over a factor-scaled ImdbFixture, paired
  * same-hour vs DuckDB (tools/bench_job_duckdb.py reads the dir this
  * main prints + tools/job_duck_texts.json from DumpJobTexts).
  *
  * Protocol matches BenchClickBench (probe gate, 2 warmups + median of
  * 5) with TWO deliberate differences, both of them what a warehouse
  * deployment of this engine looks like for ad-hoc multi-join SQL:
  *
  *  - **ANALYZE'd catalog tables + CBO join reorder** instead of the
  *    warm cache. JOB is the join-ordering benchmark; Spark's default
  *    syntactic join order starts 17a at cast_info⋈movie_companies
  *    (the two biggest unfiltered tables) and pays 50-70 s where the
  *    selective keyword→movie_keyword path costs ~1 s. DuckDB keeps
  *    table/column stats automatically; the Spark analog is
  *    `ANALYZE TABLE .. FOR ALL COLUMNS` + `spark.sql.cbo.joinReorder`,
  *    so both engines plan from equivalent statistics. The cache is
  *    deliberately NOT used: InMemoryRelation carries row/byte counts
  *    but no column stats, so caching would silently disable the
  *    reorder (GRAFT_DS_CACHE=1 opts back in to measure exactly that).
  *  - **AQE ON** (SPARK_GRAFT_AQE=false flips): runtime replanning is
  *    the second half of the join-ordering answer (an AQE-off attempt
  *    wedged on job_13b's static order), and the broadcast threshold
  *    stays at Spark's 10 MB default (GRAFT_BROADCAST_THRESHOLD
  *    overrides) — the 64 MB bench default broadcasts 800k-row
  *    relations into 30 s single-threaded driver builds here.
  *
  * Usage: SPARK_GRAFT_IMDB_FACTOR=20 sbt "runMain graft.BenchJob [job_NNx ...]"
  */
object BenchJob {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_IMDB_FACTOR", "20").toLong
    val names = if (args.nonEmpty) args.toSeq else queries.JobSlice.texts.map(_._1)
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      // bench-scale floor (r11 plan audit): size-based coalescing once
      // serialized dsq95's 3M-row shuffle into ONE 831 ms task; at this
      // suite's local[32] keep AQE from coalescing below the core count
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("GRAFT_BROADCAST_THRESHOLD", (10L << 20).toString))
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_job_wh_${
          java.util.UUID.randomUUID().toString.take(8)}")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())
    def probeMs(): Double = {
      val t = (1 to 40).map { _ =>
        val t0 = System.nanoTime(); probe.count(); (System.nanoTime() - t0) / 1e6
      }.sorted
      t(t.length / 2)
    }
    val dir = graft.sources.ImdbFixture.ensureScaled(spark, factor)
    println(s"scaled_dir=$dir factor=$factor")
    // GRAFT_JOB_BUCKETS=N: lay the movie-keyed tables out bucketed+sorted
    // on their join key (the warehouse layout for a fact-to-fact join
    // chain) — every movie_id⋈movie_id/id SMJ then co-locates with no
    // exchange and no sort. One-time layout cost, reported separately.
    val buckets = sys.env.get("GRAFT_JOB_BUCKETS").map(_.toInt)
    val bucketKey: Map[String, String] = Map(
      "title" -> "id", "movie_companies" -> "movie_id",
      "movie_keyword" -> "movie_id", "movie_info" -> "movie_id",
      "movie_info_idx" -> "movie_id", "cast_info" -> "movie_id")
    val t0s = System.nanoTime()
    graft.sources.ImdbFixture.tables.foreach { t =>
      (buckets, bucketKey.get(t)) match {
        case (Some(n), Some(k)) =>
          spark.read.parquet(s"$dir/$t.parquet")
            .write.bucketBy(n, k).sortBy(k).format("parquet").saveAsTable(t)
        case _ =>
          spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$dir/$t.parquet'")
      }
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
      if (sys.env.get("GRAFT_DS_CACHE").contains("1")) {
        spark.catalog.cacheTable(t)
        spark.table(t).count()
      }
    }
    println(f"analyze_all_tables_s=${(System.nanoTime() - t0s) / 1e9}%.1f" +
      buckets.map(n => s" buckets=$n").getOrElse(""))
    locally {
      val gate = sys.env.getOrElse("SPARK_GRAFT_PROBE_GATE_MS", "22").toDouble
      var tries = 0
      var p = probeMs()
      while (gate > 0 && p > gate && tries < 20) {
        println(f"[probe-gate] degraded phase: $p%.1f ms/job > $gate%.0f — waiting 30s")
        Thread.sleep(30000)
        tries += 1
        p = probeMs()
      }
      println(f"probe_job_ms_before=$p%.1f")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    val textMap = queries.JobSlice.texts.toMap
    val warmups = sys.env.getOrElse("GRAFT_BENCH_WARMUPS", "2").toInt
    val runs = sys.env.getOrElse("GRAFT_BENCH_RUNS", "5").toInt
    names.foreach { name =>
      val sql = textMap(name)
      println(s"[jobbench] start $name")
      Console.flush()
      (1 to warmups).foreach(_ => spark.sql(sql).collect())
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).collect()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"[jobbench] $name%-9s median=${med(ts)}%8.1f ms  runs=${
        ts.map(t => f"$t%.0f").mkString(",")}")
      // GRAFT_JOB_DECOMP=1: split the wall into Catalyst planning (CBO
      // join-reorder DP included), pure re-execution of one pre-planned
      // DataFrame, and the fresh wall — the PERF.md floor-decomposition
      // protocol (fresh ≈ plan + reexec validates it)
      if (sys.env.get("GRAFT_JOB_DECOMP").contains("1")) {
        def med9(body: => Unit): Double = {
          val xs = (1 to 9).map { _ =>
            val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
          }.sorted
          xs(4)
        }
        val prebuilt = spark.sql(sql)
        prebuilt.collect()
        val plan = med9 { spark.sql(sql).queryExecution.executedPlan }
        val reexec = med9 { prebuilt.collect() }
        println(f"[jobdecomp] $name%-9s plan=$plan%7.1f ms  reexec=$reexec%7.1f ms" +
          f"  plan_share=${100 * plan / med(ts)}%4.1f%%")
      }
      if (sys.env.contains("GRAFT_EXPLAIN")) {
        val dfx = spark.sql(sql)
        dfx.collect()
        println(dfx.queryExecution.executedPlan.toString.take(5000))
      }
    }
    println(f"probe_job_ms_after=${probeMs()}%.1f")
    spark.stop()
  }
}
