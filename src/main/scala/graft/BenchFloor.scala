package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only floor probe: in ONE hot JVM (same warmup protocol as Bench),
  * attribute per-query wall between (a) the bare job-dispatch floor,
  * (b) the data-path task time, and (c) the SQL collect() envelope — and
  * measure the best-case single-job driver-merge shape against the
  * current two-stage aggregate plans. Informs whether a driver-finalized
  * low-cardinality aggregate operator pays for itself.
  */
object BenchFloor {
  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e6
  }
  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.cacheMode = true
    spark.conf.set("spark.sql.ui.explainMode", "simple")
    locally {
      val probe = spark.sparkContext.parallelize(1 to 32, 32)
      (1 to 120).foreach(_ => probe.count())
    }
    val ev = Tables(spark, sfDir, "events")
    val li = Tables(spark, sfDir, "lineitem")
    (1 to 3).foreach { _ => ev.count(); li.count() }

    def report(name: String, fn: => Unit, n: Int = 9): Unit = {
      (1 to 3).foreach(_ => fn)
      println(f"[floor] $name%-34s ${med((1 to n).map(_ => time(fn)))}%7.2f ms")
    }

    val probe1 = spark.sparkContext.parallelize(1 to 1, 1)
    val probe32 = spark.sparkContext.parallelize(1 to 32, 32)
    report("probe_job_1task", probe1.count())
    report("probe_job_32task", probe32.count())
    report("events_count_df", ev.count())
    report("events_count_rdd",
      spark.sparkContext.runJob(ev.queryExecution.toRdd,
        (it: Iterator[_]) => { var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n }))

    // current tumbling (declarative; exchange-free off the 1-part cache)
    def tumbling = ev
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
      .orderBy(col("bucket"), col("event_type")).limit(50)
    report("tumbling_current", { val df = tumbling; df.queryExecution.executedPlan; df.collect() })

    // floor shape: ONE job over the partial-projected rows, driver merge
    def tumblingFloor(): Unit = {
      val proj = ev.select(
        (col("ts").cast("long") - pmod(col("ts").cast("long"), lit(3600L))).as("h"),
        col("event_type"), col("value"))
      val rdd = proj.queryExecution.toRdd
      val parts = spark.sparkContext.runJob(rdd, (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        val m = new java.util.HashMap[(Long, String), Array[Double]]()
        while (it.hasNext) {
          val r = it.next()
          val k = (r.getLong(0), r.getUTF8String(1).toString)
          var s = m.get(k)
          if (s == null) { s = new Array[Double](2); m.put(k, s) }
          s(0) += 1; s(1) += r.getDouble(2)
        }
        m
      })
      val merged = new java.util.HashMap[(Long, String), Array[Double]]()
      parts.foreach(_.forEach { (k, v) =>
        val s = merged.get(k)
        if (s == null) merged.put(k, v) else { s(0) += v(0); s(1) += v(1) }
      })
      assert(merged.size > 0)
    }
    report("tumbling_floor_1job", tumblingFloor())

    // q1 current vs its single-job driver-merge floor
    def q1 = queries.Headline.queries("q1_pricing_summary")(spark, sfDir)
    report("q1_current", { val df = q1; df.queryExecution.executedPlan; df.collect() })

    def q1Floor(): Unit = {
      val proj = li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
      val rdd = proj.queryExecution.toRdd
      val parts = spark.sparkContext.runJob(rdd, (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        val m = new java.util.HashMap[(String, String), Array[Double]]()
        while (it.hasNext) {
          val r = it.next()
          val k = (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
          var s = m.get(k)
          if (s == null) { s = new Array[Double](7); m.put(k, s) }
          val qty = r.getDouble(2); val ep = r.getDouble(3)
          val disc = r.getDouble(4); val tax = r.getDouble(5)
          s(0) += qty; s(1) += ep; s(2) += ep * (1 - disc)
          s(3) += ep * (1 - disc) * (1 + tax); s(4) += disc; s(5) += 1
        }
        m
      })
      val merged = new java.util.HashMap[(String, String), Array[Double]]()
      parts.foreach(_.forEach { (k, v) =>
        val s = merged.get(k)
        if (s == null) merged.put(k, v)
        else { var i = 0; while (i < 7) { s(i) += v(i); i += 1 } }
      })
      assert(merged.size > 0)
    }
    report("q1_floor_1job", q1Floor())

    // sessionize current (lag window + filter + agg off the user-
    // clustered cache) vs its hand-rolled single-job floor: the cache is
    // hash-partitioned AND sorted by (user_id, ts, event_id), so one
    // mapPartitions pass counts session starts per user with no window
    // machinery at all; driver merges O(users) partials and takes 10.
    def sess = queries.Headline.queries("events_sessionize_lag")(spark, sfDir)
    report("sessionize_current", { val df = sess; df.queryExecution.executedPlan; df.collect() })

    def sessFloor(): Unit = {
      val proj = ev.select(col("user_id"), unix_micros(col("ts")).as("us"))
      val rdd = proj.queryExecution.toRdd
      val parts = spark.sparkContext.runJob(rdd,
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
          val m = new java.util.HashMap[Long, Array[Long]]()
          var curUser = Long.MinValue
          var prevUs = 0L
          var cur: Array[Long] = null
          while (it.hasNext) {
            val r = it.next()
            val u = r.getLong(0); val us = r.getLong(1)
            if (u != curUser) {
              curUser = u
              cur = m.get(u)
              if (cur == null) { cur = new Array[Long](1); m.put(u, cur) }
              cur(0) += 1 // first event of the user in this partition
            } else if (us - prevUs > 1800000000L) cur(0) += 1
            prevUs = us
          }
          m
        })
      val merged = new java.util.HashMap[Long, Long]()
      parts.foreach(_.forEach { (k, v) => merged.merge(k, v(0), _ + _) })
      assert(merged.size > 0)
    }
    report("sessionize_floor_1job", sessFloor())

    spark.stop()
  }
}
