package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-3 broadcast-cache fix: a WARM q5 execution must run
  * exactly ONE Spark job. Round 2's cache held correct entries but kept
  * the exchange as a plan child, so `prepare()` fired every dimension
  * broadcast build job anyway and discarded the results on hit (q5 ran 6
  * jobs warm). A regression here re-introduces a per-dimension scheduler
  * round-trip on every warm execution.
  */
class WarmJobCountSpec extends AnyFunSuite {
  import SparkTestSession._

  test("warm q5 executes as a single job (dimension broadcasts from cache)") {
    Tables.cacheMode = true
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fn = SparkEntry.queries("q5_local_supplier")
      // warm pass: builds table caches + dimension broadcasts
      (1 to 2).foreach(_ => fn(spark, sf).collect())

      val jobs = new AtomicInteger(0)
      val listener = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        fn(spark, sf).collect()
        // listener bus is async; poll briefly for the JobStart events
        val deadline = System.nanoTime() + 3_000_000_000L
        while (jobs.get() == 0 && System.nanoTime() < deadline) Thread.sleep(50)
        Thread.sleep(300)
        assert(jobs.get() == 1, s"warm q5 ran ${jobs.get()} jobs, expected 1")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      Tables.cacheMode = false
      Tables.clearCache()
    }
  }
}
